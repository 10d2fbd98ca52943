#!/bin/sh
# Build the native host-side library (ctypes ABI): PLY IO + voxel
# subsampling kernels plus the pthread prefetching fragment loader.
set -e
cd "$(dirname "$0")"
cc -O3 -fPIC -shared -o libmvreg_native.so mvreg_native.c mvreg_loader.c \
  -lm -lpthread
echo "built $(pwd)/libmvreg_native.so"
