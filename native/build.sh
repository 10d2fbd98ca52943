#!/bin/sh
# Build the native host-side library (ctypes ABI).
set -e
cd "$(dirname "$0")"
cc -O3 -fPIC -shared -o libmvreg_native.so mvreg_native.c -lm
echo "built $(pwd)/libmvreg_native.so"
