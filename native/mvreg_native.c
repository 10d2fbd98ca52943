/* mvreg native host-side kernels (C, ctypes ABI).
 *
 * The reference's data path leans on native code on the host: torch
 * DataLoader workers (C core) calling MinkowskiEngine's C++ quantizer and
 * Open3D's C++ PLY IO (SURVEY.md §2.3, C1/C11/C20 host side). This
 * library is the framework's native equivalent for the host stages that
 * feed the TPU: zero-copy PLY vertex parsing and hash-grid voxel
 * subsampling, both called through ctypes from mvreg.data.native_io with
 * a pure-numpy fallback.
 *
 * Build: native/build.sh  ->  native/libmvreg_native.so
 */

#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* ---------------------------------------------------------------- PLY */

/* Parse a PLY file's vertex x/y/z into out[3*cap]; returns vertex count
 * written, or -1 on error. Handles format binary_little_endian 1.0 and
 * ascii 1.0; arbitrary extra vertex properties are skipped via stride. */
long ply_read_xyz(const char *path, float *out, long cap) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;

    char line[512];
    long n_vert = -1;
    int binary = -1;
    long stride = 0;      /* bytes per vertex (binary) */
    long off[3] = {-1, -1, -1}; /* byte offsets of x, y, z */
    int prop_idx = 0;
    long col[3] = {-1, -1, -1}; /* ascii column indices */
    int in_vertex = 0;
    int n_cols = 0;

    while (fgets(line, sizeof line, f)) {
        if (!strncmp(line, "format", 6)) {
            if (strstr(line, "binary_little_endian")) binary = 1;
            else if (strstr(line, "ascii")) binary = 0;
            else { fclose(f); return -1; }
        } else if (!strncmp(line, "element", 7)) {
            in_vertex = !strncmp(line, "element vertex", 14);
            if (in_vertex) sscanf(line, "element vertex %ld", &n_vert);
        } else if (!strncmp(line, "property", 8) && in_vertex) {
            char type[64], name[64];
            if (sscanf(line, "property %63s %63s", type, name) != 2) {
                fclose(f); return -1;
            }
            long sz;
            if (!strcmp(type, "float") || !strcmp(type, "float32") ||
                !strcmp(type, "int") || !strcmp(type, "uint") ||
                !strcmp(type, "int32")) sz = 4;
            else if (!strcmp(type, "double") || !strcmp(type, "float64"))
                sz = 8;
            else if (!strcmp(type, "uchar") || !strcmp(type, "char") ||
                     !strcmp(type, "uint8") || !strcmp(type, "int8")) sz = 1;
            else if (!strcmp(type, "short") || !strcmp(type, "ushort")) sz = 2;
            else { fclose(f); return -1; }
            int axis = -1;
            if (!strcmp(name, "x")) axis = 0;
            else if (!strcmp(name, "y")) axis = 1;
            else if (!strcmp(name, "z")) axis = 2;
            if (axis >= 0) {
                if (sz != 4) { fclose(f); return -1; } /* need float32 xyz */
                off[axis] = stride;
                col[axis] = prop_idx;
            }
            stride += sz;
            prop_idx++;
        } else if (!strncmp(line, "end_header", 10)) {
            break;
        }
    }
    n_cols = prop_idx;
    if (n_vert < 0 || binary < 0 || off[0] < 0 || off[1] < 0 || off[2] < 0) {
        fclose(f); return -1;
    }
    long n = n_vert < cap ? n_vert : cap;

    if (binary) {
        unsigned char *buf = (unsigned char *)malloc((size_t)stride * n);
        if (!buf) { fclose(f); return -1; }
        if (fread(buf, (size_t)stride, (size_t)n, f) != (size_t)n) {
            free(buf); fclose(f); return -1;
        }
        for (long i = 0; i < n; i++) {
            const unsigned char *v = buf + (size_t)i * stride;
            memcpy(&out[3 * i + 0], v + off[0], 4);
            memcpy(&out[3 * i + 1], v + off[1], 4);
            memcpy(&out[3 * i + 2], v + off[2], 4);
        }
        free(buf);
    } else {
        for (long i = 0; i < n; i++) {
            for (int c = 0; c < n_cols; c++) {
                double val;
                if (fscanf(f, "%lf", &val) != 1) { fclose(f); return -1; }
                if (c == col[0]) out[3 * i + 0] = (float)val;
                else if (c == col[1]) out[3 * i + 1] = (float)val;
                else if (c == col[2]) out[3 * i + 2] = (float)val;
            }
        }
    }
    fclose(f);
    return n;
}

/* ------------------------------------------------- voxel subsampling */

static inline uint64_t hash3(int64_t x, int64_t y, int64_t z) {
    uint64_t h = (uint64_t)x * 73856093ull ^ (uint64_t)y * 19349669ull ^
                 (uint64_t)z * 83492791ull;
    h ^= h >> 33; h *= 0xff51afd7ed558ccdull; h ^= h >> 33;
    return h;
}

/* Keep the first point of each voxel (open-addressing hash table on
 * packed voxel coords). Returns number of kept points, or -1. The host
 * analog of ME.utils.sparse_quantize (SURVEY.md C1) for load-time
 * decimation before device upload. */
long voxel_subsample(const float *pts, long n, float voxel_size,
                     float *out, long cap) {
    if (n <= 0 || voxel_size <= 0) return 0;
    /* table size: next pow2 >= 2n */
    uint64_t tsize = 1;
    while ((long)tsize < 2 * n) tsize <<= 1;
    int64_t *keys = (int64_t *)malloc(tsize * sizeof(int64_t));
    if (!keys) return -1;
    for (uint64_t i = 0; i < tsize; i++) keys[i] = INT64_MIN;

    long m = 0;
    const double inv = 1.0 / (double)voxel_size;
    for (long i = 0; i < n && m < cap; i++) {
        int64_t cx = (int64_t)floor(pts[3 * i + 0] * inv);
        int64_t cy = (int64_t)floor(pts[3 * i + 1] * inv);
        int64_t cz = (int64_t)floor(pts[3 * i + 2] * inv);
        /* pack into 21 bits per axis (signed offset) */
        int64_t key = ((cx & 0x1FFFFF) << 42) | ((cy & 0x1FFFFF) << 21) |
                      (cz & 0x1FFFFF);
        uint64_t slot = hash3(cx, cy, cz) & (tsize - 1);
        int fresh = 0;
        for (;;) {
            if (keys[slot] == INT64_MIN) { keys[slot] = key; fresh = 1; break; }
            if (keys[slot] == key) break;
            slot = (slot + 1) & (tsize - 1);
        }
        if (fresh) {
            out[3 * m + 0] = pts[3 * i + 0];
            out[3 * m + 1] = pts[3 * i + 1];
            out[3 * m + 2] = pts[3 * i + 2];
            m++;
        }
    }
    free(keys);
    return m;
}

/* Uniformly subsample (or copy) up to `target` points with a fixed-seed
 * xorshift — deterministic batch assembly without Python overhead. */
long random_subsample(const float *pts, long n, long target,
                      uint64_t seed, float *out) {
    if (n <= target) {
        memcpy(out, pts, (size_t)n * 3 * sizeof(float));
        return n;
    }
    /* Floyd's algorithm-free simple approach: partial Fisher-Yates over
     * an index array. */
    long *idx = (long *)malloc((size_t)n * sizeof(long));
    if (!idx) return -1;
    for (long i = 0; i < n; i++) idx[i] = i;
    uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ull;
    for (long i = 0; i < target; i++) {
        s ^= s << 13; s ^= s >> 7; s ^= s << 17;
        long j = i + (long)(s % (uint64_t)(n - i));
        long tmp = idx[i]; idx[i] = idx[j]; idx[j] = tmp;
        out[3 * i + 0] = pts[3 * idx[i] + 0];
        out[3 * i + 1] = pts[3 * idx[i] + 1];
        out[3 * i + 2] = pts[3 * idx[i] + 2];
    }
    free(idx);
    return target;
}
