/* mvreg native prefetching fragment loader (C, pthreads, ctypes ABI).
 *
 * Counterpart of the reference's torch DataLoader worker processes
 * (SURVEY.md §2.3 "Host-side parallelism", C11/C12): a pthread pool
 * reads PLY fragments, voxel-subsamples them, and fills fixed-shape
 * (P, 3) slots in a bounded ring buffer while the accelerator consumes
 * previous batches. The Python side (mvreg.data.native_io.FragmentLoader)
 * hands out ready slots in submission order.
 *
 * ABI (all long-returning, -1 = error):
 *   loader_create(paths, n_paths, points, voxel_size, n_threads) -> id
 *   loader_next(id, out_pts[points*3], out_count*) -> index done, or -1
 *   loader_destroy(id)
 *
 * Build: native/build.sh -> libmvreg_loader.so
 */

#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

long ply_read_xyz(const char *path, float *out, long cap);
long voxel_subsample(const float *pts, long n, float voxel_size,
                     float *out, long cap);
long random_subsample(const float *pts, long n, long target,
                      uint64_t seed, float *out);

#define MAX_LOADERS 16
#define RAW_CAP 4000000L

typedef struct {
    char **paths;
    long n_paths;
    long points;       /* output points per fragment */
    float voxel_size;  /* <= 0: skip voxel subsample */
    int n_threads;

    float *slots;      /* n_paths * points * 3 (filled as workers finish) */
    long *counts;      /* valid points per fragment (<= points) */
    int *ready;        /* slot done flags */
    long next_in;      /* next path index to assign (under mu) */
    long next_out;     /* next slot the consumer waits for */
    int shutdown;
    pthread_mutex_t mu;
    pthread_cond_t cv;
    pthread_t threads[64];
} Loader;

static Loader *g_loaders[MAX_LOADERS];
static pthread_mutex_t g_mu = PTHREAD_MUTEX_INITIALIZER;

static void *worker(void *arg) {
    Loader *L = (Loader *)arg;
    float *raw = malloc(RAW_CAP * 3 * sizeof(float));
    float *vox = malloc(RAW_CAP * 3 * sizeof(float));
    if (!raw || !vox) { free(raw); free(vox); return NULL; }
    for (;;) {
        pthread_mutex_lock(&L->mu);
        long idx = -1;
        if (!L->shutdown && L->next_in < L->n_paths) idx = L->next_in++;
        pthread_mutex_unlock(&L->mu);
        if (idx < 0) break;

        long n = ply_read_xyz(L->paths[idx], raw, RAW_CAP);
        long m = 0;
        const float *src = raw;
        if (n > 0 && L->voxel_size > 0.0f) {
            m = voxel_subsample(raw, n, L->voxel_size, vox, RAW_CAP);
            src = vox;
        } else if (n > 0) {
            m = n;
        }
        float *dst = L->slots + (size_t)idx * L->points * 3;
        long wrote = 0;
        if (m > 0) {
            if (m > L->points) {
                wrote = random_subsample(src, m, L->points,
                                         (uint64_t)(idx + 1), dst);
            } else {
                memcpy(dst, src, (size_t)m * 3 * sizeof(float));
                wrote = m;
            }
        }
        pthread_mutex_lock(&L->mu);
        L->counts[idx] = wrote;
        L->ready[idx] = 1;
        pthread_cond_broadcast(&L->cv);
        pthread_mutex_unlock(&L->mu);
    }
    free(raw);
    free(vox);
    return NULL;
}

long loader_create(const char **paths, long n_paths, long points,
                   float voxel_size, long n_threads) {
    if (n_paths <= 0 || points <= 0) return -1;
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 64) n_threads = 64;

    Loader *L = calloc(1, sizeof(Loader));
    if (!L) return -1;
    L->paths = malloc(n_paths * sizeof(char *));
    L->slots = calloc((size_t)n_paths * points * 3, sizeof(float));
    L->counts = calloc(n_paths, sizeof(long));
    L->ready = calloc(n_paths, sizeof(int));
    if (!L->paths || !L->slots || !L->counts || !L->ready) return -1;
    for (long i = 0; i < n_paths; i++) L->paths[i] = strdup(paths[i]);
    L->n_paths = n_paths;
    L->points = points;
    L->voxel_size = voxel_size;
    L->n_threads = (int)n_threads;
    pthread_mutex_init(&L->mu, NULL);
    pthread_cond_init(&L->cv, NULL);
    for (int t = 0; t < L->n_threads; t++)
        pthread_create(&L->threads[t], NULL, worker, L);

    pthread_mutex_lock(&g_mu);
    long id = -1;
    for (long i = 0; i < MAX_LOADERS; i++)
        if (!g_loaders[i]) { g_loaders[i] = L; id = i; break; }
    pthread_mutex_unlock(&g_mu);
    if (id < 0) return -1; /* leak on table-full; caller misuse */
    return id;
}

/* Blocking: wait for the next fragment (submission order), copy its
 * points into out (points*3 floats) and its count into *count.
 * Returns the fragment index, or -1 when all fragments are consumed. */
long loader_next(long id, float *out, long *count) {
    if (id < 0 || id >= MAX_LOADERS || !g_loaders[id]) return -1;
    Loader *L = g_loaders[id];
    pthread_mutex_lock(&L->mu);
    if (L->next_out >= L->n_paths) {
        pthread_mutex_unlock(&L->mu);
        return -1;
    }
    long idx = L->next_out++;
    while (!L->ready[idx] && !L->shutdown)
        pthread_cond_wait(&L->cv, &L->mu);
    pthread_mutex_unlock(&L->mu);
    memcpy(out, L->slots + (size_t)idx * L->points * 3,
           (size_t)L->points * 3 * sizeof(float));
    *count = L->counts[idx];
    return idx;
}

long loader_destroy(long id) {
    if (id < 0 || id >= MAX_LOADERS) return -1;
    pthread_mutex_lock(&g_mu);
    Loader *L = g_loaders[id];
    g_loaders[id] = NULL;
    pthread_mutex_unlock(&g_mu);
    if (!L) return -1;
    pthread_mutex_lock(&L->mu);
    L->shutdown = 1;
    L->next_in = L->n_paths;
    pthread_cond_broadcast(&L->cv);
    pthread_mutex_unlock(&L->mu);
    for (int t = 0; t < L->n_threads; t++)
        pthread_join(L->threads[t], NULL);
    for (long i = 0; i < L->n_paths; i++) free(L->paths[i]);
    free(L->paths);
    free(L->slots);
    free(L->counts);
    free(L->ready);
    pthread_mutex_destroy(&L->mu);
    pthread_cond_destroy(&L->cv);
    free(L);
    return 0;
}
