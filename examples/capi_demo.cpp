/* dlopen demo for the C ABI (libembeddings_c.so) — the analogue of the
 * reference's examples/dylib.cpp:5-52 (dlopen libbert.so, resolve symbols,
 * encode) combined with examples/main.cpp:8-78 (tokenize + print the
 * embedding + timings).
 *
 * Build: make -C native demo
 * Run:   native/build/capi_demo <lib.so> <model> [dtype] [prompt...]
 */
#include <dlfcn.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include <time.h>

typedef struct et_ctx et_ctx;
typedef int32_t et_vocab_id;

typedef et_ctx *(*et_load_fn)(const char *, const char *);
typedef void (*et_free_fn)(et_ctx *);
typedef int32_t (*et_i32_fn)(et_ctx *);
typedef int (*et_encode_batch_fn)(et_ctx *, int32_t, int32_t, const char **,
                                  float **);
typedef int (*et_tokenize_fn)(et_ctx *, const char *, et_vocab_id *,
                              int32_t *, int32_t);
typedef int (*et_id_to_token_fn)(et_ctx *, et_vocab_id, char *, int32_t);
typedef int (*et_forward_fn)(et_ctx *, const et_vocab_id *, int32_t, float *);
typedef const char *(*et_err_fn)(void);

static double now_ms(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec * 1e3 + ts.tv_nsec / 1e6;
}

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr,
                "usage: %s <libembeddings_c.so> <model> [dtype] [prompt...]\n",
                argv[0]);
        return 1;
    }
    const char *libpath = argv[1], *model = argv[2];
    const char *dtype = argc > 3 ? argv[3] : "f32";
    int n_prompts = argc > 4 ? argc - 4 : 1;
    const char *default_prompt = "hello world";
    const char **prompts =
        (const char **)malloc(sizeof(char *) * (size_t)n_prompts);
    for (int i = 0; i < n_prompts; i++)
        prompts[i] = argc > 4 ? argv[4 + i] : default_prompt;

    void *lib = dlopen(libpath, RTLD_NOW | RTLD_GLOBAL);
    if (!lib) {
        fprintf(stderr, "dlopen failed: %s\n", dlerror());
        return 1;
    }
    et_load_fn load = (et_load_fn)dlsym(lib, "et_load_from_file");
    et_free_fn ctx_free = (et_free_fn)dlsym(lib, "et_free");
    et_i32_fn n_embd_fn = (et_i32_fn)dlsym(lib, "et_n_embd");
    et_i32_fn n_max_fn = (et_i32_fn)dlsym(lib, "et_n_max_tokens");
    et_encode_batch_fn encode_batch =
        (et_encode_batch_fn)dlsym(lib, "et_encode_batch");
    et_tokenize_fn tokenize = (et_tokenize_fn)dlsym(lib, "et_tokenize");
    et_id_to_token_fn id2tok =
        (et_id_to_token_fn)dlsym(lib, "et_id_to_token");
    et_forward_fn forward = (et_forward_fn)dlsym(lib, "et_forward");
    et_err_fn last_error = (et_err_fn)dlsym(lib, "et_last_error");
    if (!load || !ctx_free || !n_embd_fn || !n_max_fn || !encode_batch ||
        !tokenize || !id2tok || !forward || !last_error) {
        fprintf(stderr, "dlsym failed: %s\n", dlerror());
        return 1;
    }

    double t0 = now_ms();
    et_ctx *ctx = load(model, dtype);
    if (!ctx) {
        fprintf(stderr, "load failed: %s\n", last_error());
        return 1;
    }
    int32_t n_embd = n_embd_fn(ctx);
    printf("loaded %s (dtype=%s) in %.0f ms: n_embd=%d n_max_tokens=%d\n",
           model, dtype, now_ms() - t0, n_embd, n_max_fn(ctx));

    /* tokenize the first prompt and echo the pieces (main.cpp behavior) */
    et_vocab_id ids[512];
    int32_t n_ids = 0;
    if (tokenize(ctx, prompts[0], ids, &n_ids, 512) != 0) {
        fprintf(stderr, "tokenize failed: %s\n", last_error());
        return 1;
    }
    /* capacity edge cases: n_max_tokens<=0 must fail cleanly (not write),
     * and a small buffer must never be overrun (copy clamps to capacity) */
    et_vocab_id tiny[4] = {-9, -9, -9, -9};
    int32_t n_tiny = 0;
    int rc_zero = tokenize(ctx, prompts[0], tiny, &n_tiny, 0);
    int rc_tiny = tokenize(ctx, prompts[0], tiny, &n_tiny, 4);
    printf("tokenize caps: rc(cap=0)=%d rc(cap=4)=%d n_tiny=%d\n",
           rc_zero, rc_tiny, n_tiny);

    printf("tokens[0] (%d):", n_ids);
    for (int32_t i = 0; i < n_ids; i++) {
        char tok[64];
        printf(" %d", ids[i]);
        if (id2tok(ctx, ids[i], tok, sizeof tok) >= 0) printf("=%s", tok);
    }
    printf("\n");

    float **embs = (float **)malloc(sizeof(float *) * (size_t)n_prompts);
    for (int i = 0; i < n_prompts; i++)
        embs[i] = (float *)malloc(sizeof(float) * (size_t)n_embd);
    t0 = now_ms();
    if (encode_batch(ctx, n_prompts, n_prompts, prompts, embs) != 0) {
        fprintf(stderr, "encode failed: %s\n", last_error());
        return 1;
    }
    double dt = now_ms() - t0;
    for (int i = 0; i < n_prompts; i++) {
        double norm = 0;
        for (int32_t j = 0; j < n_embd; j++)
            norm += (double)embs[i][j] * embs[i][j];
        norm = sqrt(norm);
        printf("emb[%d] head:", i);
        for (int32_t j = 0; j < 8 && j < n_embd; j++)
            printf(" %.5f", embs[i][j]);
        printf(" ... |x|=%.4f <- \"%s\"\n", norm, prompts[i]);
    }
    printf("encoded %d prompt(s) in %.0f ms\n", n_prompts, dt);

    /* pre-tokenized path must match the text path (et_forward vs et_encode) */
    float *femb = (float *)malloc(sizeof(float) * (size_t)n_embd);
    if (forward(ctx, ids, n_ids, femb) != 0) {
        fprintf(stderr, "forward failed: %s\n", last_error());
        return 1;
    }
    double max_diff = 0;
    for (int32_t j = 0; j < n_embd; j++) {
        double diff = (double)femb[j] - embs[0][j];
        if (diff < 0) diff = -diff;
        if (diff > max_diff) max_diff = diff;
    }
    printf("forward parity: max|et_forward - et_encode| = %.2e\n", max_diff);
    free(femb);

    for (int i = 0; i < n_prompts; i++) free(embs[i]);
    free(embs);
    free(prompts);
    ctx_free(ctx);
    return 0;
}
