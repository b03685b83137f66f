/* embeddings_c.h — C ABI for the TPU embedding engine.
 *
 * The native analogue of the reference's bert.h:33-90 public surface
 * (bert_load_from_file / bert_encode[_batch] / bert_tokenize /
 * bert_forward[_batch] / bert_n_embd / bert_n_max_tokens /
 * bert_vocab_id_to_token), exported from a shared library so C/C++
 * applications can embed the engine exactly like dlopen-ing libbert.so
 * (reference examples/dylib.cpp:5-52).
 *
 * The library hosts the JAX engine in an embedded CPython interpreter;
 * all calls are thread-safe (GIL-managed internally). Functions return
 * 0 on success, nonzero on failure; et_last_error() describes the most
 * recent failure on the calling thread.
 */
#ifndef EMBEDDINGS_C_H
#define EMBEDDINGS_C_H

#include <stdint.h>

#if defined(_WIN32)
#define ET_API __declspec(dllexport)
#else
#define ET_API __attribute__((visibility("default")))
#endif

#ifdef __cplusplus
extern "C" {
#endif

typedef struct et_ctx et_ctx;
typedef int32_t et_vocab_id;

/* Load a model: HF directory, native .npz checkpoint, or reference-format
 * ggml .bin. dtype is one of f32|bf16|f16|q4_0|q4_1|q8_0 (NULL -> f32).
 * Returns NULL on failure (see et_last_error). */
ET_API et_ctx *et_load_from_file(const char *path, const char *dtype);
ET_API void et_free(et_ctx *ctx);

ET_API int32_t et_n_embd(et_ctx *ctx);
ET_API int32_t et_n_max_tokens(et_ctx *ctx);

/* Tokenize + evaluate one text; writes et_n_embd() floats. */
ET_API int et_encode(et_ctx *ctx, const char *text, float *embeddings);

/* Batched encode: n_inputs texts, device micro-batches of n_batch_size
 * (length-sorted and bucketed internally, bert_encode_batch semantics).
 * embeddings[i] receives et_n_embd() floats for texts[i]. */
ET_API int et_encode_batch(et_ctx *ctx, int32_t n_batch_size,
                           int32_t n_inputs, const char **texts,
                           float **embeddings);

/* Tokenize only: writes up to n_max_tokens ids ([CLS] ... [SEP]) and the
 * count into *n_tokens. */
ET_API int et_tokenize(et_ctx *ctx, const char *text, et_vocab_id *tokens,
                       int32_t *n_tokens, int32_t n_max_tokens);

/* Evaluate pre-tokenized input(s). */
ET_API int et_forward(et_ctx *ctx, const et_vocab_id *tokens,
                      int32_t n_tokens, float *embeddings);
ET_API int et_forward_batch(et_ctx *ctx, int32_t n_batch,
                            const et_vocab_id *const *batch_tokens,
                            const int32_t *n_tokens,
                            float **batch_embeddings);

/* UTF-8 token text for an id, copied into buf (NUL-terminated).
 * Returns the byte length (excluding NUL), or -1 on error/overflow. */
ET_API int et_id_to_token(et_ctx *ctx, et_vocab_id id, char *buf,
                          int32_t buflen);

/* Most recent error message on this thread ("" if none). */
ET_API const char *et_last_error(void);

#ifdef __cplusplus
}
#endif

#endif /* EMBEDDINGS_C_H */
