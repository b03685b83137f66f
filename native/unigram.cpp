// Native Unigram (sentencepiece) tokenizer hot path: metaspace
// pre-tokenization + Viterbi segmentation over a codepoint trie.
//
// Replaces the pure-Python Viterbi in embeddings_tpu/tokenizer/
// unigram.py (_metaspace + _viterbi + emission) for the XLM-R family
// (multilingual-e5, bge-m3), where Python tokenization measured ~10% of
// one chip's token consumption rate (benchmarks/unigram_throughput.py).
// Normalization (NFKC / precompiled charsmap) STAYS in Python — it is
// <3% of tokenization time and is the conformance-critical part; this
// module receives already-normalized UTF-8.
//
// Semantics mirror unigram.py exactly (which itself conforms to the HF
// rust `tokenizers` Unigram pipeline; the reference's host tokenizer
// analogue is bert.cpp:199-417):
//   - metaspace: ' ' -> U+2581 BEFORE the conditional prepend; split
//     keeps each chunk's leading marker (rust metaspace.rs).
//   - viterbi: summed piece log-probs (double), ties keep the EARLIEST
//     start (strict > relaxation, starts scanned ascending); characters
//     no piece covers take a single-char unk step with
//     unk_score = min_real_score - 10, only when no piece ends there.
//   - emission: byte_fallback spans emit <0xNN> ids when every byte is
//     covered; otherwise unk, with fuse_unk collapsing runs.
//
// Thread-safety: the context is immutable after euni_new; euni_encode
// uses only stack/heap locals -> safe for concurrent callers.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr uint32_t KMETA = 0x2581;  // "▁"

struct TrieNode {
    std::unordered_map<uint32_t, int32_t> next;
    int32_t piece_id = -1;
};

struct UniCtx {
    std::vector<TrieNode> trie;
    std::vector<double> scores;
    double unk_score = 0.0;
    int32_t unk_emit_id = -1;
    bool fuse_unk = true;
    bool byte_fallback = false;
    bool prepend = true;  // prepend_scheme != "never"
    int32_t byte_ids[256];
};

// UTF-8 decode; invalid bytes become U+FFFD one byte at a time (the
// Python side never sends invalid UTF-8 — str is well-formed — so this
// is belt-and-braces, not a conformance surface).
inline uint32_t decode_cp(const uint8_t* s, int32_t n, int32_t& i) {
    uint8_t c = s[i];
    if (c < 0x80) { i += 1; return c; }
    if ((c >> 5) == 6) {
        if (i + 1 < n && (s[i + 1] & 0xC0) == 0x80) {
            uint32_t cp = ((c & 0x1F) << 6) | (s[i + 1] & 0x3F);
            i += 2; return cp;
        }
    } else if ((c >> 4) == 14) {
        if (i + 2 < n && (s[i + 1] & 0xC0) == 0x80 &&
            (s[i + 2] & 0xC0) == 0x80) {
            uint32_t cp = ((c & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6) |
                          (s[i + 2] & 0x3F);
            i += 3; return cp;
        }
    } else if ((c >> 3) == 30) {
        if (i + 3 < n && (s[i + 1] & 0xC0) == 0x80 &&
            (s[i + 2] & 0xC0) == 0x80 && (s[i + 3] & 0xC0) == 0x80) {
            uint32_t cp = ((c & 0x07) << 18) | ((s[i + 1] & 0x3F) << 12) |
                          ((s[i + 2] & 0x3F) << 6) | (s[i + 3] & 0x3F);
            i += 4; return cp;
        }
    }
    i += 1;
    return 0xFFFD;
}

inline int encode_cp(uint32_t cp, uint8_t out[4]) {
    if (cp < 0x80) { out[0] = (uint8_t)cp; return 1; }
    if (cp < 0x800) {
        out[0] = 0xC0 | (cp >> 6); out[1] = 0x80 | (cp & 0x3F); return 2;
    }
    if (cp < 0x10000) {
        out[0] = 0xE0 | (cp >> 12); out[1] = 0x80 | ((cp >> 6) & 0x3F);
        out[2] = 0x80 | (cp & 0x3F); return 3;
    }
    out[0] = 0xF0 | (cp >> 18); out[1] = 0x80 | ((cp >> 12) & 0x3F);
    out[2] = 0x80 | ((cp >> 6) & 0x3F); out[3] = 0x80 | (cp & 0x3F);
    return 4;
}

struct Emitter {
    int32_t* out;
    int32_t cap;
    int32_t n = 0;       // emitted (when <= cap)
    int32_t needed = 0;  // total required
    void push(int32_t id) {
        if (needed < cap) out[needed] = id;
        ++needed;
    }
};

void viterbi_chunk(const UniCtx* ctx, const uint32_t* cps, int32_t n,
                   Emitter& em) {
    // fuse_unk state is PER CHUNK (unigram.py's prev_unk is local to
    // _viterbi): unknown runs never fuse across a metaspace boundary
    bool prev_unk = false;
    constexpr double NEG = -1e300;
    std::vector<double> best(n + 1, NEG);
    std::vector<int32_t> back_start(n + 1, -1);
    std::vector<int32_t> back_id(n + 1, -2);  // -2 none, -1 unk step
    best[0] = 0.0;
    // forward relaxation: starts ascending == python's inner-loop order,
    // so strict-> keeps the earliest start on ties, same as unigram.py
    for (int32_t pos = 0; pos < n; ++pos) {
        // the single-char unk step into pos+1 is decided after all piece
        // relaxations INTO pos+1; defer it via the check below instead
        if (best[pos] <= NEG / 2) {
            // reachable only through the unk step from pos-1 (handled
            // when pos was the "end"); nothing to extend
        } else {
            int32_t node = 0;
            for (int32_t end = pos; end < n; ++end) {
                auto it = ctx->trie[node].next.find(cps[end]);
                if (it == ctx->trie[node].next.end()) break;
                node = it->second;
                int32_t pid = ctx->trie[node].piece_id;
                if (pid >= 0) {
                    double s = best[pos] + ctx->scores[pid];
                    if (s > best[end + 1]) {
                        best[end + 1] = s;
                        back_start[end + 1] = pos;
                        back_id[end + 1] = pid;
                    }
                }
            }
        }
        // finalize position pos+1: no piece ended here -> unk step
        int32_t end = pos + 1;
        if (back_id[end] == -2 && best[end - 1] > NEG / 2) {
            double s = best[end - 1] + ctx->unk_score;
            if (s > best[end]) {
                best[end] = s;
                back_start[end] = end - 1;
                back_id[end] = -1;
            }
        }
    }
    // backtrack into spans
    std::vector<int32_t> starts, ids;
    int32_t i = n;
    while (i > 0) {
        starts.push_back(back_start[i]);
        ids.push_back(back_id[i]);
        i = back_start[i];
    }
    // emit in forward order
    for (int32_t k = (int32_t)starts.size() - 1; k >= 0; --k) {
        int32_t st = starts[k];
        int32_t en = (k == 0) ? n : starts[k - 1];
        int32_t pid = ids[k];
        if (pid >= 0) {
            em.push(pid);
            prev_unk = false;
            continue;
        }
        if (ctx->byte_fallback) {
            // covered iff every UTF-8 byte of the span has a byte piece
            bool covered = true;
            uint8_t buf[4];
            for (int32_t p = st; p < en && covered; ++p) {
                int nb = encode_cp(cps[p], buf);
                for (int b = 0; b < nb; ++b)
                    if (ctx->byte_ids[buf[b]] < 0) { covered = false; break; }
            }
            if (covered) {
                for (int32_t p = st; p < en; ++p) {
                    int nb = encode_cp(cps[p], buf);
                    for (int b = 0; b < nb; ++b)
                        em.push(ctx->byte_ids[buf[b]]);
                }
                prev_unk = false;
                continue;
            }
        }
        if (ctx->fuse_unk && prev_unk) continue;
        em.push(ctx->unk_emit_id);
        prev_unk = true;
    }
}

}  // namespace

extern "C" {

// pieces: n UTF-8 piece strings; scores: parallel log-probs.
// unk_emit_id: the id emitted for unknown spans. unk_score: the viterbi
// step score for uncovered chars (python: min_real_score - 10).
// byte_ids: 256 ids for <0xNN> pieces, -1 where absent (NULL = no byte
// fallback). prepend: 0 for prepend_scheme == "never", else 1.
void* euni_new(const char** pieces, const double* scores, int32_t n,
               int32_t unk_emit_id, double unk_score, int32_t fuse_unk,
               const int32_t* byte_ids, int32_t prepend) {
    auto* ctx = new UniCtx();
    ctx->scores.assign(scores, scores + n);
    ctx->unk_emit_id = unk_emit_id;
    ctx->unk_score = unk_score;
    ctx->fuse_unk = fuse_unk != 0;
    ctx->prepend = prepend != 0;
    ctx->byte_fallback = byte_ids != nullptr;
    if (byte_ids)
        std::memcpy(ctx->byte_ids, byte_ids, 256 * sizeof(int32_t));
    else
        for (int b = 0; b < 256; ++b) ctx->byte_ids[b] = -1;
    ctx->trie.emplace_back();
    for (int32_t id = 0; id < n; ++id) {
        const uint8_t* s = (const uint8_t*)pieces[id];
        int32_t len = (int32_t)std::strlen(pieces[id]);
        int32_t node = 0, i = 0;
        while (i < len) {
            uint32_t cp = decode_cp(s, len, i);
            auto it = ctx->trie[node].next.find(cp);
            if (it == ctx->trie[node].next.end()) {
                ctx->trie.emplace_back();
                int32_t nid = (int32_t)ctx->trie.size() - 1;
                ctx->trie[node].next.emplace(cp, nid);
                node = nid;
            } else {
                node = it->second;
            }
        }
        // duplicate piece strings: LAST definition wins, matching
        // unigram.py's {p: i for i, p in enumerate(pieces)} dict
        ctx->trie[node].piece_id = id;
    }
    return ctx;
}

void euni_free(void* p) { delete (UniCtx*)p; }

// text: NORMALIZED UTF-8 (no NUL). Returns the number of ids written,
// or the negated total needed if cap was too small (caller re-calls
// with a bigger buffer).
int32_t euni_encode(void* p, const char* text, int32_t len,
                    int32_t* out, int32_t cap) {
    auto* ctx = (const UniCtx*)p;
    const uint8_t* s = (const uint8_t*)text;
    // decode + metaspace (' ' -> marker) in one pass
    std::vector<uint32_t> cps;
    cps.reserve(len + 1);
    cps.push_back(KMETA);  // provisional prepend, may be dropped below
    int32_t i = 0;
    while (i < len) {
        uint32_t cp = decode_cp(s, len, i);
        cps.push_back(cp == ' ' ? KMETA : cp);
    }
    const uint32_t* base = cps.data();
    int32_t n = (int32_t)cps.size();
    if (n == 1 || cps[1] == KMETA || !ctx->prepend) {
        ++base;  // text empty, already marker-led, or prepend="never"
        --n;
    }
    Emitter em{out, cap};
    // split: each chunk starts at a marker (or index 0), keeps it
    int32_t start = 0;
    for (int32_t k = 1; k <= n; ++k) {
        if (k == n || base[k] == KMETA) {
            if (k > start)
                viterbi_chunk(ctx, base + start, k - start, em);
            start = k;
        }
    }
    return em.needed <= cap ? em.needed : -em.needed;
}

}  // extern "C"
