// Native multilingual WordPiece tokenizer (C ABI, ctypes-loadable).
//
// The performance-critical host-side component: the same
// normalize -> CJK/punct isolation -> whitespace split -> greedy
// longest-match WordPiece pipeline as embeddings_tpu/tokenizer/wordpiece.py
// (which in turn matches HF BertNormalizer/BertPreTokenizer/WordPiece and
// the reference bert.cpp:199-417), with Unicode behavior baked in from
// generated tables (unicode_tables.h) so no ICU dependency.
//
// Build: make -C native   (g++ -O2 -shared -fPIC)
// Python binding: embeddings_tpu/tokenizer/native.py.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include "unicode_tables.h"

namespace {

// ---------------------------------------------------------------------------
// UTF-8 <-> codepoints
// ---------------------------------------------------------------------------

static inline bool cont(const char* s, size_t k) {
  return ((unsigned char)s[k] & 0xC0) == 0x80;
}

static size_t utf8_decode(const char* s, size_t len, size_t i, uint32_t* cp) {
  const unsigned char c = s[i];
  if (c < 0x80) { *cp = c; return 1; }
  // continuation bytes are validated: an invalid sequence yields U+FFFD
  // and consumes ONE byte, so the following valid character survives
  // (matches Python's errors='replace' / HF clean_text behavior)
  if ((c >> 5) == 0x6 && i + 1 < len && cont(s, i + 1)) {
    *cp = ((c & 0x1F) << 6) | (s[i + 1] & 0x3F);
    return 2;
  }
  if ((c >> 4) == 0xE && i + 2 < len && cont(s, i + 1) && cont(s, i + 2)) {
    *cp = ((c & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6) | (s[i + 2] & 0x3F);
    return 3;
  }
  if ((c >> 3) == 0x1E && i + 3 < len && cont(s, i + 1) && cont(s, i + 2) &&
      cont(s, i + 3)) {
    *cp = ((c & 0x07) << 18) | ((s[i + 1] & 0x3F) << 12) |
          ((s[i + 2] & 0x3F) << 6) | (s[i + 3] & 0x3F);
    return 4;
  }
  *cp = 0xFFFD;
  return 1;
}

static void utf8_encode(uint32_t cp, std::string* out) {
  if (cp < 0x80) {
    out->push_back((char)cp);
  } else if (cp < 0x800) {
    out->push_back((char)(0xC0 | (cp >> 6)));
    out->push_back((char)(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out->push_back((char)(0xE0 | (cp >> 12)));
    out->push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back((char)(0x80 | (cp & 0x3F)));
  } else {
    out->push_back((char)(0xF0 | (cp >> 18)));
    out->push_back((char)(0x80 | ((cp >> 12) & 0x3F)));
    out->push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back((char)(0x80 | (cp & 0x3F)));
  }
}

// ---------------------------------------------------------------------------
// Unicode class lookups (binary search over generated range tables)
// ---------------------------------------------------------------------------

static bool in_ranges(const uint32_t (*ranges)[2], uint32_t n, uint32_t cp) {
  uint32_t lo = 0, hi = n;
  while (lo < hi) {
    uint32_t mid = (lo + hi) / 2;
    if (cp < ranges[mid][0]) hi = mid;
    else if (cp > ranges[mid][1]) lo = mid + 1;
    else return true;
  }
  return false;
}

static bool is_ws(uint32_t cp) { return in_ranges(kWsRanges, kNumWsRanges, cp); }
static bool is_ctrl(uint32_t cp) { return in_ranges(kCtrlRanges, kNumCtrlRanges, cp); }
static bool is_punct(uint32_t cp) { return in_ranges(kPunctRanges, kNumPunctRanges, cp); }

// HF-rust is_chinese_char ranges, incl. the 0x2B920 quirk
// (reference bert.cpp:282-291).
static bool is_cjk(uint32_t cp) {
  return (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
         (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
         (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B920 && cp <= 0x2CEAF) ||
         (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F);
}

// lowercase + NFD + strip-Mn transform; appends to out, returns #cps.
static int transform_cp(uint32_t cp, uint32_t out[4]) {
  uint32_t lo = 0, hi = kNumTransforms;
  while (lo < hi) {
    uint32_t mid = (lo + hi) / 2;
    if (kTransforms[mid].cp < cp) lo = mid + 1;
    else hi = mid;
  }
  if (lo < kNumTransforms && kTransforms[lo].cp == cp) {
    for (int j = 0; j < kTransforms[lo].n; ++j) out[j] = kTransforms[lo].out[j];
    return kTransforms[lo].n;
  }
  out[0] = cp;
  return 1;
}

// ---------------------------------------------------------------------------
// Tokenizer context
// ---------------------------------------------------------------------------

struct EtokCtx {
  std::unordered_map<std::string, int32_t> word;
  std::unordered_map<std::string, int32_t> subword;
  int32_t cls_id = 101, sep_id = 102, unk_id = 100, pad_id = 0;
  bool lowercase = true;       // also controls accent stripping
  bool cjk_spacing = true;
  int max_chars_per_word = 100;
};

struct Word {
  std::string text;
  std::vector<uint32_t> char_offsets;  // byte offset of each char + end
};

static void normalize_and_split(const EtokCtx& ctx, const char* text,
                                size_t len, std::vector<Word>* words) {
  Word cur;
  auto flush = [&]() {
    if (!cur.text.empty()) {
      cur.char_offsets.push_back(cur.text.size());
      words->push_back(std::move(cur));
      cur = Word();
    }
  };
  auto push_cp = [&](uint32_t cp) {
    cur.char_offsets.push_back(cur.text.size());
    utf8_encode(cp, &cur.text);
  };

  size_t i = 0;
  while (i < len) {
    uint32_t cp;
    i += utf8_decode(text, len, i, &cp);
    if (cp == 0 || cp == 0xFFFD || is_ctrl(cp)) continue;  // clean_text
    if (is_ws(cp)) { flush(); continue; }
    if (ctx.cjk_spacing && is_cjk(cp)) {
      // CJK isolation is decided on the PRE-normalization codepoint (HF
      // BertNormalizer order), but the char itself still goes through the
      // NFD/lowercase transform — compatibility ideographs (U+F900..)
      // map to their canonical unified forms.
      flush();
      uint32_t tr[4];
      int n = 1;
      if (ctx.lowercase) n = transform_cp(cp, tr); else tr[0] = cp;
      for (int j = 0; j < n; ++j) push_cp(tr[j]);
      flush();
      continue;
    }
    uint32_t tr[4];
    int n = 1;
    if (ctx.lowercase) n = transform_cp(cp, tr); else tr[0] = cp;
    for (int j = 0; j < n; ++j) {
      uint32_t c2 = tr[j];
      // transforms can surface whitespace (rare) — treat as split
      if (is_ws(c2)) { flush(); continue; }
      if (is_punct(c2)) {  // punctuation isolation (BertPreTokenizer)
        flush();
        push_cp(c2);
        flush();
      } else {
        push_cp(c2);
      }
    }
  }
  flush();
}

static void wordpiece(const EtokCtx& ctx, const Word& w,
                      std::vector<int32_t>* out) {
  const size_t n_chars = w.char_offsets.size() - 1;
  if ((int)n_chars > ctx.max_chars_per_word) {
    out->push_back(ctx.unk_id);
    return;
  }
  std::vector<int32_t> ids;
  const auto* table = &ctx.word;
  std::string probe;  // reused across lookups: no per-probe allocation
  size_t i = 0;
  while (i < n_chars) {
    size_t j = n_chars;
    int32_t hit = -1;
    for (; j > i; --j) {
      const size_t b0 = w.char_offsets[i], b1 = w.char_offsets[j];
      probe.assign(w.text.data() + b0, b1 - b0);
      auto it = table->find(probe);
      if (it != table->end()) { hit = it->second; break; }
    }
    if (hit < 0) {  // whole-word UNK (HF semantics)
      out->push_back(ctx.unk_id);
      return;
    }
    ids.push_back(hit);
    i = j;
    table = &ctx.subword;
  }
  out->insert(out->end(), ids.begin(), ids.end());
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

EtokCtx* etok_new(const char* const* tokens, int32_t n_tokens,
                  int32_t lowercase, int32_t cjk_spacing) {
  auto* ctx = new EtokCtx();
  ctx->lowercase = lowercase != 0;
  ctx->cjk_spacing = cjk_spacing != 0;
  for (int32_t i = 0; i < n_tokens; ++i) {
    std::string t = tokens[i];
    if (t.rfind("##", 0) == 0) ctx->subword.emplace(t.substr(2), i);
    else ctx->word.emplace(t, i);
  }
  auto find = [&](const char* t, int32_t fallback) {
    auto it = ctx->word.find(t);
    return it != ctx->word.end() ? it->second : fallback;
  };
  ctx->cls_id = find("[CLS]", 101);
  ctx->sep_id = find("[SEP]", 102);
  ctx->unk_id = find("[UNK]", 100);
  ctx->pad_id = find("[PAD]", 0);
  return ctx;
}

void etok_free(EtokCtx* ctx) { delete ctx; }

// Tokenize text -> out (with [CLS]/[SEP], truncated to max_len tokens).
// Returns the token count, or -1 if out_capacity is too small.
int32_t etok_encode(const EtokCtx* ctx, const char* text, int32_t text_len,
                    int32_t* out, int32_t out_capacity, int32_t max_len) {
  std::vector<Word> words;
  normalize_and_split(*ctx, text,
                      text_len < 0 ? strlen(text) : (size_t)text_len, &words);
  std::vector<int32_t> ids;
  for (const auto& w : words) wordpiece(*ctx, w, &ids);
  int32_t body = (int32_t)ids.size();
  if (max_len > 1 && body > max_len - 2) body = max_len - 2;
  const int32_t total = body + 2;
  if (total > out_capacity) return -1;
  out[0] = ctx->cls_id;
  std::copy(ids.begin(), ids.begin() + body, out + 1);
  out[body + 1] = ctx->sep_id;
  return total;
}

// unicodedata version the tables were generated with; the Python binding
// refuses the fast path when it differs from the runtime's unicodedata
// (a silent mismatch would break native/Python tokenizer parity).
const char* etok_unidata_version(void) { return kUnidataVersion; }

int32_t etok_cls_id(const EtokCtx* ctx) { return ctx->cls_id; }
int32_t etok_sep_id(const EtokCtx* ctx) { return ctx->sep_id; }
int32_t etok_unk_id(const EtokCtx* ctx) { return ctx->unk_id; }
int32_t etok_pad_id(const EtokCtx* ctx) { return ctx->pad_id; }

}  // extern "C"
