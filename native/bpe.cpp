// Native byte-level BPE tokenizer (C ABI, ctypes-loadable).
//
// The hot host-side path for the BPE model families (RoBERTa,
// ModernBERT, Qwen2 decoder embedders): GPT-2-style pre-tokenization,
// byte->unicode mapping, greedy rank-ordered pair merging — the same
// algorithm as embeddings_tpu/tokenizer/bpe.py (which is conformance-
// tested against the HF rust `tokenizers` oracle). The pre-tokenization
// regexes are hand-compiled scanners over the generated \p{L} / \p{N} /
// \s class tables (unicode_tables.h, derived from the Python engine's
// own `regex` module so the two implementations cannot drift):
//
//   pattern 0 (GPT-2 / RoBERTa / ModernBERT):
//     's|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+
//     |\s+(?!\S)|\s+
//   pattern 1 (Qwen2):
//     (?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}
//     | ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+
//
// Build: make -C native (compiled into libetok.so next to the WordPiece
// tokenizer). Python binding: embeddings_tpu/tokenizer/native.py.

#include <cctype>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include "unicode_tables.h"

namespace {

// --- UTF-8 decode (same validation behavior as tokenizer.cpp) -------------
static inline bool bpe_cont(const char* s, size_t k) {
  return ((unsigned char)s[k] & 0xC0) == 0x80;
}

static size_t bpe_decode(const char* s, size_t len, size_t i, uint32_t* cp) {
  const unsigned char c = s[i];
  if (c < 0x80) { *cp = c; return 1; }
  if ((c >> 5) == 0x6 && i + 1 < len && bpe_cont(s, i + 1)) {
    *cp = ((c & 0x1F) << 6) | (s[i + 1] & 0x3F);
    return 2;
  }
  if ((c >> 4) == 0xE && i + 2 < len && bpe_cont(s, i + 1) &&
      bpe_cont(s, i + 2)) {
    *cp = ((c & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6) | (s[i + 2] & 0x3F);
    return 3;
  }
  if ((c >> 3) == 0x1E && i + 3 < len && bpe_cont(s, i + 1) &&
      bpe_cont(s, i + 2) && bpe_cont(s, i + 3)) {
    *cp = ((c & 0x07) << 18) | ((s[i + 1] & 0x3F) << 12) |
          ((s[i + 2] & 0x3F) << 6) | (s[i + 3] & 0x3F);
    return 4;
  }
  *cp = 0xFFFD;
  return 1;
}

static bool bpe_in(const uint32_t (*ranges)[2], uint32_t n, uint32_t cp) {
  uint32_t lo = 0, hi = n;
  while (lo < hi) {
    uint32_t mid = (lo + hi) / 2;
    if (cp < ranges[mid][0]) hi = mid;
    else if (cp > ranges[mid][1]) lo = mid + 1;
    else return true;
  }
  return false;
}

static inline bool is_L(uint32_t cp) {
  return bpe_in(kLetterRanges, kNumLetterRanges, cp);
}
static inline bool is_N(uint32_t cp) {
  return bpe_in(kNumericRanges, kNumNumericRanges, cp);
}
static inline bool is_S(uint32_t cp) {
  return bpe_in(kRegexWsRanges, kNumRegexWsRanges, cp);
}

// --- pre-tokenization scanners ---------------------------------------------
// Both operate over a decoded (cp, byte_offset) view and append
// [start_byte, end_byte) piece spans.

struct CpView {
  std::vector<uint32_t> cp;
  std::vector<size_t> off;  // byte offset of each cp; off[n] = len
};

static void decode_all(const char* s, size_t len, CpView* v) {
  size_t i = 0;
  while (i < len) {
    uint32_t c;
    size_t n = bpe_decode(s, len, i, &c);
    v->cp.push_back(c);
    v->off.push_back(i);
    i += n;
  }
  v->off.push_back(len);
}

// matches 's 't 're 've 'm 'll 'd at position k (over codepoints);
// returns chars consumed or 0. ci = case-insensitive (Qwen2).
static size_t match_contraction(const CpView& v, size_t k, bool ci) {
  size_t n = v.cp.size();
  if (v.cp[k] != '\'' || k + 1 >= n) return 0;
  uint32_t a = v.cp[k + 1];
  uint32_t al = (ci && a < 128) ? (uint32_t)tolower((int)a) : a;
  if (al == 's' || al == 't' || al == 'm' || al == 'd') return 2;
  if (k + 2 < n) {
    uint32_t b = v.cp[k + 2];
    uint32_t bl = (ci && b < 128) ? (uint32_t)tolower((int)b) : b;
    if ((al == 'r' && bl == 'e') || (al == 'v' && bl == 'e') ||
        (al == 'l' && bl == 'l'))
      return 3;
  }
  return 0;
}

// GPT-2 pattern: returns chars consumed from k.
static size_t scan_gpt2(const CpView& v, size_t k) {
  size_t n = v.cp.size();
  size_t c = match_contraction(v, k, false);
  if (c) return c;
  // " ?\p{L}+" / " ?\p{N}+" / " ?[^\s\p{L}\p{N}]+"
  size_t j = k;
  bool sp = (v.cp[j] == ' ' && j + 1 < n);
  size_t b = sp ? j + 1 : j;
  if (b < n) {
    uint32_t c0 = v.cp[b];
    if (is_L(c0)) {
      size_t e = b;
      while (e < n && is_L(v.cp[e])) e++;
      return e - k;
    }
    if (is_N(c0)) {
      size_t e = b;
      while (e < n && is_N(v.cp[e])) e++;
      return e - k;
    }
    if (!is_S(c0)) {
      size_t e = b;
      while (e < n && !is_S(v.cp[e]) && !is_L(v.cp[e]) && !is_N(v.cp[e]))
        e++;
      return e - k;
    }
  }
  // whitespace: "\s+(?!\S)" then "\s+"
  size_t e = k;
  while (e < n && is_S(v.cp[e])) e++;
  if (e == k) return 1;  // lone unmatchable char (can't happen: all
                         // non-space cases handled above)
  if (e < n && e - k > 1) return e - 1 - k;  // leave last ws for " ?X"/\s+
  return e - k;
}

// Qwen2 pattern: returns chars consumed from k.
static size_t scan_qwen2(const CpView& v, size_t k) {
  size_t n = v.cp.size();
  size_t c = match_contraction(v, k, true);
  if (c) return c;
  uint32_t c0 = v.cp[k];
  bool crlf0 = (c0 == '\r' || c0 == '\n');
  // "[^\r\n\p{L}\p{N}]?\p{L}+"
  if (is_L(c0)) {
    size_t e = k;
    while (e < n && is_L(v.cp[e])) e++;
    return e - k;
  }
  if (!crlf0 && !is_N(c0) && k + 1 < n && is_L(v.cp[k + 1])) {
    size_t e = k + 1;
    while (e < n && is_L(v.cp[e])) e++;
    return e - k;
  }
  // "\p{N}" — single digit
  if (is_N(c0)) return 1;
  // " ?[^\s\p{L}\p{N}]+[\r\n]*"
  {
    size_t b = (c0 == ' ' && k + 1 < n) ? k + 1 : k;
    uint32_t cb = v.cp[b];
    if (b < n && !is_S(cb) && !is_L(cb) && !is_N(cb)) {
      size_t e = b;
      while (e < n && !is_S(v.cp[e]) && !is_L(v.cp[e]) && !is_N(v.cp[e]))
        e++;
      while (e < n && (v.cp[e] == '\r' || v.cp[e] == '\n')) e++;
      return e - k;
    }
  }
  // "\s*[\r\n]+": ws run that reaches a newline run
  if (is_S(c0)) {
    size_t e = k;
    while (e < n && is_S(v.cp[e]) && v.cp[e] != '\r' && v.cp[e] != '\n')
      e++;
    if (e < n && (v.cp[e] == '\r' || v.cp[e] == '\n')) {
      while (e < n && (v.cp[e] == '\r' || v.cp[e] == '\n')) e++;
      // regex backtracking: \s* may also swallow ws AFTER newlines when
      // followed by more newlines — greedy [\r\n]+ then repeats; handle
      // mixed runs: keep alternating while the next ws run ends in \r\n
      for (;;) {
        size_t w = e;
        while (w < n && is_S(v.cp[w]) && v.cp[w] != '\r' && v.cp[w] != '\n')
          w++;
        if (w < n && (v.cp[w] == '\r' || v.cp[w] == '\n')) {
          e = w;
          while (e < n && (v.cp[e] == '\r' || v.cp[e] == '\n')) e++;
        } else {
          break;
        }
      }
      return e - k;
    }
    // "\s+(?!\S)" then "\s+"
    if (e == n) return e - k;
    if (e - k > 1) return e - 1 - k;
    return e - k;
  }
  return 1;  // unreachable fallback: consume one char
}

// --- byte -> printable-unicode table (GPT-2 bytes_to_unicode) --------------
static void byte_unicode_table(uint32_t out[256]) {
  bool direct[256] = {false};
  for (int b = '!'; b <= '~'; b++) direct[b] = true;
  for (int b = 0xA1; b <= 0xAC; b++) direct[b] = true;
  for (int b = 0xAE; b <= 0xFF; b++) direct[b] = true;
  int nshift = 0;
  for (int b = 0; b < 256; b++) {
    if (direct[b]) out[b] = (uint32_t)b;
    else out[b] = 256 + nshift++;
  }
}

// --- tokenizer object -------------------------------------------------------
struct EBpe {
  // vocab and merge ranks over byte-mapped strings; rank keys are
  // "left\x01right". No mutable state is touched at encode time — the
  // serving layer calls encode from many threads concurrently (ctypes
  // releases the GIL), so the object must be read-only after ebpe_new.
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::string, uint32_t> ranks;
  uint32_t b2u[256];
  int pattern = 0;        // 0 = gpt2, 1 = qwen2
  bool add_prefix_space = false;
  int32_t unk_id = 3;
};

// greedy lowest-rank-first merge over one byte-mapped piece (identical
// to the published GPT-2 merge loop / bpe.py _bpe).
static void bpe_merge(const EBpe* t, const std::string& mapped,
                      std::vector<int32_t>* out) {
  // NO whole-piece vocab shortcut: BPE output is defined by the merge
  // ranks, and a vocab entry the merges cannot reach must NOT be
  // emitted (the Python engine and the rust oracle both merge-walk)
  // split into single-codepoint symbols
  std::vector<std::string> parts;
  size_t i = 0, len = mapped.size();
  while (i < len) {
    uint32_t cp;
    size_t n = bpe_decode(mapped.c_str(), len, i, &cp);
    parts.push_back(mapped.substr(i, n));
    i += n;
  }
  std::string key;
  while (parts.size() >= 2) {
    uint32_t best_rank = UINT32_MAX;
    size_t best_i = 0;
    for (size_t k = 0; k + 1 < parts.size(); k++) {
      key.assign(parts[k]);
      key.push_back('\x01');
      key.append(parts[k + 1]);
      auto it = t->ranks.find(key);
      if (it != t->ranks.end() && it->second < best_rank) {
        best_rank = it->second;
        best_i = k;
      }
    }
    if (best_rank == UINT32_MAX) break;
    const std::string a = parts[best_i], b = parts[best_i + 1];
    const std::string merged = a + b;
    std::vector<std::string> next;
    next.reserve(parts.size());
    for (size_t k = 0; k < parts.size();) {
      if (k + 1 < parts.size() && parts[k] == a && parts[k + 1] == b) {
        next.push_back(merged);
        k += 2;
      } else {
        next.push_back(parts[k]);
        k += 1;
      }
    }
    parts.swap(next);
  }
  for (const std::string& s : parts) {
    auto it = t->vocab.find(s);
    out->push_back(it != t->vocab.end() ? it->second : t->unk_id);
  }
}

}  // namespace

extern "C" {

// vocab: n token strings (byte-mapped, UTF-8), index = id is NOT
// assumed — ids arrive in a parallel array. merges: m strings
// "left<0x01>right". pattern: 0 = gpt2, 1 = qwen2.
void* ebpe_new(const char** tokens, const int32_t* ids, int32_t n,
               const char** merges, int32_t m, int32_t pattern,
               int32_t add_prefix_space, int32_t unk_id) {
  EBpe* t = new EBpe();
  t->pattern = pattern;
  t->add_prefix_space = add_prefix_space != 0;
  t->unk_id = unk_id;
  byte_unicode_table(t->b2u);
  for (int32_t i = 0; i < n; i++) t->vocab.emplace(tokens[i], ids[i]);
  for (int32_t i = 0; i < m; i++)
    t->ranks.emplace(merges[i], (uint32_t)i);
  return t;
}

void ebpe_free(void* h) { delete (EBpe*)h; }

// text (UTF-8) -> ids (NO specials added; the Python wrapper wraps).
// Returns count, or -(needed) when cap is too small.
int32_t ebpe_encode(void* h, const char* text, int32_t text_len,
                    int32_t* out, int32_t cap) {
  const EBpe* t = (const EBpe*)h;
  std::string buf;
  const char* s = text;
  size_t len = (size_t)text_len;
  if (t->add_prefix_space && len > 0 && s[0] != ' ') {
    buf.assign(1, ' ');
    buf.append(s, len);
    s = buf.c_str();
    len = buf.size();
  }
  CpView v;
  decode_all(s, len, &v);
  std::vector<int32_t> ids;
  std::string mapped;
  // per-thread memo of merged pieces (same role as bpe.py's _cache):
  // natural text repeats words heavily and the merge loop is O(p^2).
  // Keyed by tokenizer pointer so two models sharing a thread don't
  // cross-pollute; entries for freed tokenizers are tiny and bounded
  // by the number of tokenizers a process creates.
  using Memo = std::unordered_map<std::string, std::vector<int32_t>>;
  static thread_local std::unordered_map<const void*, Memo> memo_by_tok;
  Memo& memo = memo_by_tok[h];
  size_t k = 0;
  while (k < v.cp.size()) {
    size_t consumed = (t->pattern == 1) ? scan_qwen2(v, k)
                                        : scan_gpt2(v, k);
    if (consumed == 0) consumed = 1;  // defensive: never stall
    size_t b0 = v.off[k], b1 = v.off[k + consumed];
    mapped.clear();
    for (size_t bi = b0; bi < b1; bi++) {
      uint32_t u = t->b2u[(unsigned char)s[bi]];
      // encode u (< 0x180) as UTF-8
      if (u < 0x80) {
        mapped.push_back((char)u);
      } else {
        mapped.push_back((char)(0xC0 | (u >> 6)));
        mapped.push_back((char)(0x80 | (u & 0x3F)));
      }
    }
    auto hit = memo.find(mapped);
    if (hit != memo.end()) {
      ids.insert(ids.end(), hit->second.begin(), hit->second.end());
    } else {
      size_t before = ids.size();
      bpe_merge(t, mapped, &ids);
      memo.emplace(mapped, std::vector<int32_t>(ids.begin() + before,
                                                ids.end()));
    }
    k += consumed;
  }
  if ((int32_t)ids.size() > cap) return -(int32_t)ids.size();
  memcpy(out, ids.data(), ids.size() * sizeof(int32_t));
  return (int32_t)ids.size();
}

}  // extern "C"
