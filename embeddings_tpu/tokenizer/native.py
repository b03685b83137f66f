"""ctypes binding for the native C++ tokenizer (native/tokenizer.cpp).

Drop-in replacement for the hot path of WordPieceTokenizer.encode: same
algorithm, same tables (generated from the same unicodedata), ~10-30x
faster on long batches. Falls back cleanly when the .so isn't built:

    tok = WordPieceTokenizer(vocab)
    ntok = NativeWordPieceTokenizer.wrap(tok)   # or None if unavailable
"""

from __future__ import annotations

import ctypes
import os
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATHS = [
    # ET_NATIVE_BUILD_DIR selects an alternate build flavor (e.g. the
    # sanitizer build, native/Makefile SANITIZE=...)
    _NATIVE_DIR / os.environ.get("ET_NATIVE_BUILD_DIR", "build")
    / "libetok.so",
    Path(__file__).resolve().parent / "libetok.so",
]

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        if not p.exists():
            continue
        try:
            lib = ctypes.CDLL(str(p))
        except OSError:
            continue  # corrupt/wrong-arch .so: try the next candidate
        lib.etok_new.restype = ctypes.c_void_p
        lib.etok_new.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                 ctypes.c_int32, ctypes.c_int32,
                                 ctypes.c_int32]
        lib.etok_free.argtypes = [ctypes.c_void_p]
        lib.etok_encode.restype = ctypes.c_int32
        lib.etok_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_int32]
        for name in ("cls", "sep", "unk", "pad"):
            fn = getattr(lib, f"etok_{name}_id")
            fn.restype = ctypes.c_int32
            fn.argtypes = [ctypes.c_void_p]
        # tables baked at build time must match the runtime's Unicode
        # data or normalization silently diverges from the Python path
        try:
            lib.etok_unidata_version.restype = ctypes.c_char_p
            import unicodedata
            built = lib.etok_unidata_version().decode()
            if built != unicodedata.unidata_version:
                continue  # stale .so: try the next candidate
        except AttributeError:
            continue  # old .so without the version symbol
        _lib = lib
        return lib
    return None


def available() -> bool:
    return _load_lib() is not None


class NativeWordPieceTokenizer:
    """Same interface subset as WordPieceTokenizer (encode/encode_batch)."""

    def __init__(self, tokens: list[str], *, lowercase: bool = True,
                 tokenize_chinese_chars: bool = True):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "native tokenizer not built (run `make -C native`)")
        self._lib = lib
        arr = (ctypes.c_char_p * len(tokens))(
            *[t.encode("utf-8") for t in tokens])
        self._ctx = lib.etok_new(arr, len(tokens), int(lowercase),
                                 int(tokenize_chinese_chars))
        self.cls_id = lib.etok_cls_id(self._ctx)
        self.sep_id = lib.etok_sep_id(self._ctx)
        self.unk_id = lib.etok_unk_id(self._ctx)
        self.pad_id = lib.etok_pad_id(self._ctx)
        # per-THREAD scratch buffers: ctypes releases the GIL during the
        # call, and the serving layer runs encode_batch from multiple
        # worker threads concurrently — one shared buffer would let two
        # requests interleave ids silently
        self._tls = threading.local()

    def _scratch(self):
        buf = getattr(self._tls, "buf", None)
        if buf is None:
            buf = (ctypes.c_int32 * 8192)()
            self._tls.buf = buf
        return buf

    @classmethod
    def wrap(cls, tok) -> "NativeWordPieceTokenizer | None":
        """Build from a WordPieceTokenizer if the lib is available AND the
        tokenizer's config is representable natively; otherwise None (the
        caller keeps the Python implementation). The C++ side couples
        accent stripping to lowercasing and resolves special tokens by
        their default literal names — configs that deviate (e.g. HF's
        do_lower_case=true + strip_accents=false, or custom special
        tokens) must not silently get different ids from the fast path."""
        from .wordpiece import WordPieceTokenizer
        if not isinstance(tok, WordPieceTokenizer):
            return None  # BPE/Unigram tokenizers have no native fast path
        if not available():
            return None
        sa = tok.strip_accents
        if sa is not None and bool(sa) != bool(tok.lowercase):
            return None
        if getattr(tok, "max_input_chars_per_word", 100) != 100:
            return None  # C++ side hardcodes 100 (native/tokenizer.cpp)
        nt = cls(tok.vocab.id_to_token,
                 lowercase=tok.lowercase,
                 tokenize_chinese_chars=tok.tokenize_chinese_chars)
        if (nt.cls_id, nt.sep_id, nt.unk_id, nt.pad_id) != \
                (tok.cls_id, tok.sep_id, tok.unk_id, tok.pad_id):
            return None
        return nt

    def encode(self, text: str, max_len: int | None = None) -> list[int]:
        if max_len is not None and 0 < max_len < 2:
            raise ValueError("max_len must be >= 2 ([CLS] + [SEP])")
        data = text.encode("utf-8")
        buf = self._scratch()
        n = self._lib.etok_encode(self._ctx, data, len(data), buf,
                                  len(buf), max_len or -1)
        if n < 0:
            big = (ctypes.c_int32 * (len(data) + 2))()
            n = self._lib.etok_encode(self._ctx, data, len(data), big,
                                      len(big), max_len or -1)
            return list(big[:n])
        return list(buf[:n])

    def encode_batch(self, texts, max_len: int | None = None):
        return [self.encode(t, max_len) for t in texts]

    def __del__(self):
        try:
            if getattr(self, "_ctx", None):
                self._lib.etok_free(self._ctx)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# byte-level BPE fast path (native/bpe.cpp, same .so)
# ---------------------------------------------------------------------------

def _bind_bpe(lib) -> bool:
    if getattr(lib, "_ebpe_bound", False):
        return True
    try:
        lib.ebpe_new.restype = ctypes.c_void_p
        lib.ebpe_new.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.ebpe_free.argtypes = [ctypes.c_void_p]
        lib.ebpe_encode.restype = ctypes.c_int32
        lib.ebpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    except AttributeError:
        return False  # old .so without the BPE entry points
    lib._ebpe_bound = True
    return True


class NativeBPETokenizer:
    """Fast path for ByteLevelBPETokenizer.encode (same contract:
    specials wrapped per special_style, same truncation)."""

    def __init__(self, tok):
        from .bpe import _GPT2_PATTERN, _QWEN2_PATTERN
        lib = _load_lib()
        if lib is None or not _bind_bpe(lib):
            raise RuntimeError("native BPE not built (run `make -C native`)")
        self._lib = lib
        pattern = {_GPT2_PATTERN: 0, _QWEN2_PATTERN: 1}[tok.pattern]
        items = list(tok.token_to_id.items())
        toks = (ctypes.c_char_p * len(items))(
            *[t.encode("utf-8") for t, _ in items])
        ids = (ctypes.c_int32 * len(items))(*[i for _, i in items])
        merges = sorted(tok.merge_ranks.items(), key=lambda kv: kv[1])
        marr = (ctypes.c_char_p * len(merges))(
            *[f"{a}\x01{b}".encode("utf-8") for (a, b), _ in merges])
        self._ctx = lib.ebpe_new(toks, ids, len(items), marr, len(merges),
                                 pattern, int(tok.add_prefix_space),
                                 tok.unk_id)
        self.cls_id = tok.cls_id
        self.sep_id = tok.sep_id
        self.unk_id = tok.unk_id
        self.pad_id = tok.pad_id
        self.special_style = tok.special_style
        self._tls = threading.local()

    @classmethod
    def wrap(cls, tok) -> "NativeBPETokenizer | None":
        """Build from a ByteLevelBPETokenizer when the lib is available
        and the pre-tokenization pattern is one the C++ scanner
        implements (GPT-2 or Qwen2); otherwise None."""
        from .bpe import ByteLevelBPETokenizer, _GPT2_PATTERN, \
            _QWEN2_PATTERN
        if not isinstance(tok, ByteLevelBPETokenizer):
            return None
        lib = _load_lib()
        if lib is None or not _bind_bpe(lib):
            return None
        if tok.pattern not in (_GPT2_PATTERN, _QWEN2_PATTERN):
            return None  # custom regex: keep the Python engine
        return cls(tok)

    def _scratch(self):
        buf = getattr(self._tls, "buf", None)
        if buf is None:
            buf = (ctypes.c_int32 * 8192)()
            self._tls.buf = buf
        return buf

    def _raw(self, text: str) -> list[int]:
        data = text.encode("utf-8")
        buf = self._scratch()
        n = self._lib.ebpe_encode(self._ctx, data, len(data), buf, len(buf))
        if n < 0:
            big = (ctypes.c_int32 * (-n))()
            n = self._lib.ebpe_encode(self._ctx, data, len(data), big,
                                      len(big))
            return list(big[:n])
        return list(buf[:n])

    def encode(self, text: str, max_len: int | None = None) -> list[int]:
        n_special = 1 if self.special_style == "eos_only" else 2
        if max_len is not None and 0 < max_len < n_special:
            raise ValueError(f"max_len must be >= {n_special}")
        ids = self._raw(text)
        if max_len is not None and len(ids) > max_len - n_special:
            ids = ids[: max_len - n_special]
        if self.special_style == "eos_only":
            return ids + [self.sep_id]
        return [self.cls_id] + ids + [self.sep_id]

    def encode_batch(self, texts, max_len: int | None = None):
        return [self.encode(t, max_len) for t in texts]

    def __del__(self):
        try:
            if getattr(self, "_ctx", None):
                self._lib.ebpe_free(self._ctx)
        except Exception:
            pass


def _bind_unigram(lib) -> bool:
    if getattr(lib, "_euni_bound", False):
        return True
    try:
        lib.euni_new.restype = ctypes.c_void_p
        lib.euni_new.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_double, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.euni_free.argtypes = [ctypes.c_void_p]
        lib.euni_encode.restype = ctypes.c_int32
        lib.euni_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    except AttributeError:
        return False  # .so built before unigram.cpp existed
    lib._euni_bound = True
    return True


class NativeUnigramTokenizer:
    """Fast path for UnigramTokenizer.encode: metaspace + Viterbi +
    unk/byte-fallback emission in C++ (native/unigram.cpp). The
    normalizer (NFKC / precompiled charsmap / lowercase chains) STAYS on
    the wrapped Python tokenizer — it is <3% of tokenization time
    (benchmarks/unigram_throughput.py) and the conformance-critical
    part, so only the 97% Viterbi hot loop crosses the FFI."""

    def __init__(self, tok):
        from .unigram import _UNK_PENALTY
        lib = _load_lib()
        if lib is None or not _bind_unigram(lib):
            raise RuntimeError(
                "native unigram not built (run `make -C native`)")
        self._lib = lib
        self._py = tok  # normalization + special ids stay authoritative
        pieces = (ctypes.c_char_p * len(tok.pieces))(
            *[p.encode("utf-8") for p in tok.pieces])
        scores = (ctypes.c_double * len(tok.scores))(*tok.scores)
        byte_ids = None
        if tok.byte_fallback:
            byte_ids = (ctypes.c_int32 * 256)(
                *[(-1 if i is None else i) for i in tok._byte_ids])
        unk_emit = tok.unk_id_model if tok.unk_id_model is not None else -1
        self._ctx = lib.euni_new(
            pieces, scores, len(tok.pieces), unk_emit,
            float(tok._min_score - _UNK_PENALTY), int(tok.fuse_unk),
            byte_ids, int(tok.prepend_scheme != "never"))
        self.cls_id = tok.cls_id
        self.sep_id = tok.sep_id
        self.unk_id = tok.unk_id
        self.pad_id = tok.pad_id
        self._tls = threading.local()

    @classmethod
    def wrap(cls, tok) -> "NativeUnigramTokenizer | None":
        from .unigram import UnigramTokenizer
        if not isinstance(tok, UnigramTokenizer):
            return None
        lib = _load_lib()
        if lib is None or not _bind_unigram(lib):
            return None
        return cls(tok)

    def _scratch(self):
        buf = getattr(self._tls, "buf", None)
        if buf is None:
            buf = (ctypes.c_int32 * 8192)()
            self._tls.buf = buf
        return buf

    def tokenize_to_ids(self, text: str) -> list[int]:
        data = self._py._normalize(text).encode("utf-8")
        buf = self._scratch()
        n = self._lib.euni_encode(self._ctx, data, len(data), buf,
                                  len(buf))
        if n < 0:
            big = (ctypes.c_int32 * (-n))()
            n = self._lib.euni_encode(self._ctx, data, len(data), big,
                                      len(big))
            return list(big[:n])
        return list(buf[:n])

    def encode(self, text: str, max_len: int | None = None) -> list[int]:
        if max_len is not None and 0 < max_len < 2:
            raise ValueError("max_len must be >= 2 (<s> + </s>)")
        ids = self.tokenize_to_ids(text)
        if max_len is not None and len(ids) > max_len - 2:
            ids = ids[: max_len - 2]
        return [self.cls_id] + ids + [self.sep_id]

    def encode_batch(self, texts, max_len: int | None = None):
        return [self.encode(t, max_len) for t in texts]

    def encode_pair(self, a: str, b: str, max_len: int | None = None):
        """Same XLM-R pair layout as UnigramTokenizer.encode_pair
        (<s> a </s></s> b </s>), both segmentations native."""
        from .wordpiece import truncate_pair
        ia, ib = self.tokenize_to_ids(a), self.tokenize_to_ids(b)
        if not ib:
            ids = self.encode(a, max_len)
            return ids, [0] * len(ids)
        if max_len is not None:
            ia, ib = truncate_pair(ia, ib, max_len - 4)
        ids = ([self.cls_id] + ia + [self.sep_id, self.sep_id]
               + ib + [self.sep_id])
        return ids, [0] * len(ids)

    def __del__(self):
        try:
            if getattr(self, "_ctx", None):
                self._lib.euni_free(self._ctx)
        except Exception:
            pass


def wrap_fast(tok):
    """The Engine's fast-tokenizer dispatcher: the native WordPiece,
    BPE, or Unigram implementation matching `tok`, or None (keep
    Python)."""
    fast = NativeWordPieceTokenizer.wrap(tok)
    if fast is not None:
        return fast
    fast = NativeBPETokenizer.wrap(tok)
    if fast is not None:
        return fast
    return NativeUnigramTokenizer.wrap(tok)
