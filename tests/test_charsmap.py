"""Precompiled charsmap conformance against the rust oracle.

``tokenizers.normalizers.Precompiled`` (the spm_precompiled crate) is
the exact component HF pipelines run for sentencepiece's frozen
nmt_nfkc charsmaps; our pure-Python ``PrecompiledCharsmap`` must match
it byte-for-byte. No real charsmap blob is available offline, so these
tests BUILD genuine darts-clone double-array tries from scratch
(``build_charsmap``) and feed the identical blob to both sides — the
same offline-oracle method as the WordPiece/BPE/Unigram conformance
suites.
"""

from __future__ import annotations

import base64
import json
import struct

import pytest

from embeddings_tpu.tokenizer.charsmap import PrecompiledCharsmap


def build_charsmap(mapping: dict[str, str], pad_units: int = 4096) -> bytes:
    """Serialize ``mapping`` as a precompiled charsmap blob.

    Builds a real darts-clone double array: unit =
    (offset << 10) | (has_leaf << 8) | label, leaf unit =
    0x80000000 | pool_offset at the node's base position. Each node
    gets a DISTINCT base (darts-clone reserves chosen offsets), which
    is what makes label-only transition checks sound. The trie is
    padded with zero units because the rust crate indexes positions
    without bounds checks (real nmt_nfkc tries are large).
    """
    pool = bytearray()
    offs: dict[str, int] = {}
    for k, v in mapping.items():
        offs[k] = len(pool)
        pool += v.encode("utf-8") + b"\0"
    root: dict = {}
    term: dict[int, int] = {}
    for k in mapping:
        node = root
        for b in k.encode("utf-8"):
            node = node.setdefault(b, {})
        term[id(node)] = offs[k]
    units = [0] * 16
    used = {0}
    used_bases = {0}

    def ensure(n: int) -> None:
        while len(units) <= n:
            units.append(0)

    def alloc_base(labels: list[int], terminal: bool) -> int:
        b = 1
        while True:
            slots = [b ^ c for c in labels] + ([b] if terminal else [])
            if b not in used_bases and all(s not in used for s in slots):
                used_bases.add(b)
                for s in slots:
                    used.add(s)
                    ensure(s)
                return b
            b += 1

    def place(node: dict, pos: int) -> None:
        labels = sorted(node)
        terminal = id(node) in term
        base = alloc_base(labels, terminal)
        offset = pos ^ base
        assert offset < (1 << 21)
        units[pos] = (offset << 10) | ((1 if terminal else 0) << 8) \
            | (units[pos] & 0xFF)
        if terminal:
            units[base] = 0x80000000 | term[id(node)]
        for c in labels:
            units[base ^ c] = c
            place(node[c], base ^ c)

    place(root, 0)
    units.extend([0] * max(0, pad_units - len(units)))
    return (struct.pack("<I", len(units) * 4)
            + b"".join(struct.pack("<I", u) for u in units)
            + bytes(pool))


# every key/value spelled with explicit escapes so composition is pinned
MAPPING = {
    "Ａ": "A",              # fullwidth A
    "…": "...",            # ellipsis, 1 -> 3 chars
    "­": "",               # soft hyphen -> removed
    "e": "E",
    "é": "Z",             # decomposed e+acute: LONGER key than "e"
    "́": "'",              # lone combining acute
    "x": "y",
    "ﬁ": "fi",             # fi ligature
    "\U0001f44d": "+1",         # 4-byte emoji (single char, < 6 bytes)
}


@pytest.fixture(scope="module")
def oracle():
    from tokenizers.normalizers import Precompiled
    return Precompiled(build_charsmap(MAPPING))


@pytest.fixture(scope="module")
def ours():
    return PrecompiledCharsmap(build_charsmap(MAPPING))


CASES = [
    "hello Ａ world…",
    "soft­hyphen",
    "éclair",              # grapheme with both full and prefix keys
    "café é",         # precomposed é has no key: passthrough
    "́ lone mark",
    "ﬁle",
    "Ａ́",              # fullwidth A + mark: prefix key only
    "\U0001f44d\U0001f3fd up",   # 8-byte grapheme: > 6-byte bypass
    "\U0001f44d up",             # 4-byte emoji grapheme: mapped whole
    "xxe…",
    "",
    "plain ascii only",
]


@pytest.mark.parametrize("text", CASES)
def test_matches_rust_oracle(text, oracle, ours):
    assert ours.normalize(text) == oracle.normalize_str(text)


def test_shortest_prefix_match_replaces_whole_grapheme(oracle, ours):
    """spm_precompiled takes results[0] of the common-prefix search —
    the SHORTEST match — and substitutes it for the ENTIRE grapheme
    cluster ("Yes, this seems broken" — spm_precompiled src/lib.rs).
    Keys "e" and "é" both exist; the cluster "é" must
    become "E", not "Z"."""
    assert oracle.normalize_str("é") == "E"
    assert ours.normalize("é") == "E"


def test_fuzz_matches_rust_oracle(oracle, ours):
    import random
    rng = random.Random(0)
    alphabet = list("abcex Ａ…­́ﬁé") + [
        "é", "\U0001f44d", "\U0001f44d\U0001f3fd", "中"]
    for _ in range(3000):
        t = "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(0, 24)))
        assert ours.normalize(t) == oracle.normalize_str(t), repr(t)


def test_malformed_blobs_refused():
    with pytest.raises(ValueError):
        PrecompiledCharsmap(b"\x01")
    with pytest.raises(ValueError):  # trie size beyond blob
        PrecompiledCharsmap(struct.pack("<I", 64) + b"\0" * 8)
    with pytest.raises(ValueError):  # unaligned trie size
        PrecompiledCharsmap(struct.pack("<I", 3) + b"\0" * 16)


def test_out_of_range_positions_no_match():
    """A tiny unpadded trie must fail closed (no match), not crash —
    unlike the rust crate, which panics on positions past the array."""
    blob = build_charsmap({"a": "Q"}, pad_units=0)
    cm = PrecompiledCharsmap(blob)
    assert cm.normalize("a中\U0001f44d") == "Q中\U0001f44d"


def test_unigram_tokenizer_json_precompiled_roundtrip(tmp_path):
    """A tokenizer.json carrying a Precompiled normalizer tokenizes
    identically to the rust Tokenizer end-to-end (ids included)."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers

    vocab = [("<unk>", 0.0), ("▁", -2.0), ("▁hE", -1.0),
             ("llo", -1.5), ("▁A", -1.2), ("E", -3.0),
             ("▁...", -1.1), ("fi", -2.5), ("lE", -2.2),
             ("y", -2.0), ("▁worl", -1.4), ("d", -2.8)]
    tok = Tokenizer(models.Unigram(vocab, unk_id=0, byte_fallback=False))
    tok.normalizer = normalizers.Precompiled(build_charsmap(MAPPING))
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    path = tmp_path / "tokenizer.json"
    tok.save(str(path))

    from embeddings_tpu.tokenizer.unigram import UnigramTokenizer
    ours = UnigramTokenizer.from_tokenizer_json(path)
    for text in CASES:
        got = ours.tokenize_to_ids(text)
        want = tok.encode(text, add_special_tokens=False).ids
        assert got == want, (text, got, want)


def test_tokenizer_json_precompiled_parses_blob(tmp_path):
    """from_tokenizer_json must decode the base64 charsmap and install a
    real PrecompiledCharsmap op (no NFKC approximation)."""
    blob = build_charsmap(MAPPING)
    d = {"model": {"type": "Unigram", "unk_id": 0,
                   "vocab": [["<unk>", 0.0], ["▁E", -1.0]]},
         "normalizer": {"type": "Precompiled",
                        "precompiled_charsmap":
                            base64.b64encode(blob).decode()},
         "pre_tokenizer": {"type": "Metaspace"}}
    path = tmp_path / "tokenizer.json"
    path.write_text(json.dumps(d))
    from embeddings_tpu.tokenizer.unigram import UnigramTokenizer
    ours = UnigramTokenizer.from_tokenizer_json(path)
    ops = (ours.normalizer if isinstance(ours.normalizer, list)
           else [ours.normalizer])
    assert any(isinstance(o, tuple) and o[0] == "precompiled"
               for o in ops), ours.normalizer
    assert ours.tokenize_to_ids("e") == [1]  # e -> E -> "▁E"


def test_spm_model_charsmap_used(tmp_path):
    """A raw sentencepiece .model whose NormalizerSpec carries a
    charsmap must normalize through it (not the NFKC approximation)."""
    from embeddings_tpu.tokenizer import spm
    from embeddings_tpu.tokenizer.unigram import UnigramTokenizer

    def fld(n, wire, payload):
        return bytes([(n << 3) | wire]) + payload

    def ld(n, payload):
        out = bytearray([(n << 3) | 2])
        v = len(payload)
        while True:
            b = v & 0x7F
            v >>= 7
            out.append(b | (0x80 if v else 0))
            if not v:
                break
        return bytes(out) + payload

    def piece(p, score, ptype=None):
        body = ld(1, p.encode()) + fld(2, 5, struct.pack("<f", score))
        if ptype is not None:
            body += fld(3, 0, bytes([ptype]))
        return ld(1, body)

    blob = build_charsmap(MAPPING)
    norm = ld(1, b"nmt_nfkc") + ld(2, blob) + fld(3, 0, b"\x01") \
        + fld(4, 0, b"\x01")
    trainer = fld(3, 0, b"\x01")  # model_type UNIGRAM
    data = (piece("<unk>", 0.0, spm.PIECE_UNKNOWN)
            + piece("<s>", 0.0, spm.PIECE_CONTROL)
            + piece("</s>", 0.0, spm.PIECE_CONTROL)
            + piece("▁E", -1.0) + piece("▁A", -1.2)
            + ld(2, trainer) + ld(3, norm))
    path = tmp_path / "spiece.model"
    path.write_bytes(data)
    m = spm.parse_model(path.read_bytes())
    assert m.precompiled_charsmap == blob
    ours = UnigramTokenizer.from_sentencepiece_model(path)
    assert ours.tokenize_to_ids("e") == [3]        # e -> E
    assert ours.tokenize_to_ids("Ａ") == [4]   # fullwidth A -> A
