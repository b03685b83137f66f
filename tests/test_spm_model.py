"""Raw sentencepiece .model loading: pure-Python ModelProto parser +
UnigramTokenizer.from_sentencepiece_model conformance.

Oracle method: serialize a real ModelProto with the protobuf runtime
(transformers bundles sentencepiece's schema), parse it with our
dependency-free wire-format reader, and check tokenization against a
rust `tokenizers` pipeline built the way HF's slow->fast converter
(SpmConverter) would build it from the same proto. This covers the
roadmap niche of checkpoints shipping ONLY spiece.model — no
tokenizer.json, no sentencepiece package (absent from this image).
"""

from __future__ import annotations

import json

import pytest

tokenizers = pytest.importorskip("tokenizers")
pb2 = pytest.importorskip("transformers.utils.sentencepiece_model_pb2_new")

from embeddings_tpu.tokenizer.spm import (MODEL_BPE, MODEL_UNIGRAM,
                                          PIECE_CONTROL, PIECE_UNKNOWN,
                                          parse_model)
from embeddings_tpu.tokenizer.unigram import UnigramTokenizer

from tests.test_unigram_tokenizer import CORPUS, PROMPTS

ACCENT_PROMPTS = ["Naïve Café Protégé", "``quoted'' text",
                  "ÜBER Zürich STRASSE", "İstanbul fiancée",
                  "double  space  collapse", "  lead and trail  "]


def _train_vocab(specials: list[str]) -> list[tuple[str, float]]:
    """Train a rust Unigram on the shared corpus; return its ordered
    (piece, score) vocab with the given specials at the front."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, trainers
    tok = Tokenizer(models.Unigram())
    tok.normalizer = normalizers.NFKC()
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    trainer = trainers.UnigramTrainer(
        vocab_size=300, show_progress=False, special_tokens=specials,
        unk_token="<unk>" if "<unk>" in specials else specials[1])
    corpus = [s.lower() for s in CORPUS] * 5
    tok.train_from_iterator(corpus, trainer)
    d = json.loads(tok.to_str())
    return [(p, float(s)) for p, s in d["model"]["vocab"]]


def _build_proto(vocab, *, unk_piece="<unk>", controls=(),
                 model_type=MODEL_UNIGRAM, normalizer_name="nfkc",
                 add_dummy_prefix=True, remove_extra_whitespaces=True,
                 unk_id=None, pad_id=-1, charsmap=b"") -> bytes:
    m = pb2.ModelProto()
    for piece, score in vocab:
        sp = m.pieces.add()
        sp.piece, sp.score = piece, score
        if piece == unk_piece:
            sp.type = PIECE_UNKNOWN
        elif piece in controls:
            sp.type = PIECE_CONTROL
    ts = m.trainer_spec
    ts.model_type = model_type
    ts.vocab_size = len(vocab)
    if unk_id is not None:
        ts.unk_id = unk_id
    ts.pad_id = pad_id
    ts.unk_piece = unk_piece
    ns = m.normalizer_spec
    ns.name = normalizer_name
    ns.add_dummy_prefix = add_dummy_prefix
    ns.remove_extra_whitespaces = remove_extra_whitespaces
    if charsmap:
        ns.precompiled_charsmap = charsmap
    return m.SerializeToString()


def _rust_pipeline(vocab, unk_id, extra_normalizers=()):
    """The pipeline HF's SpmConverter builds: Unigram(vocab) +
    [extra...] + NFKC + Replace(Regex(' {2,}'), ' ') + Metaspace."""
    from tokenizers import Regex, Tokenizer, models, normalizers, pre_tokenizers
    tok = Tokenizer(models.Unigram(vocab, unk_id=unk_id, byte_fallback=False))
    tok.normalizer = normalizers.Sequence(
        [*extra_normalizers, normalizers.NFKC(),
         normalizers.Replace(Regex(" {2,}"), " ")])
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    return tok


# -- parser unit behavior ----------------------------------------------------

def test_parse_roundtrip_fields(tmp_path):
    vocab = _train_vocab(["<unk>", "<s>", "</s>"])
    data = _build_proto(vocab, controls=("<s>", "</s>"), unk_id=0,
                        normalizer_name="nmt_nfkc", charsmap=b"\x01\x02")
    m = parse_model(data)
    assert [(p.piece, p.score) for p in m.pieces] == [
        (p, pytest.approx(s)) for p, s in vocab]
    assert m.pieces[0].type == PIECE_UNKNOWN
    assert m.pieces[1].type == PIECE_CONTROL
    assert m.model_type == MODEL_UNIGRAM
    assert m.unk_id == 0 and m.pad_id == -1  # negative varint decodes
    assert m.normalizer_name == "nmt_nfkc"
    assert m.precompiled_charsmap == b"\x01\x02"
    assert m.add_dummy_prefix and m.remove_extra_whitespaces


def test_parse_skips_unknown_fields():
    vocab = [("<unk>", 0.0), ("▁a", -1.5)]
    data = _build_proto(vocab)
    # append an unknown length-delimited field (tag 99) and an unknown
    # varint field (tag 100): proto2 readers must skip both
    def enc(v: int) -> bytes:
        out = bytearray()
        while True:
            out.append(v & 0x7F | (0x80 if v > 0x7F else 0))
            v >>= 7
            if not v:
                return bytes(out)

    data += enc(99 << 3 | 2) + enc(4) + b"junk" + enc(100 << 3 | 0) + enc(7)
    m = parse_model(data)
    assert len(m.pieces) == 2


def test_parse_truncated_raises():
    data = _build_proto([("<unk>", 0.0), ("▁a", -1.5)])
    with pytest.raises(ValueError):
        parse_model(data[:-3])
    with pytest.raises(ValueError):
        parse_model(b"")


def test_bpe_model_type_rejected(tmp_path):
    data = _build_proto([("<unk>", 0.0), ("▁a", -1.5)],
                        model_type=MODEL_BPE)
    p = tmp_path / "spiece.model"
    p.write_bytes(data)
    with pytest.raises(ValueError, match="not Unigram"):
        UnigramTokenizer.from_sentencepiece_model(p)


# -- tokenization conformance ------------------------------------------------

@pytest.fixture(scope="module")
def sp_vocab():
    # sentencepiece layout: <unk>=0, <s>=1, </s>=2, then pieces
    return _train_vocab(["<unk>", "<s>", "</s>"])


def test_plain_sentencepiece_conformance(tmp_path, sp_vocab):
    path = tmp_path / "spiece.model"
    path.write_bytes(_build_proto(sp_vocab, controls=("<s>", "</s>"),
                                  unk_id=0))
    ours = UnigramTokenizer.from_sentencepiece_model(path)
    assert ours.unk_id_model == 0
    assert ours.prepend_scheme == "always"
    assert "collapse_spaces" in ours.normalizer
    oracle = _rust_pipeline(sp_vocab, unk_id=0)
    for p in [s.lower() for s in PROMPTS] + ACCENT_PROMPTS:
        assert oracle.encode(p).ids == ours.tokenize_to_ids(p), repr(p)


def test_xlm_roberta_fairseq_remap(tmp_path, sp_vocab):
    path = tmp_path / "sentencepiece.bpe.model"
    path.write_bytes(_build_proto(sp_vocab, controls=("<s>", "</s>"),
                                  unk_id=0))
    ours = UnigramTokenizer.from_sentencepiece_model(path,
                                                     style="xlm-roberta")
    # HF vocab layout: <s> <pad> </s> <unk> + pieces[3:] + <mask>
    assert (ours.cls_id, ours.pad_id, ours.sep_id, ours.unk_id) == (0, 1, 2, 3)
    assert ours.mask_id == len(ours.pieces) - 1
    assert ours.pieces[4] == sp_vocab[3][0]  # sp id 3 -> hf id 4
    hf_vocab = ([("<s>", 0.0), ("<pad>", 0.0), ("</s>", 0.0),
                 ("<unk>", 0.0)] + sp_vocab[3:] + [("<mask>", 0.0)])
    oracle = _rust_pipeline(hf_vocab, unk_id=3)
    for p in [s.lower() for s in PROMPTS] + ACCENT_PROMPTS:
        assert oracle.encode(p).ids == ours.tokenize_to_ids(p), repr(p)


def test_albert_style_casing(tmp_path):
    # ALBERT layout: <pad>=0, <unk>=1, [CLS]=2, [SEP]=3, [MASK]=4
    vocab = _train_vocab(["<pad>", "<unk>", "[CLS]", "[SEP]", "[MASK]"])
    path = tmp_path / "spiece.model"
    path.write_bytes(_build_proto(
        vocab, controls=("<pad>", "[CLS]", "[SEP]", "[MASK]"), unk_id=1))
    ours = UnigramTokenizer.from_sentencepiece_model(
        path, style="albert", do_lower_case=True, keep_accents=False)
    assert (ours.pad_id, ours.unk_id, ours.cls_id, ours.sep_id,
            ours.mask_id) == (0, 1, 2, 3, 4)
    from tokenizers import normalizers
    oracle = _rust_pipeline(
        vocab, unk_id=1,
        extra_normalizers=[normalizers.Replace("``", '"'),
                           normalizers.Replace("''", '"'),
                           normalizers.NFKD(), normalizers.StripAccents(),
                           normalizers.Lowercase()])
    for p in PROMPTS + ACCENT_PROMPTS:
        assert oracle.encode(p).ids == ours.tokenize_to_ids(p), repr(p)


def test_dir_dispatch_and_styles(tmp_path, sp_vocab):
    """tokenizer_from_dir picks the spm file up and infers the style
    from config.json / tokenizer_config.json."""
    from embeddings_tpu.tokenizer import tokenizer_from_dir
    d = tmp_path / "xlmr"
    d.mkdir()
    (d / "sentencepiece.bpe.model").write_bytes(
        _build_proto(sp_vocab, controls=("<s>", "</s>"), unk_id=0))
    (d / "config.json").write_text(json.dumps(
        {"model_type": "xlm-roberta"}))
    tok = tokenizer_from_dir(d)
    assert isinstance(tok, UnigramTokenizer)
    assert tok.unk_id == 3  # fairseq remap applied

    d2 = tmp_path / "albert"
    d2.mkdir()
    vocab = _train_vocab(["<pad>", "<unk>", "[CLS]", "[SEP]", "[MASK]"])
    (d2 / "spiece.model").write_bytes(_build_proto(
        vocab, controls=("<pad>", "[CLS]", "[SEP]", "[MASK]"), unk_id=1))
    (d2 / "config.json").write_text(json.dumps({"model_type": "albert"}))
    tok2 = tokenizer_from_dir(d2)
    assert "lowercase" in tok2.normalizer  # albert defaults applied
    assert "strip_accents" in tok2.normalizer
    assert tok2.cls_id == 2 and tok2.sep_id == 3

    # tokenizer.json still wins when both are present
    d3 = tmp_path / "both"
    d3.mkdir()
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers
    rust = Tokenizer(models.Unigram(sp_vocab, unk_id=0, byte_fallback=False))
    rust.normalizer = normalizers.NFKC()
    rust.pre_tokenizer = pre_tokenizers.Metaspace()
    rust.save(str(d3 / "tokenizer.json"))
    (d3 / "spiece.model").write_bytes(b"garbage that must not be read")
    tok3 = tokenizer_from_dir(d3)
    assert tok3.normalizer == "nfkc"  # no collapse op -> came from json


def test_charsmap_warns(tmp_path, sp_vocab, caplog):
    path = tmp_path / "spiece.model"
    path.write_bytes(_build_proto(sp_vocab, unk_id=0,
                                  normalizer_name="nmt_nfkc",
                                  charsmap=b"\x00" * 16))
    import logging
    with caplog.at_level(logging.WARNING, "embeddings_tpu.tokenizer"):
        UnigramTokenizer.from_sentencepiece_model(path)
    assert any("charsmap" in r.message for r in caplog.records)
