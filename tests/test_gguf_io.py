"""GGUF v3 container (models/gguf_io.py): spec-level layout checks,
write/read round trips for every dtype, and engine parity with the HF
checkpoint the file came from."""

import struct
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from embeddings_tpu.config import BertConfig
from embeddings_tpu.models import gguf_io, params as P
from embeddings_tpu.ops import quant as Q

FIXTURE = Path(__file__).resolve().parent / "fixtures" / "ref_parity"


@pytest.fixture(scope="module")
def cfg(small_vocab):
    return BertConfig(vocab_size=len(small_vocab), hidden_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      intermediate_size=128, max_position_embeddings=64)


@pytest.fixture(scope="module")
def params(cfg):
    return P.init_params(cfg, rng=0)


def test_q4_0_block_layout():
    """One block, known values: f16 d first, low nibbles = elems 0..15
    (the GGUF-era layout — the legacy .bin uses f32 d + adjacent pairs)."""
    a = np.zeros((1, 32), np.float32)
    a[0, 0] = -8.0   # absmax, signed -> d = 1.0
    a[0, 16] = 7.0
    buf = gguf_io.q4_0_to_bytes(a)
    assert len(buf) == 18
    (d,) = struct.unpack("<e", buf[:2])
    assert d == 1.0
    qs = np.frombuffer(buf[2:], np.uint8)
    assert qs[0] & 0x0F == 0          # elem 0: code -8 -> stored 0 (low)
    assert qs[0] >> 4 == 15           # elem 16: code +7 -> stored 15 (high)
    codes, scales = gguf_io.q4_0_from_bytes(buf, 1, 32)
    assert codes[0, 0] == -8 and codes[0, 16] == 7
    assert scales[0, 0] == 1.0


@pytest.mark.parametrize("codec,decode", [
    (gguf_io.q4_0_to_bytes, gguf_io.q4_0_from_bytes),
    (gguf_io.q8_0_to_bytes, gguf_io.q8_0_from_bytes),
])
def test_block_codec_roundtrip_quality(codec, decode, rng):
    a = rng.standard_normal((8, 96)).astype(np.float32)
    buf = codec(a)
    out = decode(buf, 8, 96)
    codes, d = out[0], out[1]
    deq = (codes.reshape(8, 3, 32).astype(np.float32)
           * d.reshape(8, 3, 1)).reshape(8, 96)
    cos = (deq * a).sum() / (np.linalg.norm(deq) * np.linalg.norm(a))
    assert cos > 0.98


def test_write_read_roundtrip_f32(tmp_path, params, cfg, small_vocab):
    path = tmp_path / "m.gguf"
    gguf_io.write_gguf(path, params, cfg, small_vocab, dtype="f32")
    sd, rcfg, meta = gguf_io.read_gguf(path)
    ref = P.to_hf_state_dict(params)
    assert set(sd) == {k for k in ref if gguf_io.hf_to_gguf_name(k)}
    for name, arr in sd.items():
        np.testing.assert_array_equal(arr, ref[name], err_msg=name)
    assert rcfg.hidden_size == cfg.hidden_size
    assert rcfg.num_hidden_layers == cfg.num_hidden_layers
    assert rcfg.num_attention_heads == cfg.num_attention_heads
    assert rcfg.intermediate_size == cfg.intermediate_size
    assert meta["tokenizer.ggml.tokens"] == small_vocab
    assert meta["general.architecture"] == "bert"


def test_write_read_roundtrip_f16(tmp_path, params, cfg, small_vocab):
    path = tmp_path / "m.gguf"
    gguf_io.write_gguf(path, params, cfg, small_vocab, dtype="f16")
    sd, _, _ = gguf_io.read_gguf(path)
    ref = P.to_hf_state_dict(params)
    for name, arr in sd.items():
        expect = ref[name]
        if expect.ndim == 2 and name.endswith(".weight"):
            expect = expect.astype(np.float16).astype(np.float32)
        np.testing.assert_array_equal(arr, expect, err_msg=name)


@pytest.mark.parametrize("dtype", ["q4_0", "q4_1", "q8_0"])
def test_write_read_quantized(tmp_path, params, cfg, small_vocab, dtype):
    path = tmp_path / "m.gguf"
    gguf_io.write_gguf(path, params, cfg, small_vocab, dtype=dtype)
    sd, _, _ = gguf_io.read_gguf(path)
    ref = P.to_hf_state_dict(params)
    for name, v in sd.items():
        expect = ref[name]
        if isinstance(v, Q.QuantizedTensor):
            assert v.kind == dtype, name
            deq = np.asarray(Q.dequantize(v)).T  # back to HF [out, in]
            cos = (deq * expect).sum() / (
                np.linalg.norm(deq) * np.linalg.norm(expect))
            assert cos > 0.98, (name, cos)
        else:
            np.testing.assert_array_equal(v, expect, err_msg=name)


def test_tensor_offsets_aligned(tmp_path, params, cfg, small_vocab):
    path = tmp_path / "m.gguf"
    gguf_io.write_gguf(path, params, cfg, small_vocab, dtype="q4_0")
    with open(path, "rb") as f:
        magic, version, n_tensors, n_kv = struct.unpack("<IIQQ",
                                                        f.read(24))
        assert magic == gguf_io.MAGIC and version == 3
        for _ in range(n_kv):
            gguf_io._r_str(f)
            (vt,) = struct.unpack("<I", f.read(4))
            gguf_io._r_value(f, vt)
        for _ in range(n_tensors):
            gguf_io._r_str(f)
            (nd,) = struct.unpack("<I", f.read(4))
            f.read(8 * nd)
            _, offset = struct.unpack("<IQ", f.read(12))
            assert offset % gguf_io.ALIGNMENT == 0


@pytest.mark.parametrize("dtype", ["f32", "q4_0", "q4_1", "q8_0"])
def test_engine_from_gguf_matches_source(tmp_path, params, cfg,
                                         small_vocab, dtype):
    """load_model(.gguf, dtype=...) reproduces the source engine's
    embeddings — INCLUDING the dtype-matched load path where q4 codes
    get nibble-packed (a q4_1 centering bug once survived the dequant-
    only round-trip test and corrupted exactly this path)."""
    from embeddings_tpu.config import EngineConfig
    from embeddings_tpu.runtime.engine import Engine, load_model
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    path = tmp_path / "m.gguf"
    gguf_io.write_gguf(path, params, cfg, small_vocab, dtype=dtype)
    ec = EngineConfig(seq_buckets=(16, 32), max_seq_len=32, batch_size=4,
                      batch_buckets=(1, 2, 4))
    eng = load_model(path, engine_config=ec,
                     dtype="f32" if dtype == "f32" else dtype)
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    src = Engine(params, cfg, tok, ec)
    texts = ["hello world", "the quick brown fox", "你好世界"]
    a = eng.encode_batch(texts)
    b = src.encode_batch(texts)
    if dtype == "f32":
        np.testing.assert_allclose(a, b, atol=2e-5)
    else:
        cos = (a * b).sum(-1)
        assert cos.min() > 0.98, (dtype, cos)


def test_gguf_from_reference_checkpoint(tmp_path):
    """HF checkpoint -> GGUF -> engine matches the HF-dir engine (uses
    the committed ref_parity fixture)."""
    if not (FIXTURE / "model.safetensors").exists():
        pytest.skip("ref_parity fixture not generated")
    from embeddings_tpu.runtime.engine import load_model
    params, config = P.load_hf_dir(FIXTURE)
    vocab = (FIXTURE / "vocab.txt").read_text(
        encoding="utf-8").splitlines()
    path = tmp_path / "ref.gguf"
    gguf_io.write_gguf(path, params, config, vocab, dtype="f32")
    e_hf = load_model(FIXTURE)
    e_gguf = load_model(path)
    texts = ["hello world", "the quick brown fox"]
    np.testing.assert_allclose(e_gguf.encode(texts), e_hf.encode(texts),
                               atol=2e-5)


def test_malformed_files_fail_cleanly(tmp_path, params, cfg, small_vocab):
    """Corrupt/truncated GGUF input raises a clear exception (never hangs
    or returns garbage): bad magic, bad version, truncation at several
    depths, unsupported tensor type, wrong architecture."""
    good = tmp_path / "good.gguf"
    gguf_io.write_gguf(good, params, cfg, small_vocab, dtype="q4_0")
    blob = good.read_bytes()

    def expect_failure(data: bytes, name: str):
        p = tmp_path / name
        p.write_bytes(data)
        with pytest.raises((ValueError, EOFError, struct.error, KeyError,
                            UnicodeDecodeError, MemoryError, OSError)):
            gguf_io.read_gguf(p)

    expect_failure(b"NOPE" + blob[4:], "magic.gguf")
    expect_failure(blob[:4] + struct.pack("<I", 99) + blob[8:], "ver.gguf")
    for cut in (10, 30, 200, len(blob) // 2):
        expect_failure(blob[:cut], f"trunc{cut}.gguf")
    # unsupported tensor type (Q2_K is deliberately not implemented)
    p = tmp_path / "ktype.gguf"
    with open(p, "wb") as f:
        f.write(struct.pack("<IIQQ", gguf_io.MAGIC, 3, 1, 1))
        gguf_io._w_str(f, "general.architecture")
        f.write(struct.pack("<I", gguf_io.T_STRING))
        gguf_io._w_str(f, "bert")
        gguf_io._w_str(f, "token_embd.weight")
        f.write(struct.pack("<I", 2))
        f.write(struct.pack("<QQ", 64, 64))
        f.write(struct.pack("<IQ", 10, 0))  # GGML_TYPE_Q2_K
        f.write(b"\x00" * 64)
    with pytest.raises(ValueError, match="unsupported ggml tensor type"):
        gguf_io.read_gguf(p)
    # truncated K-quant data fails cleanly, not garbage
    p = tmp_path / "ktrunc.gguf"
    with open(p, "wb") as f:
        f.write(struct.pack("<IIQQ", gguf_io.MAGIC, 3, 1, 1))
        gguf_io._w_str(f, "general.architecture")
        f.write(struct.pack("<I", gguf_io.T_STRING))
        gguf_io._w_str(f, "bert")
        gguf_io._w_str(f, "token_embd.weight")
        f.write(struct.pack("<I", 2))
        f.write(struct.pack("<QQ", 256, 4))
        f.write(struct.pack("<IQ", 12, 0))  # GGML_TYPE_Q4_K, data missing
        f.write(b"\x00" * 64)
    with pytest.raises((ValueError, EOFError)):
        gguf_io.read_gguf(p)
    # wrong architecture refuses with a clear message (nomic-bert /
    # jina-bert-v2 are supported arches now — use a genuinely foreign one)
    def arch_only(name: str, arch: str):
        p2 = tmp_path / name
        with open(p2, "wb") as f:
            f.write(struct.pack("<IIQQ", gguf_io.MAGIC, 3, 0, 1))
            gguf_io._w_str(f, "general.architecture")
            f.write(struct.pack("<I", gguf_io.T_STRING))
            gguf_io._w_str(f, arch)
        return p2

    with pytest.raises(ValueError, match="unsupported GGUF architecture"):
        gguf_io.read_gguf(arch_only("arch.gguf", "llama"))
    # a supported arch with its hparams missing fails cleanly too
    with pytest.raises(ValueError, match="missing required"):
        gguf_io.read_gguf(arch_only("arch2.gguf", "nomic-bert"))


def test_cli_convert_to_gguf(tmp_path, params, cfg, small_vocab):
    from embeddings_tpu.models import params as P2
    src = tmp_path / "hf"
    src.mkdir()
    import json
    (src / "config.json").write_text(json.dumps(dict(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        model_type="bert")))
    (src / "vocab.txt").write_text("\n".join(small_vocab))
    from safetensors.numpy import save_file
    save_file(P2.to_hf_state_dict(params), str(src / "model.safetensors"))
    out = tmp_path / "out.gguf"
    r = subprocess.run(
        [sys.executable, "-m", "embeddings_tpu.cli", "convert",
         str(src), str(out), "--dtype", "q8_0"],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": str(Path(__file__).resolve().parent.parent),
             "HOME": "/root"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
    sd, rcfg, meta = gguf_io.read_gguf(out)
    assert meta["general.architecture"] == "bert"
    assert rcfg.hidden_size == cfg.hidden_size


def _ref_q4_0(a: np.ndarray) -> bytes:
    """Scalar transcription of llama.cpp quantize_row_q4_0_ref semantics
    (codes from the FULL-precision scale; d stored f16)."""
    R, K = a.shape
    out = bytearray()
    for r in range(R):
        for b in range(K // 32):
            blk = a[r, b * 32:(b + 1) * 32].astype(np.float32)
            amax, maxv = 0.0, 0.0
            for v in blk:
                if abs(v) > amax:
                    amax, maxv = abs(v), v
            d = maxv / -8.0
            inv = 1.0 / d if d else 0.0
            out += np.float16(d).tobytes()
            qs = [min(15, int(np.float32(v * inv) + np.float32(8.5)))
                  for v in blk]
            for i in range(16):
                out.append(qs[i] | (qs[i + 16] << 4))
    return bytes(out)


def _ref_q4_1(a: np.ndarray) -> bytes:
    R, K = a.shape
    out = bytearray()
    for r in range(R):
        for b in range(K // 32):
            blk = a[r, b * 32:(b + 1) * 32].astype(np.float32)
            mn, mx = float(blk.min()), float(blk.max())
            d = (mx - mn) / 15.0
            inv = 1.0 / d if d else 0.0
            out += np.float16(d).tobytes() + np.float16(mn).tobytes()
            qs = [min(15, int(np.float32((v - mn) * inv)
                              + np.float32(0.5))) for v in blk]
            for i in range(16):
                out.append(qs[i] | (qs[i + 16] << 4))
    return bytes(out)


def test_q4_writer_bit_parity_with_llama_cpp_ref(rng):
    """Exported q4 blocks must be byte-identical to llama.cpp's reference
    quantizers (codes from the unrounded f32 scale, storage f16) so our
    files match llama.cpp-quantized artifacts bit-for-bit."""
    a = rng.standard_normal((4, 64)).astype(np.float32) * 3.0
    # adversarial block: a scale whose f16 rounding flips a code if the
    # rounded d is (wrongly) used for the codes
    a[0, :32] = np.linspace(-2.001, 2.003, 32, dtype=np.float32)
    assert gguf_io.q4_0_to_bytes(a) == _ref_q4_0(a)
    assert gguf_io.q4_1_to_bytes(a) == _ref_q4_1(a)


def test_quantization_version_and_pooling_metadata(tmp_path, params, cfg,
                                                   small_vocab):
    import dataclasses
    ccfg = dataclasses.replace(cfg, pooling="cls")
    qpath, fpath = tmp_path / "q.gguf", tmp_path / "f.gguf"
    gguf_io.write_gguf(qpath, params, ccfg, small_vocab, dtype="q4_0")
    gguf_io.write_gguf(fpath, params, ccfg, small_vocab, dtype="f16")
    _, qcfg, qmeta = gguf_io.read_gguf(qpath)
    _, _, fmeta = gguf_io.read_gguf(fpath)
    assert qmeta["general.quantization_version"] == 2
    assert "general.quantization_version" not in fmeta
    # pooling round-trips through bert.pooling_type (llama.cpp enum)
    assert qmeta["bert.pooling_type"] == 2
    assert qcfg.pooling == "cls"


def test_pooling_type_mean_roundtrip(tmp_path, params, cfg, small_vocab):
    path = tmp_path / "mean.gguf"
    gguf_io.write_gguf(path, params, cfg, small_vocab, dtype="f32")
    _, rcfg, meta = gguf_io.read_gguf(path)
    assert meta["bert.pooling_type"] == 1
    assert rcfg.pooling == "mean"


# ---------------------------------------------------------------------------
# K-quants (q4_K / q5_K / q6_K)
# ---------------------------------------------------------------------------

def test_scale_min_k4_pack_unpack_inverse(rng):
    sc = rng.integers(0, 64, size=(50, 8)).astype(np.uint8)
    mn = rng.integers(0, 64, size=(50, 8)).astype(np.uint8)
    s = gguf_io._pack_scale_min_k4(sc, mn)
    sc2, mn2 = gguf_io._unpack_scale_min_k4(s)
    np.testing.assert_array_equal(sc, sc2)
    np.testing.assert_array_equal(mn, mn2)


@pytest.mark.parametrize("enc,dec,min_cos", [
    # weight-level cosine bars: a 4-bit code at 32-element blocks has an
    # intrinsic quantization-noise floor of ~0.10sigma on Gaussian data
    # (step/sqrt(12)), i.e. cos ~0.995 is the physics ceiling for ANY
    # q4 codec here — 0.997 asserts we're near it (and beats our own
    # q4_0 on the same data, below). Embedding-level cosine at real
    # model width is >= 0.999 (benchmarks/results/kquant_quality.json).
    (gguf_io.q4_K_to_bytes, gguf_io.q4_K_from_bytes, 0.997),
    (gguf_io.q5_K_to_bytes, gguf_io.q5_K_from_bytes, 0.999),
    (gguf_io.q6_K_to_bytes, gguf_io.q6_K_from_bytes, 0.9995),
])
def test_kquant_codec_roundtrip(enc, dec, min_cos):
    # dedicated deterministic rng: these thresholds sit close to the
    # 4-bit noise floor, and the shared session rng's stream position
    # depends on test order (an unlucky draw fails the per-row bar)
    a = np.random.default_rng(7).standard_normal((6, 512)).astype(np.float32)
    a[0, 7] = 11.0     # group outlier: absmax-scale stress
    a[3, 300] = -9.0
    deq = dec(enc(a), 6, 512)
    assert deq.shape == a.shape
    cos = (deq * a).sum() / (np.linalg.norm(deq) * np.linalg.norm(a))
    assert cos > min_cos, cos
    # per-row too (no row silently zeroed)
    rc = (deq * a).sum(1) / (np.linalg.norm(deq, axis=1)
                             * np.linalg.norm(a, axis=1))
    assert rc.min() > min_cos - 0.002, rc


def test_q4_K_beats_q4_0_on_same_data(rng):
    """q4_K (min+scale per 32, 6-bit super-scales) must reconstruct
    strictly better than plain absmax q4_0 — the reason the format
    exists. Guards against a subtly-wrong scale path that still passes a
    loose cosine bar."""
    a = rng.standard_normal((8, 1024)).astype(np.float32)
    dk = gguf_io.q4_K_from_bytes(gguf_io.q4_K_to_bytes(a), 8, 1024)
    codes, d = gguf_io.q4_0_from_bytes(gguf_io.q4_0_to_bytes(a), 8, 1024)
    d0 = (codes.reshape(8, 32, 32).astype(np.float32)
          * d.reshape(8, 32, 1)).reshape(8, 1024)
    err_k = float(((dk - a) ** 2).mean())
    err_0 = float(((d0 - a) ** 2).mean())
    assert err_k < err_0, (err_k, err_0)


def test_q4_K_known_block_layout():
    """Pin the llama.cpp super-block layout: x = d*sc*q - dmin*m, qs
    chunk j holds values 64j..64j+31 in LOW nibbles (scale 2j) and
    64j+32..64j+63 in HIGH nibbles (scale 2j+1)."""
    rec = np.zeros(1, dtype=gguf_io._Q4K_REC)
    rec["d"] = 2.0
    rec["dmin"] = 1.0
    # scales: sc[0]=3, sc[1]=5, mn[0]=1, mn[1]=0, rest 0
    sc = np.zeros((1, 8), np.uint8); mn = np.zeros((1, 8), np.uint8)
    sc[0, 0], sc[0, 1], mn[0, 0] = 3, 5, 1
    rec["scales"] = gguf_io._pack_scale_min_k4(sc, mn)
    qs = np.zeros((1, 128), np.uint8)
    qs[0, 0] = 0x4F   # value 0 -> low nibble 15; value 32 -> high nibble 4
    rec["qs"] = qs
    out = gguf_io.q4_K_from_bytes(rec.tobytes(), 1, 256)
    assert out[0, 0] == 2.0 * 3 * 15 - 1.0 * 1      # d*sc0*q - dmin*mn0
    assert out[0, 32] == 2.0 * 5 * 4                 # high nibble, sc1
    assert out[0, 1] == -1.0                         # q=0 -> -dmin*mn0


def test_q6_K_known_block_layout():
    rec = np.zeros(1, dtype=gguf_io._Q6K_REC)
    rec["d"] = 0.5
    scales = np.zeros((1, 16), np.int8)
    scales[0, 0], scales[0, 2] = 4, -3
    rec["scales"] = scales
    ql = np.zeros((1, 128), np.uint8)
    qh = np.zeros((1, 64), np.uint8)
    ql[0, 0] = 0x0F          # value 0 low 4 bits = 15
    qh[0, 0] = 0b00000001    # value 0 bits 4..5 = 01 -> q = 31-32... 
    ql[0, 32] = 0x07         # value 32 low bits (chunk q2)
    rec["ql"], rec["qh"] = ql, qh
    out = gguf_io.q6_K_from_bytes(rec.tobytes(), 1, 256)
    # value 0: q = (15 | 1<<4) - 32 = -1, scale[0]=4 -> 0.5*4*-1
    assert out[0, 0] == 0.5 * 4 * -1
    # value 32: q = 7 - 32 = -25, scale[2]=-3 -> 0.5*-3*-25
    assert out[0, 32] == 0.5 * -3 * -25


@pytest.mark.parametrize("kdtype,min_cos", [
    # embedding-level cosine vs the f32 source on a deliberately TINY
    # (hidden=256) model — small width amplifies per-weight quant noise;
    # at bge-base width the same pipeline measures >= 0.999
    # (benchmarks/results/kquant_quality.json)
    ("q4_K", 0.995), ("q5_K", 0.998), ("q6_K", 0.999)])
def test_kquant_gguf_loads_into_engine(tmp_path, small_vocab, kdtype,
                                       min_cos):
    """A K-quant GGUF loads through load_gguf_model and reproduces its
    f32 source's embeddings, and the decode is EXACT against the
    container contents (engine output == engine built directly on the
    dequantized weights)."""
    from embeddings_tpu.config import EngineConfig
    from embeddings_tpu.runtime.engine import Engine, load_model
    from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
    from embeddings_tpu.models.ggml_io import build_params_from_sd
    # hidden must divide the 256-element super-block
    kcfg = BertConfig(vocab_size=len(small_vocab), hidden_size=256,
                      num_hidden_layers=2, num_attention_heads=4,
                      intermediate_size=512, max_position_embeddings=64)
    kparams = P.init_params(kcfg, rng=0)
    path = tmp_path / f"m-{kdtype}.gguf"
    gguf_io.write_gguf(path, kparams, kcfg, small_vocab, dtype=kdtype)
    sd, rcfg, meta = gguf_io.read_gguf(path)
    assert meta["general.quantization_version"] == 2
    eng = load_model(path)
    tok = WordPieceTokenizer(WordPieceVocab.from_tokens(small_vocab))
    ec = EngineConfig(batch_size=4)
    texts = ["hello world", "the quick brown fox", "hello hello"]
    a = eng.encode_batch(texts)
    # exactness: same result as an engine on the dequantized state dict
    deq_eng = Engine(build_params_from_sd(sd, rcfg), rcfg, tok, ec)
    np.testing.assert_allclose(a, deq_eng.encode_batch(texts), atol=2e-5)
    # quality vs the f32 source
    ref = Engine(kparams, kcfg, tok, ec)
    cos = (a * ref.encode_batch(texts)).sum(1)
    assert cos.min() > min_cos, (kdtype, cos)


def test_kquant_gguf_requantizes_on_load(tmp_path, small_vocab):
    """dtype=q4_0 on a K-quant file re-quantizes the dense-decoded
    weights onto the engine's packed Q4_0 kernels."""
    from embeddings_tpu.ops.quant import QuantizedTensor
    from embeddings_tpu.runtime.engine import load_model
    kcfg = BertConfig(vocab_size=len(small_vocab), hidden_size=256,
                      num_hidden_layers=2, num_attention_heads=4,
                      intermediate_size=512, max_position_embeddings=64)
    kparams = P.init_params(kcfg, rng=0)
    path = tmp_path / "m.gguf"
    gguf_io.write_gguf(path, kparams, kcfg, small_vocab, dtype="q6_K")
    eng = load_model(path, dtype="q4_0")
    w = eng.params["layers"]["mlp"]["up"]["w"]
    assert isinstance(w, QuantizedTensor) and w.kind == "q4_0"
    emb = eng.encode("hello world")
    assert np.isfinite(emb).all()


def test_cli_convert_to_kquant_gguf(tmp_path, small_vocab):
    """cli convert exports q4_K GGUF (and refuses K-quants for .npz with
    a clear message — they are GGUF block formats, not engine kernels)."""
    from embeddings_tpu.config import BertConfig
    from embeddings_tpu.models import params as P2
    from embeddings_tpu.runtime.engine import load_model
    kcfg = BertConfig(vocab_size=len(small_vocab), hidden_size=256,
                      num_hidden_layers=2, num_attention_heads=4,
                      intermediate_size=512, max_position_embeddings=64)
    import json as j
    from safetensors.numpy import save_file
    d = tmp_path / "src"
    d.mkdir()
    (d / "vocab.txt").write_text("\n".join(small_vocab))
    (d / "config.json").write_text(j.dumps({
        "model_type": "bert", "vocab_size": kcfg.vocab_size,
        "hidden_size": kcfg.hidden_size,
        "num_hidden_layers": kcfg.num_hidden_layers,
        "num_attention_heads": kcfg.num_attention_heads,
        "intermediate_size": kcfg.intermediate_size,
        "max_position_embeddings": kcfg.max_position_embeddings}))
    sd = P2.to_hf_state_dict(P2.init_params(kcfg, rng=0))
    save_file({k: np.asarray(v, np.float32) for k, v in sd.items()},
              str(d / "model.safetensors"))
    out = tmp_path / "m.gguf"
    proc = subprocess.run(
        [sys.executable, "-m", "embeddings_tpu.cli", "convert",
         str(d), str(out), "--dtype", "q4_K"],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    eng = load_model(out)
    emb = eng.encode("hello world")
    assert np.isfinite(emb).all()
    bad = subprocess.run(
        [sys.executable, "-m", "embeddings_tpu.cli", "convert",
         str(d), str(tmp_path / "m2.npz"), "--dtype", "q4_K"],
        capture_output=True, text=True, timeout=300)
    assert bad.returncode == 1 and "GGUF block format" in bad.stderr


# ---------------------------------------------------------------------------
# nomic-bert / jina-bert-v2 architecture reads
# ---------------------------------------------------------------------------

def _write_raw_gguf(path, arch, hparams, tensors, tokens):
    """Minimal GGUF v3 writer for arch fixtures: tensors is a list of
    (gguf_name, np.float32 array in HF orientation, ggml_type) — q4_0
    entries are encoded with the module's own codec."""
    kv = [("general.architecture", gguf_io.T_STRING, arch),
          ("general.alignment", gguf_io.T_U32, gguf_io.ALIGNMENT),
          ("tokenizer.ggml.model", gguf_io.T_STRING, "bert"),
          ("tokenizer.ggml.tokens", gguf_io.T_ARRAY,
           (gguf_io.T_STRING, list(tokens)))]
    for k, v in hparams.items():
        vt = gguf_io.T_F32 if isinstance(v, float) else gguf_io.T_U32
        kv.append((f"{arch}.{k}", vt, v))
    recs = []
    for name, arr, ttype in tensors:
        ne = tuple(int(x) for x in arr.shape[::-1])
        if ttype == gguf_io.GGML_F32:
            data = arr.astype(np.float32).tobytes()
        elif ttype == gguf_io.GGML_Q4_0:
            data = gguf_io.q4_0_to_bytes(arr.astype(np.float32))
        else:
            raise AssertionError(ttype)
        recs.append((name, ne, ttype, data))
    with open(path, "wb") as f:
        f.write(struct.pack("<IIQQ", gguf_io.MAGIC, gguf_io.VERSION,
                            len(recs), len(kv)))
        for key, vtype, v in kv:
            gguf_io._w_str(f, key)
            f.write(struct.pack("<I", vtype))
            gguf_io._w_value(f, vtype, v)
        off = 0
        for name, ne, ttype, data in recs:
            gguf_io._w_str(f, name)
            f.write(struct.pack("<I", len(ne)))
            f.write(struct.pack(f"<{len(ne)}Q", *ne))
            f.write(struct.pack("<IQ", ttype, off))
            off += len(data)
            off += (-off) % gguf_io.ALIGNMENT
        f.write(b"\x00" * ((-f.tell()) % gguf_io.ALIGNMENT))
        for _, _, _, data in recs:
            f.write(data)
            f.write(b"\x00" * ((-len(data)) % gguf_io.ALIGNMENT))


_ARCH_V, _ARCH_E, _ARCH_H, _ARCH_I, _ARCH_NL = 64, 64, 4, 96, 2


def _arch_weights(seed):
    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)
    return w


def test_nomic_bert_gguf_roundtrip(tmp_path, small_vocab):
    """nomic-bert arch: fused attn_qkv split on read, quantized ffn_gate,
    RoPE config from rope.freq_base; forward matches the same weights
    loaded through the HF path."""
    from embeddings_tpu.models import bert
    w = _arch_weights(0)
    V, E, I, NL = _ARCH_V, _ARCH_E, _ARCH_I, _ARCH_NL
    t = {"token_embd.weight": w(V, E),
         "token_types.weight": w(2, E),
         "token_embd_norm.weight": 1.0 + 0.1 * w(E),
         "token_embd_norm.bias": 0.1 * w(E)}
    for i in range(NL):
        t[f"blk.{i}.attn_qkv.weight"] = w(3 * E, E)
        t[f"blk.{i}.attn_qkv.bias"] = 0.1 * w(3 * E)
        t[f"blk.{i}.attn_output.weight"] = w(E, E)
        t[f"blk.{i}.attn_output.bias"] = 0.1 * w(E)
        t[f"blk.{i}.attn_output_norm.weight"] = 1.0 + 0.1 * w(E)
        t[f"blk.{i}.attn_output_norm.bias"] = 0.1 * w(E)
        t[f"blk.{i}.ffn_gate.weight"] = w(I, E)
        t[f"blk.{i}.ffn_up.weight"] = w(I, E)
        t[f"blk.{i}.ffn_down.weight"] = w(E, I)
        t[f"blk.{i}.layer_output_norm.weight"] = 1.0 + 0.1 * w(E)
        t[f"blk.{i}.layer_output_norm.bias"] = 0.1 * w(E)
    tensors = [(k, v, gguf_io.GGML_Q4_0 if ".ffn_gate." in k
                and k.endswith(".weight") else gguf_io.GGML_F32)
               for k, v in t.items()]
    path = tmp_path / "nomic.gguf"
    _write_raw_gguf(path, "nomic-bert",
                    dict(embedding_length=E, block_count=NL,
                         feed_forward_length=I, context_length=128,
                         vocab_size=V,
                         **{"attention.head_count": _ARCH_H,
                            "attention.layer_norm_epsilon": 1e-12,
                            "rope.freq_base": 1000.0}),
                    tensors, small_vocab[:V])
    from embeddings_tpu.models.gguf_io import load_gguf_model
    params, cfg, tok = load_gguf_model(path)
    assert cfg.position_embedding_type == "rotary"
    assert cfg.rotary_base == 1000.0 and cfg.gated_mlp
    assert "position" not in params["embeddings"]
    assert isinstance(params["layers"]["mlp"]["gate"]["w"],
                      Q.QuantizedTensor)

    # reference: the same weights through the HF nomic translation
    hf_sd = {"embeddings.word_embeddings.weight": t["token_embd.weight"],
             "embeddings.token_type_embeddings.weight":
                 t["token_types.weight"],
             "embeddings.LayerNorm.weight": t["token_embd_norm.weight"],
             "embeddings.LayerNorm.bias": t["token_embd_norm.bias"]}
    for i in range(NL):
        hf_sd[f"encoder.layers.{i}.attn.Wqkv.weight"] = \
            t[f"blk.{i}.attn_qkv.weight"]
        hf_sd[f"encoder.layers.{i}.attn.Wqkv.bias"] = \
            t[f"blk.{i}.attn_qkv.bias"]
        hf_sd[f"encoder.layers.{i}.attn.out_proj.weight"] = \
            t[f"blk.{i}.attn_output.weight"]
        hf_sd[f"encoder.layers.{i}.attn.out_proj.bias"] = \
            t[f"blk.{i}.attn_output.bias"]
        hf_sd[f"encoder.layers.{i}.norm1.weight"] = \
            t[f"blk.{i}.attn_output_norm.weight"]
        hf_sd[f"encoder.layers.{i}.norm1.bias"] = \
            t[f"blk.{i}.attn_output_norm.bias"]
        hf_sd[f"encoder.layers.{i}.mlp.fc11.weight"] = \
            t[f"blk.{i}.ffn_gate.weight"]
        hf_sd[f"encoder.layers.{i}.mlp.fc11.bias"] = \
            np.zeros(_ARCH_I, np.float32)
        hf_sd[f"encoder.layers.{i}.mlp.fc12.weight"] = \
            t[f"blk.{i}.ffn_up.weight"]
        hf_sd[f"encoder.layers.{i}.mlp.fc12.bias"] = \
            np.zeros(_ARCH_I, np.float32)
        hf_sd[f"encoder.layers.{i}.mlp.fc2.weight"] = \
            t[f"blk.{i}.ffn_down.weight"]
        hf_sd[f"encoder.layers.{i}.mlp.fc2.bias"] = \
            np.zeros(_ARCH_E, np.float32)  # no down bias in the fixture
        hf_sd[f"encoder.layers.{i}.norm2.weight"] = \
            t[f"blk.{i}.layer_output_norm.weight"]
        hf_sd[f"encoder.layers.{i}.norm2.bias"] = \
            t[f"blk.{i}.layer_output_norm.bias"]
    ref_params = P.from_hf_state_dict(hf_sd, cfg)
    from embeddings_tpu.models import bert as B
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, V, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    got = np.asarray(B.encode_tokens(params, cfg, ids, mask))
    ref = np.asarray(B.encode_tokens(ref_params, cfg, ids, mask))
    cos = (got * ref).sum(-1)
    assert cos.min() > 0.995, cos  # gate is q4_0 in the gguf fixture


def test_jina_bert_v2_gguf_loads(tmp_path, small_vocab):
    """jina-bert-v2 arch: ALiBi config + slopes derived, gated MLP,
    biasless gate/up; end-to-end through the Engine."""
    w = _arch_weights(2)
    V, E, I, NL = _ARCH_V, _ARCH_E, _ARCH_I, _ARCH_NL
    t = {"token_embd.weight": w(V, E),
         "token_types.weight": w(2, E),
         "token_embd_norm.weight": 1.0 + 0.1 * w(E),
         "token_embd_norm.bias": 0.1 * w(E)}
    for i in range(NL):
        for nm in ("attn_q", "attn_k", "attn_v", "attn_output"):
            t[f"blk.{i}.{nm}.weight"] = w(E, E)
            t[f"blk.{i}.{nm}.bias"] = 0.1 * w(E)
        t[f"blk.{i}.attn_output_norm.weight"] = 1.0 + 0.1 * w(E)
        t[f"blk.{i}.attn_output_norm.bias"] = 0.1 * w(E)
        t[f"blk.{i}.ffn_gate.weight"] = w(I, E)
        t[f"blk.{i}.ffn_up.weight"] = w(I, E)
        t[f"blk.{i}.ffn_down.weight"] = w(E, I)
        t[f"blk.{i}.ffn_down.bias"] = 0.1 * w(E)
        t[f"blk.{i}.layer_output_norm.weight"] = 1.0 + 0.1 * w(E)
        t[f"blk.{i}.layer_output_norm.bias"] = 0.1 * w(E)
    tensors = [(k, v, gguf_io.GGML_F32) for k, v in t.items()]
    path = tmp_path / "jina.gguf"
    _write_raw_gguf(path, "jina-bert-v2",
                    dict(embedding_length=E, block_count=NL,
                         feed_forward_length=I, context_length=128,
                         vocab_size=V,
                         **{"attention.head_count": _ARCH_H,
                            "attention.layer_norm_epsilon": 1e-12,
                            "pooling_type": 1}),
                    tensors, small_vocab[:V])
    from embeddings_tpu.runtime.engine import load_model
    eng = load_model(path)
    assert eng.config.position_embedding_type == "alibi"
    assert eng.config.gated_mlp
    assert "alibi_slopes" in eng.params
    emb = eng.encode_batch(["hello world", "water", "hello world"])
    assert np.allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)
    assert float((emb[0] * emb[2]).sum()) > 0.999999
    assert np.isfinite(emb).all()


def test_unknown_arch_refused(tmp_path, small_vocab):
    w = _arch_weights(3)
    path = tmp_path / "t5.gguf"
    _write_raw_gguf(path, "t5", dict(embedding_length=8, block_count=1,
                                     feed_forward_length=8),
                    [("token_embd.weight", w(8, 8), gguf_io.GGML_F32)],
                    small_vocab[:8])
    with pytest.raises(ValueError, match="architecture"):
        gguf_io.read_gguf(path)


def test_reranker_gguf_head_loads(tmp_path, small_vocab):
    """bert-arch GGUF with llama.cpp cls/cls.output head tensors
    (bge-reranker convention) loads into a rerank-capable Engine."""
    w = _arch_weights(7)
    V, E, I, NL = _ARCH_V, _ARCH_E, _ARCH_I, 1
    t = {"token_embd.weight": w(V, E),
         "token_types.weight": w(2, E),
         "position_embd.weight": w(64, E),
         "token_embd_norm.weight": 1.0 + 0.1 * w(E),
         "token_embd_norm.bias": 0.1 * w(E),
         "cls.weight": w(E, E), "cls.bias": 0.1 * w(E),
         "cls.output.weight": w(1, E), "cls.output.bias": 0.1 * w(1)}
    for i in range(NL):
        for nm in ("attn_q", "attn_k", "attn_v", "attn_output"):
            t[f"blk.{i}.{nm}.weight"] = w(E, E)
            t[f"blk.{i}.{nm}.bias"] = 0.1 * w(E)
        t[f"blk.{i}.attn_output_norm.weight"] = 1.0 + 0.1 * w(E)
        t[f"blk.{i}.attn_output_norm.bias"] = 0.1 * w(E)
        t[f"blk.{i}.ffn_up.weight"] = w(I, E)
        t[f"blk.{i}.ffn_up.bias"] = 0.1 * w(I)
        t[f"blk.{i}.ffn_down.weight"] = w(E, I)
        t[f"blk.{i}.ffn_down.bias"] = 0.1 * w(E)
        t[f"blk.{i}.layer_output_norm.weight"] = 1.0 + 0.1 * w(E)
        t[f"blk.{i}.layer_output_norm.bias"] = 0.1 * w(E)
    tensors = [(k, v, gguf_io.GGML_F32) for k, v in t.items()]
    path = tmp_path / "reranker.gguf"
    _write_raw_gguf(path, "bert",
                    dict(embedding_length=E, block_count=NL,
                         feed_forward_length=I, context_length=64,
                         vocab_size=V,
                         **{"attention.head_count": _ARCH_H,
                            "attention.layer_norm_epsilon": 1e-12}),
                    tensors, small_vocab[:V])
    from embeddings_tpu.runtime.engine import load_model
    eng = load_model(path)
    assert "cls_head" in eng.params
    assert "dense" in eng.params["cls_head"]
    scores = eng.rerank("hello world", ["hello world", "water", "fire"])
    assert scores.shape == (3,) and np.isfinite(scores).all()

    # head math == score_pairs on the same HF-named weights
    from embeddings_tpu.models import bert as B
    hf_sd = {gguf_io.gguf_to_hf_name(k): v for k, v in t.items()}
    ref_params = P.from_hf_state_dict(hf_sd, eng.config)
    ids, types = eng.tokenizer.encode_pair("hello world", "water")
    idsa = np.asarray([ids], np.int32)
    ref = np.asarray(B.score_pairs(
        ref_params, eng.config, jnp.asarray(idsa),
        jnp.ones_like(jnp.asarray(idsa)),
        jnp.asarray([types], np.int32)))[0]
    np.testing.assert_allclose(scores[1], ref, atol=1e-4)

    # a lone cls (no cls.output) must NOT build a half-head
    t2 = {k: v for k, v in t.items() if not k.startswith("cls.output")}
    path2 = tmp_path / "halfhead.gguf"
    _write_raw_gguf(path2, "bert",
                    dict(embedding_length=E, block_count=NL,
                         feed_forward_length=I, context_length=64,
                         vocab_size=V,
                         **{"attention.head_count": _ARCH_H}),
                    [(k, v, gguf_io.GGML_F32) for k, v in t2.items()],
                    small_vocab[:V])
    eng2 = load_model(path2)
    assert "cls_head" not in eng2.params


# ---------------------------------------------------------------------------
# tokenizer.ggml.model dispatch (llama.cpp writes "bert" for WordPiece
# files, "t5" for sentencepiece-Unigram vocabs — multilingual-e5 /
# bge-m3 / nomic-v2-moe — and "gpt2" for byte-level-BPE vocabs)
# ---------------------------------------------------------------------------

def test_gguf_tokenizer_unigram_dispatch():
    from embeddings_tpu.models.gguf_io import _tokenizer_from_gguf
    from embeddings_tpu.tokenizer.unigram import UnigramTokenizer

    pieces = ["<s>", "<pad>", "</s>", "<unk>", "▁hello", "▁world",
              "▁he", "llo", "wor", "ld", "▁", "h", "e", "l", "o",
              "w", "r", "d", "▁again"]
    scores = [0.0, 0.0, 0.0, 0.0, -2.0, -2.1, -3.0, -3.1, -3.2, -3.3,
              -1.0, -5.0, -5.0, -5.0, -5.0, -5.0, -5.0, -5.0, -2.5]
    meta = {"tokenizer.ggml.model": "t5",
            "tokenizer.ggml.tokens": pieces,
            "tokenizer.ggml.scores": scores,
            "tokenizer.ggml.unknown_token_id": 3}
    tok = _tokenizer_from_gguf(meta)
    ref = UnigramTokenizer(list(zip(pieces, scores)), unk_id=3)
    assert isinstance(tok, UnigramTokenizer)
    for text in ("hello world", "hello again", "held", "", "xyz"):
        assert tok.encode(text) == ref.encode(text), text


def test_gguf_tokenizer_gpt2_dispatch():
    from embeddings_tpu.models.gguf_io import _tokenizer_from_gguf
    from embeddings_tpu.tokenizer.bpe import ByteLevelBPETokenizer

    # byte-level alphabet + a few merges (ByteLevel maps ' '->'Ġ')
    base = ["<s>", "<pad>", "</s>", "<unk>"]
    alphabet = [chr(c) for c in range(33, 127)] + ["Ġ"]
    vocab_list = base + alphabet + ["he", "ll", "llo", "hello", "Ġw",
                                    "Ġwo", "Ġworld"]
    merges = ["h e", "l l", "ll o", "he llo", "Ġ w", "Ġw o"]
    meta = {"tokenizer.ggml.model": "gpt2",
            "tokenizer.ggml.tokens": vocab_list,
            "tokenizer.ggml.merges": merges,
            "tokenizer.ggml.pre": "gpt-2"}
    tok = _tokenizer_from_gguf(meta)
    ref = ByteLevelBPETokenizer({t: i for i, t in enumerate(vocab_list)},
                                [tuple(m.split(" ")) for m in merges])
    assert isinstance(tok, ByteLevelBPETokenizer)
    for text in ("hello world", "hello", "wow", ""):
        assert tok.encode(text) == ref.encode(text), text


def test_gguf_tokenizer_unknown_model_refused():
    import pytest as _pytest
    from embeddings_tpu.models.gguf_io import _tokenizer_from_gguf
    with _pytest.raises(ValueError, match="tokenizer.ggml.model"):
        _tokenizer_from_gguf({"tokenizer.ggml.model": "rwkv",
                              "tokenizer.ggml.tokens": ["a"]})


def test_gguf_tokenizer_unigram_with_charsmap():
    """A unigram GGUF carrying tokenizer.ggml.precompiled_charsmap (as
    the u8 array llama.cpp writes) applies the exact charsmap
    normalizer before segmentation."""
    from embeddings_tpu.models.gguf_io import _tokenizer_from_gguf
    from .test_charsmap import build_charsmap

    pieces = ["<s>", "<pad>", "</s>", "<unk>", "▁fi", "ne", "▁x"]
    scores = [0.0, 0.0, 0.0, 0.0, -1.0, -1.5, -2.0]
    blob = build_charsmap({"ﬁ": "fi"})
    meta = {"tokenizer.ggml.model": "t5",
            "tokenizer.ggml.tokens": pieces,
            "tokenizer.ggml.scores": scores,
            "tokenizer.ggml.unknown_token_id": 3,
            "tokenizer.ggml.precompiled_charsmap": list(blob)}
    tok = _tokenizer_from_gguf(meta)
    # the ligature folds via the charsmap, then segments normally
    assert tok.encode("ﬁne") == tok.encode("fine")
    assert tok.encode("fine")[1:-1] == [4, 5]  # ▁fi + ne
