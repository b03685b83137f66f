"""run_cls_local.py: the no-mteb classification evaluator (MTEB
logistic-probe protocol) driven end-to-end, plus the committed
locally-TRAINED tiny checkpoint (benchmarks/fixtures/tiny_trained) —
the round-3 evidence that the quantization gates hold on weights shaped
by a real optimizer, not just random init."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent
FIXTURE = ROOT / "benchmarks" / "fixtures" / "tiny_trained"

needs_fixture = pytest.mark.skipif(
    not (FIXTURE / "model" / "model.safetensors").exists(),
    reason="tiny_trained fixture not generated (tools/train_tiny_bert.py)")


def test_load_rows(tmp_path):
    sys.path.insert(0, str(ROOT / "benchmarks"))
    from run_cls_local import load_rows
    p = tmp_path / "d.tsv"
    p.write_text("0\thello world\n2\ttab\tinside text\n\n1\tx\n")
    labels, texts = load_rows(p)
    assert labels == ["0", "2", "1"]
    assert texts[1] == "tab\tinside text"  # only the FIRST tab splits


def test_probe_protocol_learns_separable_data():
    sys.path.insert(0, str(ROOT / "benchmarks"))
    from run_cls_local import probe_accuracy
    rng = np.random.default_rng(0)
    mu = np.eye(3) * 4
    x = np.concatenate([rng.normal(mu[i], 1.0, (50, 3)) for i in range(3)])
    y = [str(i) for i in range(3) for _ in range(50)]
    acc = probe_accuracy(x[::2], y[::2], x[1::2], y[1::2])
    assert acc > 0.9


@needs_fixture
def test_trained_fixture_cls_gate_q4_0():
    """End-to-end on the locally-trained checkpoint: the probe beats
    chance by a wide margin (the model really learned topics) and q4_0
    stays within the reference-style accuracy budget of f32."""
    sys.path.insert(0, str(ROOT / "benchmarks"))
    from run_cls_local import evaluate_mode, load_rows
    train = load_rows(FIXTURE / "cls-train.tsv")
    test = load_rows(FIXTURE / "cls-test.tsv")
    # subset for speed: probe on 240 train / 120 test rows
    train = (train[0][:240], train[1][:240])
    test = (test[0][:120], test[1][:120])
    r32 = evaluate_mode(str(FIXTURE / "model"), "f32", train, test, 32)
    r4 = evaluate_mode(str(FIXTURE / "model"), "q4_0", train, test, 32)
    assert r32["accuracy"] > 0.5      # 12 classes -> chance is ~0.083
    assert r32["accuracy"] - r4["accuracy"] <= 0.05, (r32, r4)


@needs_fixture
def test_trained_fixture_sts_gate_subset():
    """The STS ΔSpearman gate on the trained checkpoint (400-pair subset
    for speed; the full 1200-pair artifact is committed under
    benchmarks/results)."""
    sys.path.insert(0, str(ROOT / "benchmarks"))
    from run_stsb_local import evaluate_mode, load_pairs
    s1, s2, gold = load_pairs(FIXTURE / "sts-test.tsv")
    s1, s2, gold = s1[:400], s2[:400], gold[:400]
    r32 = evaluate_mode(str(FIXTURE / "model"), "f32", s1, s2, gold, 32)
    r4 = evaluate_mode(str(FIXTURE / "model"), "q4_0", s1, s2, gold, 32)
    assert r32["spearman"] > 0.85     # trained, not random: real signal
    assert abs(r32["spearman"] - r4["spearman"]) <= 0.01, (r32, r4)


def test_cli_end_to_end(tmp_path):
    """Drive the script as a subprocess on a tiny random model: result
    layout + exit code."""
    from embeddings_tpu.config import BertConfig
    from embeddings_tpu.models import params as P
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "alpha", "beta", "gamma", "delta", "hello", "world"]
    d = tmp_path / "model"
    d.mkdir()
    (d / "vocab.txt").write_text("\n".join(vocab))
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128, max_position_embeddings=64)
    P.save_native(str(d / "tiny.npz"), P.init_params(cfg, rng=0), cfg)
    rows = [(0, "alpha alpha beta"), (1, "gamma delta gamma"),
            (0, "alpha beta alpha alpha"), (1, "delta gamma delta")] * 6
    for name in ("train.tsv", "test.tsv"):
        (tmp_path / name).write_text(
            "\n".join(f"{l}\t{t}" for l, t in rows) + "\n")
    out = tmp_path / "results"
    # conftest exports JAX_PLATFORMS=cpu; the subprocess inherits it
    proc = subprocess.run(
        [sys.executable, str(ROOT / "benchmarks" / "run_cls_local.py"),
         "-m", str(d / "tiny.npz"), "--train", str(tmp_path / "train.tsv"),
         "--test", str(tmp_path / "test.tsv"), "--modes", "f32", "q8_0",
         "--task-name", "ToyClassification", "--out", str(out),
         "--budget", "0.5"],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    rj = json.loads((out / "tiny_f32" / "ToyClassification.json")
                    .read_text())
    assert rj["mteb_dataset_name"] == "ToyClassification"
    assert 0.0 <= rj["test"]["accuracy"] <= 1.0
