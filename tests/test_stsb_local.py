"""run_stsb_local.py: the no-mteb STSBenchmark evaluator (format parsing,
result layout, quality gate) driven end-to-end on a tiny model."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory, small_vocab):
    from embeddings_tpu.config import BertConfig
    from embeddings_tpu.models import params as P
    d = tmp_path_factory.mktemp("stsb_model")
    (d / "vocab.txt").write_text("\n".join(small_vocab))
    cfg = BertConfig(vocab_size=len(small_vocab), hidden_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128, max_position_embeddings=64)
    P.save_native(str(d / "tiny.npz"), P.init_params(cfg, rng=0), cfg)
    return d / "tiny.npz"


def _dataset(tmp_path, fmt: str) -> Path:
    # graded similarity a random-init (but deterministic) encoder can
    # still rank: identical > near-identical > unrelated sentences
    base = ["the quick brown fox jumps", "hello world test sentence",
            "an old big dog", "walk talk run code"]
    pairs = []
    for i, s in enumerate(base):
        pairs.append((5.0, s, s))
        pairs.append((3.5, s, s + " model"))
        pairs.append((0.5, s, base[(i + 1) % len(base)]))
    if fmt == "sts":
        p = tmp_path / "sts-test.tsv"
        p.write_text("\n".join(
            f"main-x\tfile\t2017\t{i:04d}\t{g}\t{a}\t{b}"
            for i, (g, a, b) in enumerate(pairs)) + "\n")
    elif fmt == "tsv3":
        p = tmp_path / "pairs.tsv"
        p.write_text("\n".join(f"{g}\t{a}\t{b}" for g, a, b in pairs) + "\n")
    else:
        p = tmp_path / "pairs.jsonl"
        p.write_text("\n".join(json.dumps(
            {"score": g, "sentence1": a, "sentence2": b})
            for g, a, b in pairs) + "\n")
    return p


@pytest.mark.parametrize("fmt", ["sts", "tsv3", "jsonl"])
def test_formats_parse(tmp_path, fmt):
    sys.path.insert(0, str(ROOT / "benchmarks"))
    from run_stsb_local import load_pairs
    s1, s2, gold = load_pairs(_dataset(tmp_path, fmt))
    assert len(s1) == len(s2) == len(gold) == 12
    assert gold.max() == 5.0 and gold.min() == 0.5


def test_server_mode(tmp_path, tiny_model):
    """--server-url drives a live HTTP server (the reference's
    run_mteb_server.py flow)."""
    import asyncio
    import threading

    import jax
    jax.config.update("jax_platforms", "cpu")
    from embeddings_tpu.runtime.engine import load_model
    from embeddings_tpu.runtime.server import serve_http
    pytest.importorskip("aiohttp")
    data = _dataset(tmp_path, "tsv3")
    engine = load_model(tiny_model)
    out = tmp_path / "results"

    async def go():
        runner, svc = await serve_http(engine, host="127.0.0.1", port=0)
        port = runner.addresses[0][1]

        def run_script():
            import subprocess
            return subprocess.run(
                [sys.executable,
                 str(ROOT / "benchmarks" / "run_stsb_local.py"),
                 "-m", str(tiny_model), "--data", str(data),
                 "--modes", "served", "--out", str(out),
                 "--server-url", f"http://127.0.0.1:{port}"],
                capture_output=True, text=True, timeout=300,
                env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                     "PYTHONPATH": str(ROOT), "HOME": "/root"})

        r = await asyncio.to_thread(run_script)
        await runner.cleanup()
        await svc.stop()
        return r

    r = asyncio.run(go())
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    res = json.loads((out / "tiny_served" / "STSBenchmark.json").read_text())
    assert res["test"]["cos_sim"]["spearman"] > 0.5


def test_end_to_end_gate_and_layout(tmp_path, tiny_model):
    data = _dataset(tmp_path, "sts")
    out = tmp_path / "results"
    r = subprocess.run(
        [sys.executable, str(ROOT / "benchmarks" / "run_stsb_local.py"),
         "-m", str(tiny_model), "--data", str(data),
         "--modes", "f32", "f16", "q4_0", "--out", str(out)],
        capture_output=True, text=True, timeout=500,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": str(ROOT), "HOME": "/root"})
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    # reference result layout, fields print_tables.py reads
    res = json.loads((out / "tiny_q4_0" / "STSBenchmark.json").read_text())
    spear = res["test"]["cos_sim"]["spearman"]
    assert -1.0 <= spear <= 1.0
    assert res["test"]["evaluation_time"] > 0
    # identical-sentence pairs score highest -> positive rank correlation
    # even on random weights
    assert spear > 0.5, r.stdout
    assert "ΔSpearman(q4_0 vs f16/f32)" in r.stdout
    # print_tables can consume the directory
    sys.path.insert(0, str(ROOT / "benchmarks"))
    import print_tables
    rows = print_tables.extract_mteb(out)
    assert ("tiny", "STSBenchmark") in rows, rows
    modes = rows[("tiny", "STSBenchmark")]
    assert "q4_0" in modes and modes["q4_0"][0] == pytest.approx(spear)
