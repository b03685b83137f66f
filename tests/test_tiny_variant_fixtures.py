"""Committed tiny-trained variant checkpoints load and route correctly.

The heavyweight quality evidence lives in benchmarks/results/
tiny-trained-{moe,rotary,alibi}* (run_stsb_local.py gates on trained
weights); these tests only pin the cheap invariants: the fixture dirs
load through load_model, the configs map to the intended architecture
flags, and the attention route the long-context gates claim is the one
dispatch would pick at the gate's shapes."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

FIX = Path(__file__).resolve().parent.parent / "benchmarks" / "fixtures"

CASES = {
    "tiny_trained_moe": dict(num_experts=4, moe_top_k=2,
                             position_embedding_type="rotary",
                             gated_mlp=False, hidden_act="gelu"),
    "tiny_trained_rotary": dict(num_experts=0,
                                position_embedding_type="rotary",
                                gated_mlp=True, hidden_act="silu",
                                max_position_embeddings=2048),
    "tiny_trained_alibi": dict(num_experts=0,
                               position_embedding_type="alibi",
                               gated_mlp=True, hidden_act="gelu",
                               max_position_embeddings=2048),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_fixture_loads_and_encodes(name):
    d = FIX / name / "model"
    if not d.exists():
        pytest.skip(f"{name} not trained (tools/train_tiny_variants.py)")
    from embeddings_tpu.runtime.engine import load_model
    eng = load_model(str(d))
    for field, want in CASES[name].items():
        assert getattr(eng.config, field) == want, field
    vocab = [v for v in (d / "vocab.txt").read_text().splitlines() if v]
    texts = ["the " + " ".join(vocab[20:25]) + " .",
             "a " + " ".join(vocab[40:44]) + " ."]
    e = eng.encode_batch(texts, batch_size=2)
    assert e.shape == (2, eng.config.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0, atol=1e-5)


def test_long_gate_route_is_streaming():
    """The long-doc gates (sts-test-long.tsv, ~850-token docs -> L=1024
    buckets) must ride the streaming kernels on TPU: alibi at any L,
    rotary because whole-row K/V no longer fits at L=1024 only at
    E>=768 — at the tiny E=128 it still fits, so the rotary tiny gate
    rides whole_row (correct and fused) while alibi rides stream_alibi.
    Pin both so the artifact's claims stay honest."""
    from embeddings_tpu.models.bert import attention_route_name
    E, H, D = 128, 4, 32
    assert attention_route_name(1024, H, D, E, False, 0, False, False,
                                True, False) == "stream_alibi"
    assert attention_route_name(1024, H, D, E, False, 0, False, False,
                                False, False) == "whole_row"
    # the production shape the tiny gate stands in for: bge/nomic E=768
    # at L=2048 must stream
    assert attention_route_name(2048, 12, 64, 768, False, 0, False,
                                False, False, False) == "stream"
