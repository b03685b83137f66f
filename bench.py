"""Headline benchmark: sentences/sec/chip, bge-base-en-v1.5 Q4_0 @ seq 256.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The headline runs the int8-MXU compute mode (EngineConfig.int8_compute:
s8xs8->s32 dots at 2x the bf16 MXU rate, weights still stored q4_0 —
ops/qmatmul.py); the bf16-compute number is reported alongside as
"bf16_value". Quality: ΔSpearman(q4_0-int8 vs f32) = 0.0003 on the
trained-checkpoint STSB gate — identical to plain q4_0
(benchmarks/run_stsb_local.py --modes q4_0-int8).

Baseline: the reference's best published throughput proxy is the MTEB
STSBenchmark eval at q4_0 batched — 18.78 s for the full test split
(BASELINE.md; README.md:173). STSB test = 1379 pairs = 2758 sentences
-> ~147 sentences/s on its 32-thread CPU host. vs_baseline = ours / 147.
(Reference sentences are short, so this flatters the baseline: we measure
at a full 256-token sequence length per BASELINE.json's metric spec.)

Timing uses the slope method (utils/benchmarking.py) so the axon relay's
per-dispatch latency doesn't pollute the device time.
"""

from __future__ import annotations

import json

import numpy as np

BASELINE_SENT_PER_S = 2758 / 18.78  # ~146.9


def main() -> None:
    import jax
    import jax.numpy as jnp
    from embeddings_tpu.config import BertConfig, KNOWN_MODELS
    from embeddings_tpu.models import bert, params as P
    from embeddings_tpu.utils.benchmarking import device_time_us

    cfg = BertConfig(**{**KNOWN_MODELS["bge-base-en-v1.5"],
                        "vocab_size": 30528})
    params = P.fuse_qkv(P.pack_q4_params(
        P.quantize_params(P.init_params(cfg, rng=0), "q4_0")))

    B, L = 128, 256
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)

    from embeddings_tpu.ops.linear import int8_mode

    def make_step(i8):
        def step(ids_c, mask):
            # ids_c is the timing carry: the forward must consume it so
            # XLA cannot hoist the loop-invariant computation.
            with int8_mode(i8):
                return bert.encode_tokens(params, cfg, ids_c, mask,
                                          compute_dtype="bfloat16")
        return step

    us_bf = device_time_us(make_step(False), (ids, mask), lo=5, hi=20,
                           reps=3)
    us_i8 = device_time_us(make_step(True), (ids, mask), lo=5, hi=20,
                           reps=3)
    sent_per_s = B / (us_i8 * 1e-6)
    print(json.dumps({
        "metric": "sentences/sec/chip bge-base q4_0+int8 seq256 batch128",
        "value": round(sent_per_s, 1),
        "unit": "sentences/s",
        "vs_baseline": round(sent_per_s / BASELINE_SENT_PER_S, 2),
        "bf16_value": round(B / (us_bf * 1e-6), 1),
    }))


if __name__ == "__main__":
    main()
