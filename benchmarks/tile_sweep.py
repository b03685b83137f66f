#!/usr/bin/env python
"""bm/bn tile A/B for the int8 qmatmul at production shapes, timed with
the profiler (exact kernel durations — the slope method's feedback
chain re-reads input+output every iteration and inflates absolutes).

pick_bm_int8's "never trade bn for bm" rule was set by slope timings;
this sweeps bm in {256, 512} per shape (bn follows) and prints kernel
device time per call. Run on TPU: python benchmarks/tile_sweep.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CASES = [  # (label, M, K, N, epilogue)
    ("qkv", 32768, 768, 2304, "bias"),
    ("ffn_up", 32768, 768, 3072, "bias_gelu"),
    ("attn_out", 32768, 768, 768, "bias_residual_ln"),
    ("ffn_down", 32768, 3072, 768, "bias_residual_ln"),
]


def main() -> int:
    import jax
    import jax.numpy as jnp
    from embeddings_tpu.ops.qmatmul import (_pick_bn, qmatmul,
                                            residual_ln_fits)
    from embeddings_tpu.ops.quant import quantize
    from embeddings_tpu.utils.benchmarking import profiled_device_time_us

    rng = np.random.default_rng(0)
    results = {"device": str(jax.devices()[0]), "cases": []}
    for name, M, K, N, epi in CASES:
        w = np.asarray(rng.standard_normal((K, N)) * 0.05, np.float32)
        qt = quantize(w, "q4_0", pack4=True)
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal(N) * 0.1, jnp.float32)
        kw = dict(kind="q4_0", packed=True, epilogue=epi,
                  int8_compute=True)
        if epi == "bias_residual_ln":
            kw.update(residual=jnp.asarray(
                rng.standard_normal((M, N)), jnp.bfloat16),
                ln_scale=jnp.ones(N, jnp.float32),
                ln_bias=jnp.zeros(N, jnp.float32))
        row = {"matmul": name, "K": K, "N": N, "times": {}}
        for bm in (256, 512):
            if epi == "bias_residual_ln":
                if not residual_ln_fits(K, N, bm, packed=True, int8=True):
                    row["times"][f"bm{bm}"] = None
                    continue
                bn = N
            else:
                bn = _pick_bn(K, N, bm, None, packed=True, int8=True)
                if bn <= 0:
                    row["times"][f"bm{bm}"] = None
                    continue

            def run(xx, bm=bm):
                return qmatmul(xx, qt.codes, qt.scales, qt.mins, b,
                               bm=bm, **kw)

            t = profiled_device_time_us(jax.jit(run), (x,), reps=10,
                                        name_prefix="qmatmul")
            row["times"][f"bm{bm}"] = {"bn": bn, "us": round(t, 1)}
            print(json.dumps({"matmul": name, "bm": bm, "bn": bn,
                              "us": round(t, 1)}))
        results["cases"].append(row)
    Path(__file__).parent.joinpath("results", "tile_sweep.json") \
        .write_text(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
