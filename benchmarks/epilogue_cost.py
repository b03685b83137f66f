#!/usr/bin/env python
"""Isolate the per-epilogue VPU tax of the fused dequant-matmul kernel.

Times the SAME production matmul shape under each epilogue (none / bias
/ bias_gelu / bias_residual_ln) in bf16 and int8-MXU mode, so the cost
of the fused elementwise tail (GELU transcendental chain, LayerNorm
reductions, int8 rescale passes) is read directly as a delta instead of
inferred from roofline arithmetic. Guides which epilogue to attack for
the e2e headline (VERDICT r4 task #6). Run on TPU:
python benchmarks/epilogue_cost.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (label, M, K, N, epilogues to probe)
CASES = [
    ("ffn_up_768x3072", 32768, 768, 3072, ("bias", "bias_gelu")),
    ("ffn_down_3072x768", 32768, 3072, 768, ("bias", "bias_residual_ln")),
    ("attn_out_768x768", 32768, 768, 768, ("bias", "bias_residual_ln")),
]


def main() -> int:
    import jax
    import jax.numpy as jnp
    from embeddings_tpu.ops.qmatmul import (qmatmul, pick_bm_int8,
                                            residual_ln_fits)
    from embeddings_tpu.ops.quant import quantize
    from embeddings_tpu.utils.benchmarking import device_time_us

    def bm_for(K, N, epi, int8):
        if epi != "bias_residual_ln":
            return pick_bm_int8(K, N, packed=True) if int8 else 256
        return next(bm for bm in (512, 256, 128, 64)
                    if residual_ln_fits(K, N, bm, packed=True, int8=int8))

    rng = np.random.default_rng(0)
    results = {"device": str(jax.devices()[0]), "cases": []}
    for name, M, K, N, epis in CASES:
        w = np.asarray(rng.standard_normal((K, N)) * 0.05, np.float32)
        qt = quantize(w, "q4_0", pack4=True)
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal(N) * 0.1, jnp.float32)
        res = jnp.asarray(rng.standard_normal((M, N)), jnp.bfloat16)
        lns = jnp.ones(N, jnp.float32)
        lnb = jnp.zeros(N, jnp.float32)
        row = {"matmul": name, "M": M, "K": K, "N": N, "times_us": {}}
        for epi in epis:
            for i8 in (False, True):
                kw = dict(kind="q4_0", packed=True, epilogue=epi,
                          int8_compute=i8, bm=bm_for(K, N, epi, i8))
                if epi == "bias_residual_ln":
                    kw.update(residual=res, ln_scale=lns, ln_bias=lnb)
                t = device_time_us(
                    lambda xx: qmatmul(xx, qt.codes, qt.scales, qt.mins,
                                       b, **kw),
                    (x,), lo=5, hi=25)
                row["times_us"][f"{epi}:{'int8' if i8 else 'bf16'}"] = \
                    round(t, 1)
        results["cases"].append(row)
        print(json.dumps(row))
    Path(__file__).parent.joinpath("results", "epilogue_cost.json") \
        .write_text(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
