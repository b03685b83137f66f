#!/usr/bin/env python
"""int8-MXU compute mode on-chip: device time + numerics of the fused
dequant-matmul kernel with int8_compute=True vs the bf16 path, at the
bge-base production shapes (the roofline.py set).

The mode requantizes weight tiles to per-column int8 in VMEM and
activations to per-row int8 on the fly, running the MXU dot at the
s8xs8->s32 rate (2x bf16 on v5e; ops/qmatmul.py). Run on the TPU:
python benchmarks/int8_compute.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


# production matmul shapes for bge-base at B=128, L=256 (M=32768):
# qkv (fused), attn-out + residual-LN, ffn-up + gelu, ffn-down + res-LN.
# bm_bf16 mirrors ops/linear.py's bf16 dispatch (int8 bms come from
# qmatmul.pick_bm_int8, the same picker the dispatch uses — the int8
# mode has no bf16 staging scratch and pre-quantized x halves the x
# tile, so FFN-down climbs 128 -> 256 -> 512 across the three modes).
CASES = [  # (name, M, K, N, epilogue, bm_bf16)
    ("qkv_proj", 32768, 768, 2304, "bias", 256),
    ("attn_out+res_ln", 32768, 768, 768, "bias_residual_ln", 512),
    ("ffn_up+gelu", 32768, 768, 3072, "bias_gelu", 256),
    ("ffn_down+res_ln", 32768, 3072, 768, "bias_residual_ln", 128),
]


def main() -> int:
    import jax
    import jax.numpy as jnp
    from embeddings_tpu.ops.linear import quantize_act
    from embeddings_tpu.ops.qmatmul import (pick_bm_int8, qmatmul,
                                            residual_ln_fits)
    from embeddings_tpu.ops.quant import quantize
    from embeddings_tpu.utils.benchmarking import profiled_device_time_us

    def bm_for(K, N, epi, x_bytes):
        # mirror ops/linear.py dispatch: pick_bm_int8 for plain
        # epilogues; the residual-LN epilogue needs bn == N in VMEM,
        # so probe the same descending ladder linear_residual_ln uses
        if epi != "bias_residual_ln":
            return pick_bm_int8(K, N, packed=True, x_bytes=x_bytes)
        return next(bm for bm in (512, 256, 128, 64)
                    if residual_ln_fits(K, N, bm, packed=True,
                                        int8=True, x_bytes=x_bytes))

    rng = np.random.default_rng(0)
    results = {"device": str(jax.devices()[0]),
               "timing": "jax.profiler per-kernel device durations",
               "cases": []}
    tot_bf, tot_i8, tot_pq = 0.0, 0.0, 0.0
    for name, M, K, N, epi, bm_bf in CASES:
        bm_i8 = bm_for(K, N, epi, x_bytes=2)
        bm_pq = bm_for(K, N, epi, x_bytes=1)
        w = np.asarray(rng.standard_normal((K, N)) * 0.05, np.float32)
        qt = quantize(w, "q4_0", pack4=True)
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal(N) * 0.1, jnp.float32)
        kw = dict(kind="q4_0", packed=True)
        if epi == "bias_residual_ln":
            kw.update(epilogue=epi,
                      residual=jnp.asarray(
                          rng.standard_normal((M, N)), jnp.bfloat16),
                      ln_scale=jnp.ones(N, jnp.float32),
                      ln_bias=jnp.zeros(N, jnp.float32))
        elif epi != "bias":
            kw.update(epilogue=epi)

        def run(i8):
            # compare a 2048-row slice: full [M, N] f32 downloads are
            # ~300 MB through the dev relay and dominate wall time
            return qmatmul(x, qt.codes, qt.scales, qt.mins, b,
                           int8_compute=i8, bm=bm_i8 if i8 else bm_bf,
                           **kw)[:2048]

        o_bf = np.asarray(run(False), np.float32)
        o_i8 = np.asarray(run(True), np.float32)
        na = o_bf / np.maximum(
            np.linalg.norm(o_bf, axis=-1, keepdims=True), 1e-9)
        nb = o_i8 / np.maximum(
            np.linalg.norm(o_i8, axis=-1, keepdims=True), 1e-9)
        cos = float((na * nb).sum(-1).min())

        # profiler-exact kernel durations: the slope method's feedback
        # chain re-reads input+output every iteration, which adds a
        # shape-proportional constant (~250-500us at these sizes) to
        # every variant and DEFLATES the measured speedups
        t_bf = profiled_device_time_us(
            jax.jit(lambda xx: qmatmul(
                xx, qt.codes, qt.scales, qt.mins, b,
                int8_compute=False, bm=bm_bf, **kw)),
            (x,), reps=10, name_prefix="qmatmul")
        t_i8 = profiled_device_time_us(
            jax.jit(lambda xx: qmatmul(
                xx, qt.codes, qt.scales, qt.mins, b,
                int8_compute=True, bm=bm_i8, **kw)),
            (x,), reps=10, name_prefix="qmatmul")
        # pre-quantized activations (the chained path's consumer side):
        # x arrives as int8 rows + f32 row scales — no per-grid-step
        # requant VPU work, half the x HBM read
        xq8 = quantize_act(x)
        t_pq = profiled_device_time_us(
            jax.jit(lambda qq: qmatmul(
                qq, qt.codes, qt.scales, qt.mins, b,
                int8_compute=True, x_scale=xq8.s,
                bm=bm_pq, **kw)),
            (xq8.q,), reps=10, name_prefix="qmatmul")
        tot_bf += t_bf
        tot_i8 += t_i8
        tot_pq += t_pq
        tfs = 2 * M * K * N / (t_i8 * 1e-6) / 1e12
        tfs_pq = 2 * M * K * N / (t_pq * 1e-6) / 1e12
        row = {"matmul": name, "M": M, "K": K, "N": N, "epilogue": epi,
               "bf16_us": round(t_bf, 1), "int8_us": round(t_i8, 1),
               "prequant_us": round(t_pq, 1),
               "speedup": round(t_bf / t_i8, 3),
               "prequant_speedup": round(t_bf / t_pq, 3),
               "int8_tfs": round(tfs, 1),
               "prequant_tfs": round(tfs_pq, 1),
               "bm": {"bf16": bm_bf, "int8": bm_i8, "prequant": bm_pq},
               "min_cos": round(cos, 6)}
        results["cases"].append(row)
        print(json.dumps(row))

    results["total_speedup"] = round(tot_bf / tot_i8, 3)
    results["total_prequant_speedup"] = round(tot_bf / tot_pq, 3)
    Path(__file__).parent.joinpath("results", "int8_compute.json") \
        .write_text(json.dumps(results, indent=1))
    print(json.dumps({"total_speedup": results["total_speedup"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
