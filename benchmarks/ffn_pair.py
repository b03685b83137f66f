#!/usr/bin/env python
"""The FFN pair (up+GELU -> down+res-LN) timed both ways, jitted as one
program per variant — the exact trade the "ffn" chain link makes:

  plain   up emits bf16 [M, 3072]; down quantizes rows in-kernel at
          every grid step (the measured-fast int8[] default)
  chained up emits int8-ONLY ([M, 3072] int8 + row scales — the bf16
          hidden never touches HBM); down consumes pre-quantized x

int8_compute.py sees down alone gain 2.3x from prequant (653 vs
1,292us) yet the e2e ablation has the ffn link LOSING 185us — this
probe isolates whether the emission side of up eats the gain, with
XLA free to schedule the pair exactly as the forward does. Run on TPU:
python benchmarks/ffn_pair.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import importlib

    import jax
    import jax.numpy as jnp
    lin = importlib.import_module("embeddings_tpu.ops.linear")
    from embeddings_tpu.ops.quant import quantize
    from embeddings_tpu.utils.benchmarking import device_time_us

    M, E, F = 32768, 768, 3072
    rng = np.random.default_rng(0)
    w_up = quantize(np.asarray(rng.standard_normal((E, F)) * 0.05,
                               np.float32), "q4_0", pack4=True)
    w_dn = quantize(np.asarray(rng.standard_normal((F, E)) * 0.05,
                               np.float32), "q4_0", pack4=True)
    b_up = jnp.asarray(rng.standard_normal(F) * 0.1, jnp.float32)
    b_dn = jnp.asarray(rng.standard_normal(E) * 0.1, jnp.float32)
    lns = jnp.ones(E, jnp.float32)
    lnb = jnp.zeros(E, jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, E)), jnp.bfloat16)

    def plain(xx):
        with lin.int8_mode(True), lin.pallas_mode("always"):
            h = lin.linear(xx, w_up, b_up, act="gelu")
            return lin.linear_residual_ln(h, w_dn, b_dn, xx, lns, lnb,
                                          1e-12)

    def chained(xx):
        with lin.int8_mode(True), lin.pallas_mode("always"):
            hq = lin.linear(xx, w_up, b_up, act="gelu", emit="only")
            return lin.linear_residual_ln(hq, w_dn, b_dn, xx, lns, lnb,
                                          1e-12)

    t_plain = device_time_us(plain, (x,), lo=5, hi=25)
    t_chain = device_time_us(chained, (x,), lo=5, hi=25)
    a = np.asarray(plain(x), np.float32)
    b = np.asarray(chained(x), np.float32)
    an = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-9)
    bn = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-9)
    out = {"chip": str(jax.devices()[0]), "M": M, "E": E, "F": F,
           "plain_us": round(t_plain, 1), "chained_us": round(t_chain, 1),
           "chained_minus_plain_us": round(t_chain - t_plain, 1),
           "min_cos": round(float((an * bn).sum(-1).min()), 6)}
    print(json.dumps(out))
    Path(__file__).parent.joinpath("results", "ffn_pair.json") \
        .write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
