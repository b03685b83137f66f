"""Roofline reproduction: per-op TF/s of the production forward, from a
device profile of the exact headline-bench program.

Backs the kernel-efficiency claims in docs/kernels.md with a committed,
re-runnable artifact (benchmarks/results/roofline.json). Method: run the
jitted bge-base q4_0 forward (B=128, L=256 — bench.py's configuration)
under jax.profiler, parse the Chrome trace, and attribute device time to
each Pallas kernel; TF/s = known per-op flops / measured time. A plain
dense-bf16 matmul of the largest shape is profiled alongside as the
chip's practical MXU ceiling.

(An earlier version timed each op standalone in a slope loop; the loop's
data-dependence feedback taxed fast ops by ~25% — profiling the real
program is both simpler and honest.)

Run on the TPU (default env): python benchmarks/roofline.py
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from embeddings_tpu.config import BertConfig, KNOWN_MODELS
from embeddings_tpu.models import bert, params as P
from embeddings_tpu.ops.linear import pallas_mode

B, L = 128, 256
REPS = 5


def profile_op_times(int8: bool = False,
                     links: frozenset | None = None
                     ) -> tuple[dict, float, float]:
    import contextlib

    from embeddings_tpu.ops.linear import chain_links, int8_mode

    def link_ctx():  # fresh cm per entry (generator cms are one-shot)
        return (chain_links(links) if links is not None
                else contextlib.nullcontext())
    cfg = BertConfig(**{**KNOWN_MODELS["bge-base-en-v1.5"],
                        "vocab_size": 30528})
    params = P.fuse_qkv(P.pack_q4_params(
        P.quantize_params(P.init_params(cfg, rng=0), "q4_0")))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 30000, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)

    @jax.jit
    def fwd(p, ids, mask):
        with pallas_mode("always"), int8_mode(int8), link_ctx():
            return bert.encode_tokens(p, cfg, ids, mask,
                                      compute_dtype="bfloat16")

    # dense ceiling probe: the FFN-up shape as a plain XLA bf16 matmul
    x = jnp.asarray(rng.standard_normal((B * L, 768)), jnp.bfloat16)
    wd = jnp.asarray(rng.standard_normal((768, 3072)), jnp.bfloat16)

    @jax.jit
    def dense(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    def traced(fn, args, reps):
        fn(*args).block_until_ready()  # compile outside the trace
        d = tempfile.mkdtemp()
        with jax.profiler.trace(d):
            for _ in range(reps):
                fn(*args).block_until_ready()
        tracef = glob.glob(d + "/**/*.trace.json.gz", recursive=True)[0]
        ev = json.loads(gzip.open(tracef).read())["traceEvents"]
        dur: collections.Counter = collections.Counter()
        for e in ev:
            if e.get("ph") == "X" and "dur" in e:
                dur[e.get("name", "?")] += e["dur"]
        return dur

    # separate traces: the dense probe must not pick up dot/fusion ops
    # emitted inside the forward (or vice versa)
    fdur = traced(fwd, (params, ids, mask), REPS)
    ddur = traced(dense, (x, wd), REPS * 12)
    qm = sorted(((n, us) for n, us in fdur.items()
                 if n.startswith("qmatmul")), key=lambda x: -x[1])
    attn = sum(us for n, us in fdur.items()
               if n.startswith("fused_attention"))
    total = sum(us for n, us in fdur.items() if n.startswith("jit_fwd"))
    dense_us = sum(us for n, us in ddur.items()
                   if n.startswith("jit_dense"))
    top = sorted(((n, round(us / REPS, 1)) for n, us in fdur.items()
                  if us / REPS > 20 and not n.startswith("jit_fwd")),
                 key=lambda x: -x[1])[:24]
    return {"qmatmul": qm, "attn_us": attn / REPS,
            "total_us": total / REPS,
            "top_ops": top}, dense_us / (REPS * 12), total


# per-layer matmuls at M = B*L tokens (bge-base). The trace names are
# opaque (qmatmul.N), so entries are attributed by flop ranking — and the
# FFN up/down pair has IDENTICAL flops (768x3072 vs 3072x768), so those
# two are reported as one combined row rather than guessing which is
# which.
MATMULS = [("ffn_up+gelu & ffn_down+res_ln (combined)", 768 * 3072, 2),
           ("qkv_proj", 768 * 2304, 1),
           ("attn_out+res_ln", 768 * 768, 1)]


def main() -> int:
    if "--int8" in sys.argv:
        # int8-mode attribution is RAW (chained emission renames/merges
        # kernels, so flop-rank attribution would guess): per-op device
        # times of the int8 production forward, for finding where the
        # non-MXU time lives. Writes roofline_int8.json (default link
        # set) or roofline_int8_<links>.json under --links a,b.
        links = None
        tag = ""
        for a in sys.argv[1:]:
            if a.startswith("--links="):
                links = frozenset(filter(None, a[8:].split(",")))
                tag = "_" + ("+".join(sorted(links)) or "nolinks")
        times, dense_us, _ = profile_op_times(int8=True, links=links)
        out_doc = {
            "chip": str(jax.devices()[0]),
            "mode": ("int8 (current chain-link default)" if links is None
                     else f"int8 links={sorted(links)}"),
            "config": {"model": "bge-base q4_0 packed", "B": B, "L": L},
            "dense_bf16_ceiling_tfs": round(
                2 * B * L * 768 * 3072 / dense_us / 1e6, 1),
            "forward_us_per_dispatch": round(times["total_us"], 0),
            "attention_us_per_dispatch": round(times["attn_us"], 0),
            "qmatmul_us": [(n, round(us / REPS, 1))
                           for n, us in times["qmatmul"]],
            "top_device_ops_us": times["top_ops"],
        }
        print(json.dumps(out_doc, indent=1))
        out = (Path(__file__).parent / "results"
               / f"roofline_int8{tag}.json")
        out.write_text(json.dumps(out_doc, indent=1))
        print(f"wrote {out}")
        return 0
    times, dense_us, _ = profile_op_times()
    M = B * L
    NL = 12
    measured = sorted(times["qmatmul"], key=lambda x: -x[1])
    assert len(measured) == 4, [n for n, _ in measured]
    # flop order: up == down > qkv > o, so the two largest measured
    # entries are the FFN pair, then qkv, then attn-out. Guard the
    # assumption: a badly regressed qkv kernel could out-time an FFN
    # entry, silently mislabeling rows — flag instead of misattributing.
    grouped = [measured[0][1] + measured[1][1], measured[2][1],
               measured[3][1]]
    # expected time ratios if efficiency were uniform: FFN entry ~1.33x
    # qkv, qkv 3x o. Allow wide margins; outside them, mark uncertain.
    attribution_ok = (measured[1][1] > 0.8 * measured[2][1]
                      and measured[2][1] > 1.5 * measured[3][1])
    dense_flops = 2 * M * 768 * 3072
    dense_tfs = dense_flops / dense_us / 1e6
    results = []
    for (name, kn, count), us_total in zip(MATMULS, grouped):
        us = us_total / REPS
        flops = 2 * M * kn * NL * count
        tfs = flops / us / 1e6
        results.append({
            "matmul": name, "M": M, "KxN": kn, "ops": count,
            "device_us_per_dispatch": round(us, 0),
            "q4_tfs": round(tfs, 1),
            "pct_of_dense_ceiling": round(100 * tfs / dense_tfs, 1)})
    attn_flops = 2 * 2 * B * 12 * L * L * 64 * NL
    attn_tfs = attn_flops / times["attn_us"] / 1e6
    out_doc = {
        "chip": str(jax.devices()[0]),
        "attribution_ok": bool(attribution_ok),
        "config": {"model": "bge-base q4_0 packed", "B": B, "L": L,
                   "tokens_per_dispatch": M},
        "dense_bf16_ceiling_tfs": round(dense_tfs, 1),
        "forward_us_per_dispatch": round(times["total_us"], 0),
        "attention_us_per_dispatch": round(times["attn_us"], 0),
        "attention_tfs": round(attn_tfs, 1),
        "note": "per-op device times from a jax.profiler trace of the "
                "production jitted forward (epilogues are inside the "
                "matmul kernels); qmatmul trace entries attributed to "
                "shapes by flop ranking",
        "results": results,
    }
    print(json.dumps(out_doc, indent=1))
    out = Path(__file__).parent / "results" / "roofline.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(out_doc, indent=1))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
