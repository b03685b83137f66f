"""Long-context model families on chip: kernel route vs einsum route.

Measures the full jitted forward of ModernBERT-base (alternating
global / banded sliding-window attention via per-layer lax.cond) and
jina-bert-v2-base (in-kernel static-slope ALiBi via the streaming
kernel) at L = 512 / 2048 / 8192, against the XLA einsum path
(use_pallas="never") where it can run at all. The reference engine
cannot express either family and hard-caps sequences at 512
(/root/reference/bert.cpp:867-871); this artifact documents the
beyond-reference long-context capability and the kernels that make it
usable: past L≈1024 whole-row K/V no longer fits VMEM, so attention
streams key blocks (ops/attention.fused_attention_stream /
fused_attention_window).

Writes benchmarks/results/modern_families.json. Run on a TPU host:
    python benchmarks/modern_families.py
"""

from __future__ import annotations

import functools
import importlib
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

from embeddings_tpu.config import BertConfig  # noqa: E402
from embeddings_tpu.models import bert, params as P  # noqa: E402

linmod = importlib.import_module("embeddings_tpu.ops.linear")

MODERNBERT = BertConfig(
    vocab_size=50368, hidden_size=768, num_hidden_layers=22,
    num_attention_heads=12, intermediate_size=1152,
    max_position_embeddings=8192, position_embedding_type="rotary",
    rotary_base=160000.0, local_rotary_base=10000.0,
    global_attn_every_n_layers=3, local_attention_window=128,
    gated_mlp=True, norm_style="pre", layer_norm_eps=1e-5,
    type_vocab_size=1)
JINA_V2_BASE = BertConfig(
    vocab_size=30528, hidden_size=768, num_hidden_layers=12,
    num_attention_heads=12, intermediate_size=3072,
    max_position_embeddings=8192, position_embedding_type="alibi",
    gated_mlp=True, hidden_act="gelu")


def bench_model(name: str, cfg: BertConfig, cases, reps: int = 5):
    p = P.cast_params(P.fuse_qkv(P.init_params(cfg, rng=0)), "bf16")
    rng = np.random.default_rng(0)
    rows = []

    @functools.partial(jax.jit, static_argnames=("mode", "L", "B"))
    def fwd(p, ids, mask, mode, L, B):
        with linmod.pallas_mode(mode):
            return bert.encode_tokens(p, cfg, ids, mask,
                                      compute_dtype="bfloat16")

    for B, L, modes in cases:
        ids = jnp.asarray(
            rng.integers(5, cfg.vocab_size, (B, L)).astype(np.int32))
        m = np.ones((B, L), np.int32)
        m[B // 2:, (3 * L) // 4:] = 0
        mask = jnp.asarray(m)
        outs = {}
        for mode in modes:
            outs[mode] = np.asarray(fwd(p, ids, mask, mode, L, B))
            t0 = time.time()
            for _ in range(reps):
                r = fwd(p, ids, mask, mode, L, B)
            jax.block_until_ready(r)
            dt = (time.time() - t0) / reps
            rows.append({"model": name, "B": B, "L": L, "mode": mode,
                         "ms_per_batch": round(dt * 1000, 2),
                         "seq_per_s": round(B / dt, 1)})
            print(f"{name} L={L} B={B} {mode}: {dt * 1000:.1f} ms "
                  f"({B / dt:.0f} seq/s)", flush=True)
        if len(outs) == 2:
            a, b = outs["auto"], outs["never"]
            cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                                     * np.linalg.norm(b, axis=-1))
            rows[-1]["cos_vs_auto_min"] = round(float(cos.min()), 7)
            print(f"  kernel-vs-einsum cos min {cos.min():.7f}", flush=True)
    return rows


def main() -> int:
    if jax.default_backend() == "cpu":
        print("refusing to record a CPU run as a TPU artifact",
              file=sys.stderr)
        return 1
    rows = []
    # einsum at L=8192 materializes [B,H,8192,8192] f32 — not runnable
    cases = [(8, 512, ("auto", "never")), (4, 2048, ("auto", "never")),
             (1, 8192, ("auto",))]
    rows += bench_model("modernbert-base", MODERNBERT, cases)
    rows += bench_model("jina-v2-base", JINA_V2_BASE, cases)
    out = {
        "device": str(jax.devices()[0]),
        "note": ("random-init weights (flops/bandwidth do not care); "
                 "auto = kernel route (banded window + streaming-KV + "
                 "in-kernel ALiBi), never = XLA einsum route. The "
                 "reference caps L at 512 and has neither family."),
        "rows": rows,
    }
    path = Path(__file__).parent / "results" / "modern_families.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
