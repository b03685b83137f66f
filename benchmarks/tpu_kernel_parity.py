"""On-chip kernel conformance sweep: Pallas vs XLA-fallback numerics on
REAL TPU hardware.

The pytest suite proves kernel correctness in interpret mode on CPU;
this sweep executes the actual Mosaic lowerings on the chip and compares
against the unfused XLA paths for every quantization kind x epilogue x
production shape, plus the three attention kernels. Catches
Mosaic-lowering-specific defects (layout/tiling bugs) that interpret
mode cannot. Writes benchmarks/results/tpu_kernel_parity.json.

Run on the TPU (default env): python benchmarks/tpu_kernel_parity.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# persistent compile cache: the sweep is ~100% compile-bound over the
# axon relay; reruns (and the staleness-guard regeneration) become cheap
jax.config.update("jax_compilation_cache_dir",
                  str(Path.home() / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from embeddings_tpu.ops import attention as A
from embeddings_tpu.ops import qmatmul as QM
from embeddings_tpu.ops import quant as Q
from embeddings_tpu.ops.linear import (linear, linear_residual_ln,
                                       pallas_mode)

# (K, N): bge-base's four shapes, MiniLM's two, and every per-shard
# shape the shard_map TP path dispatches (parallel/sharding.py):
# column-parallel shards slice N (qkv 2304 -> 1152/576, FFN-up 3072 ->
# 1536/768), row-parallel shards slice K (o-proj 768 -> 384/192,
# FFN-down 3072 -> 1536/768). N=576 is the whole-N ragged-lane tile
# (the special code path at ops/qmatmul.py); N=1152/384 also exercise
# non-multiple-of-128... (1152 = 9*128 regular; 576 = 4.5*128 ragged).
SHAPES = [(768, 2304), (768, 768), (768, 3072), (3072, 768),
          (384, 1536), (1536, 384),
          # TP shards (tp=2, tp=4); FFN-down row shards 3072/tp are
          # (1536, 768) / (768, 768), already in the base list
          (768, 1152), (768, 576),      # qkv column shards
          (768, 1536), (768, 384),      # FFN-up column shards
          (384, 768), (192, 768)]       # o-proj row shards
KINDS = ["q4_0", "q4_0-packed", "q4_1", "q8_0", "nf4", "nf4-packed"]
M = 1024


def _tolerance(ref: np.ndarray) -> float:
    # The kernel and the XLA fallback differ by bf16 rounding order
    # only: every observed max-abs-err is exactly ONE bf16 ULP at the
    # top of the output's dynamic range (outputs are bf16; the absolute
    # rounding error of a K-term bf16 accumulation rides the
    # accumulation magnitude, surviving unchanged at near-zero outputs
    # produced by cancellation — verified against a bf16-faithful XLA
    # reference, which deviates from the f32-weight fallback
    # identically). Bound: 2 output ULPs at the range max; a genuine
    # kernel defect shows up orders of magnitude above this.
    mx = float(np.abs(ref).max())
    ulp = 2.0 ** (np.floor(np.log2(max(mx, 1e-30))) - 7)
    return max(2e-2, 2.0 * float(ulp))


def _quantize(w, kind):
    base = kind.split("-")[0]
    qt = Q.quantize(w, base)
    if kind.endswith("-packed"):
        qt = Q.pack_q4(qt)
    return qt


def check_linear_int8(results, rng):
    """int8-MXU compute conformance: the Pallas kernel's s8xs8->s32 path
    (in-VMEM weight requant + per-row activation quant) vs the XLA
    emulation of the SAME arithmetic (ops/linear._int8_emulated_dot) —
    so the comparison isolates Mosaic lowering defects, not quantization
    error. Covers every kind x epilogue x shape, the pre-quantized
    activation path, in-kernel int8 emission, and records whether int8
    actually engaged (ragged-lane shapes fall back to bf16 compute —
    asserted, not assumed)."""
    import jax.numpy as jnp
    from embeddings_tpu.models.bert import layer_norm
    from embeddings_tpu.ops.linear import (ActQ, _int8_emulated_dot,
                                           quantize_act)
    from embeddings_tpu.ops.quant import dequantize

    for K, N in SHAPES:
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        wf = rng.standard_normal((K, N)).astype(np.float32) * 0.05
        b = jnp.asarray(rng.standard_normal(N), jnp.float32)
        res = jnp.asarray(rng.standard_normal((M, N)), jnp.bfloat16)
        ones = jnp.ones((N,), jnp.float32)
        zer = jnp.zeros((N,), jnp.float32)
        xq = quantize_act(x)
        for kind in KINDS:
            if kind.endswith("-packed") and K % 64:
                print(f"skip packed int8 check for K={K} (K % 64 != 0)")
                continue
            qt = _quantize(wf, kind)
            packed = kind.endswith("-packed")
            engages = QM.int8_engages(K, N, 256, packed)
            engages_res = QM.int8_engages(K, N, 256, packed,
                                          with_residual=True)
            emits = QM.emit_fits(K, N, 256, packed, int8=True)
            wd = dequantize(qt).astype(jnp.float32)

            def emu(x_in, op):
                y = _int8_emulated_dot(x_in, wd)
                if op == "res_ln":
                    return layer_norm(y + b + res.astype(jnp.float32),
                                      ones, zer, 1e-12)
                y = y + b
                if op == "gelu":
                    # kernel epilogue uses the tanh form (qmatmul.py)
                    y = jax.nn.gelu(y, approximate=True)
                return y

            cases = [("int8", x, "plain", engages),
                     ("int8", x, "gelu", engages),
                     ("int8", x, "res_ln", engages_res),
                     ("int8-prequant", xq, "plain", engages),
                     ("int8-prequant", xq, "res_ln", engages_res)]
            for mode, x_in, op, engaged in cases:
                prequant = isinstance(x_in, ActQ)
                if prequant and not engaged:
                    continue  # consuming int8 x requires the int8 kernel
                kw = dict(kind=kind.split("-")[0], packed=packed,
                          int8_compute=True, bm=256,
                          out_dtype=jnp.float32)
                if prequant:
                    kw.update(x_scale=xq.s)
                if op == "res_ln":
                    if QM._pick_bn(K, N, 256, None, True, packed,
                                   int8=True) < N:
                        continue
                    kw.update(epilogue="bias_residual_ln", residual=res,
                              ln_scale=ones, ln_bias=zer, ln_eps=1e-12)
                elif op == "gelu":
                    kw.update(epilogue="bias_gelu")
                got = np.asarray(QM.qmatmul(
                    xq.q if prequant else x, qt.codes, qt.scales,
                    qt.mins, b, **kw), np.float32)
                ref = np.asarray(jax.jit(
                    lambda: emu(x_in, op))(), np.float32)
                tol = _tolerance(ref)
                if not engaged:
                    # bf16 fallback path: arithmetic differs from the
                    # int8 emulation by the quantization error itself
                    tol = max(tol, 0.06 * float(np.abs(ref).max()))
                err = float(np.abs(got - ref).max())
                results.append({"op": f"linear/{op}", "kind": kind,
                                "mode": mode, "K": K, "N": N,
                                "int8_engaged": bool(engaged),
                                "max_abs_err": err, "tol": round(tol, 4),
                                "ok": bool(err <= tol)})
                print(json.dumps(results[-1]), flush=True)

        # in-kernel emission conformance (q4_0-packed is the production
        # storage): emitted int8+scale must reconstruct the dense output
        # within one emitted-int8 step, and the scale must be the row
        # absmax / 127
        emits = QM.emit_fits(K, N, 256, True, int8=True)
        if K % 64 == 0 and emits and QM.int8_engages(K, N, 256, True):
            qt = _quantize(wf, "q4_0-packed")
            o, o8, osc = QM.qmatmul(
                xq.q, qt.codes, qt.scales, qt.mins, b, kind="q4_0",
                packed=True, int8_compute=True, bm=256, x_scale=xq.s,
                emit_quantized="both", out_dtype=jnp.float32)
            o, o8, osc = (np.asarray(o, np.float32),
                          np.asarray(o8), np.asarray(osc))
            rec_err = float(np.abs(o8.astype(np.float32) * osc - o).max())
            smax = float(np.abs(o).max()) / 127.0
            sc_err = float(np.abs(
                osc[:, 0] - np.abs(o).max(-1) / 127.0).max())
            ok = rec_err <= 1.02 * float(osc.max()) and sc_err <= 1e-5
            results.append({"op": "linear/emit", "kind": "q4_0-packed",
                            "mode": "int8-prequant", "K": K, "N": N,
                            "int8_engaged": True, "max_abs_err": rec_err,
                            "tol": round(1.02 * float(osc.max()), 5),
                            "ok": bool(ok)})
            print(json.dumps(results[-1]), flush=True)


def check_linear(results, rng):
    for K, N in SHAPES:
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
        b = jnp.asarray(rng.standard_normal(N), jnp.float32)
        res = jnp.asarray(rng.standard_normal((M, N)), jnp.bfloat16)
        ones = jnp.ones((N,), jnp.float32)
        zer = jnp.zeros((N,), jnp.float32)
        for kind in KINDS:
            if kind.endswith("-packed") and K % 64:
                print(f"skip packed check for K={K} (K % 64 != 0)")
                continue
            qt = _quantize(w, kind)
            for op in ("plain", "gelu", "res_ln"):
                def run(mode):
                    with pallas_mode(mode):
                        if op == "res_ln":
                            return linear_residual_ln(
                                x, qt, b, res, ones, zer, 1e-12)
                        return linear(x, qt, b,
                                      act="gelu" if op == "gelu" else None)
                got = np.asarray(jax.jit(lambda: run("always"))(),
                                 np.float32)
                ref = np.asarray(jax.jit(lambda: run("never"))(),
                                 np.float32)
                tol = _tolerance(ref)
                err = float(np.abs(got - ref).max())
                results.append({"op": f"linear/{op}", "kind": kind,
                                "K": K, "N": N, "max_abs_err": err,
                                "tol": round(tol, 4),
                                "ok": bool(err <= tol)})
                print(json.dumps(results[-1]), flush=True)


def check_attention(results, rng):
    B, L, H, D = 16, 256, 12, 64
    E = H * D
    qkv = jnp.asarray(rng.standard_normal((B * L, 3 * E)) * 0.3,
                      jnp.bfloat16)
    lengths = jnp.asarray(
        np.clip(rng.integers(8, L + 1, B), 8, L), jnp.int32)

    got = np.asarray(A.fused_attention(qkv, lengths, B=B, L=L, H=H, D=D),
                     np.float32)
    # einsum reference with the same mask semantics
    q = np.asarray(qkv[:, :E], np.float32).reshape(B, L, H, D)
    k = np.asarray(qkv[:, E:2 * E], np.float32).reshape(B, L, H, D)
    v = np.asarray(qkv[:, 2 * E:], np.float32).reshape(B, L, H, D)
    mask = np.arange(L)[None, :] < np.asarray(lengths)[:, None]
    s = np.einsum("blhd,bmhd->bhlm", q, k) / np.sqrt(D)
    s = np.where(mask[:, None, None, :], s, -1e9)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhlm,bmhd->blhd", p, v).reshape(B * L, E)
    valid = mask.reshape(B * L)
    err = float(np.abs(got[valid] - ref[valid]).max())
    results.append({"op": "fused_attention", "kind": "bf16", "K": L,
                    "N": E, "max_abs_err": err,
                    "ok": bool(err < 3e-2)})
    print(json.dumps(results[-1]), flush=True)

    # int8-scores mode (q/k/v and the emitted probabilities all int8 on
    # the MXU): shipped OFF (2.07x slower on chip, attention_cost.json)
    # but the numerics contract still gets silicon coverage — p carries
    # int8 resolution, so the tolerance is wider than bf16's
    goti = np.asarray(A.fused_attention(qkv, lengths, B=B, L=L, H=H,
                                        D=D, int8_scores=True),
                      np.float32)
    err = float(np.abs(goti[valid] - ref[valid]).max())
    gn = goti[valid] / np.maximum(
        np.linalg.norm(goti[valid], axis=-1, keepdims=True), 1e-9)
    rn = ref[valid] / np.maximum(
        np.linalg.norm(ref[valid], axis=-1, keepdims=True), 1e-9)
    cos = float((gn * rn).sum(-1).min())
    results.append({"op": "fused_attention_int8_scores", "kind": "int8",
                    "K": L, "N": E, "max_abs_err": err, "min_cos": cos,
                    "ok": bool(err < 8e-2 and cos > 0.999)})
    print(json.dumps(results[-1]), flush=True)

    # segmented + windowed on identical packed segments
    seg = np.full((B, L), -1, np.int32)
    for bi in range(B):
        off = 0
        si = 0
        while off < L - 6:
            n = min(int(rng.integers(8, 100)), L - off)
            seg[bi, off:off + n] = si
            off += n
            si += 1
    segj = jnp.asarray(seg)
    full = np.asarray(A.fused_attention_segmented(
        qkv, segj, B=B, L=L, H=H, D=D), np.float32)
    win = np.asarray(A.fused_attention_segmented_blockskip(
        qkv, segj, B=B, L=L, H=H, D=D, window=2), np.float32)
    validm = (seg >= 0).reshape(B * L)
    err = float(np.abs(win[validm] - full[validm]).max())
    results.append({"op": "segmented_vs_windowed", "kind": "bf16",
                    "K": L, "N": E, "max_abs_err": err,
                    "ok": bool(err < 3e-2)})
    print(json.dumps(results[-1]), flush=True)

    # bias kernel (MPNet relative position bias): whole-row grid at
    # L=256 and the blocked-query bias grid (Lq=128) at L=512
    for Bb, Lb in ((B, 256), (4, 512)):
        qkvb = jnp.asarray(rng.standard_normal((Bb * Lb, 3 * E)) * 0.3,
                           jnp.bfloat16)
        lensb = jnp.asarray(np.clip(rng.integers(8, Lb + 1, Bb), 8, Lb),
                            jnp.int32)
        bias_hll = (rng.standard_normal((H, Lb, Lb)) * 2.0).astype(
            np.float32)
        bias4 = A.prepare_attention_bias(jnp.asarray(bias_hll)[None], Lb)
        gotb = np.asarray(A.fused_attention_bias(
            qkvb, lensb, bias4, B=Bb, L=Lb, H=H, D=D), np.float32)
        qb = np.asarray(qkvb[:, :E], np.float32).reshape(Bb, Lb, H, D)
        kb = np.asarray(qkvb[:, E:2 * E], np.float32).reshape(Bb, Lb, H, D)
        vb = np.asarray(qkvb[:, 2 * E:], np.float32).reshape(Bb, Lb, H, D)
        maskb = np.arange(Lb)[None, :] < np.asarray(lensb)[:, None]
        s = np.einsum("blhd,bmhd->bhlm", qb, kb) / np.sqrt(D)
        s = s + bias_hll[None]
        s = np.where(maskb[:, None, None, :], s, -1e9)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        refb = np.einsum("bhlm,bmhd->blhd", p, vb).reshape(Bb * Lb, E)
        validb = maskb.reshape(Bb * Lb)
        err = float(np.abs(gotb[validb] - refb[validb]).max())
        results.append({"op": "fused_attention_bias", "kind": "bf16",
                        "K": Lb, "N": E, "max_abs_err": err,
                        "ok": bool(err < 3e-2)})
        print(json.dumps(results[-1]), flush=True)

    # streaming-KV family (long-context path): plain stream at the two
    # BK choices, banded window, in-kernel ALiBi, and causal — each at a
    # shape that actually streams (L=2048 is past the whole-row ceiling)
    def stream_ref(qkvx, lensx, Bx, Lx, window=0, slopes=None,
                   causal=False):
        qx = np.asarray(qkvx[:, :E], np.float32).reshape(Bx, Lx, H, D)
        kx = np.asarray(qkvx[:, E:2 * E], np.float32).reshape(Bx, Lx, H, D)
        vx = np.asarray(qkvx[:, 2 * E:], np.float32).reshape(Bx, Lx, H, D)
        pos = np.arange(Lx)
        okx = (pos[None, None, :] < np.asarray(lensx)[:, None, None]
               ) & np.ones((1, Lx, 1), bool)
        if window:
            okx = okx & (np.abs(pos[:, None] - pos[None, :]) <= window // 2)
        if causal:
            okx = okx & (pos[None, :] <= pos[:, None])
        s = np.einsum("blhd,bmhd->bhlm", qx, kx) / np.sqrt(D)
        if slopes is not None:
            s = s - (np.asarray(slopes)[None, :, None, None]
                     * np.abs(pos[:, None] - pos[None, :])[None, None])
        s = np.where(okx[:, None], s, -1e9)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= np.maximum(p.sum(-1, keepdims=True), 1e-30)
        return np.einsum("bhlm,bmhd->blhd", p, vx).reshape(Bx * Lx, E)

    from embeddings_tpu.ops.alibi import alibi_slopes
    Bs, Ls = 2, 2048
    qkvs = jnp.asarray(rng.standard_normal((Bs * Ls, 3 * E)) * 0.3,
                       jnp.bfloat16)
    lenss = jnp.asarray([Ls, Ls - 301], jnp.int32)
    stream_cases = [
        ("fused_attention_stream_bk512",
         lambda: A.fused_attention_stream(qkvs, lenss, B=Bs, L=Ls, H=H,
                                          D=D, BK=512), {}),
        ("fused_attention_stream_bk256",
         lambda: A.fused_attention_stream(qkvs, lenss, B=Bs, L=Ls, H=H,
                                          D=D, BK=256), {}),
        ("fused_attention_window128",
         lambda: A.fused_attention_window(qkvs, lenss, B=Bs, L=Ls, H=H,
                                          D=D, window=128),
         dict(window=128)),
        ("fused_attention_stream_alibi",
         lambda: A.fused_attention_stream(
             qkvs, lenss, B=Bs, L=Ls, H=H, D=D, BK=512,
             alibi_slopes=tuple(alibi_slopes(H))),
         dict(slopes=alibi_slopes(H))),
        ("fused_attention_stream_causal",
         lambda: A.fused_attention_stream(qkvs, lenss, B=Bs, L=Ls, H=H,
                                          D=D, BK=512, causal=True),
         dict(causal=True)),
    ]
    validh = (np.arange(Ls)[None, :]
              < np.asarray(lenss)[:, None]).reshape(Bs * Ls)
    for op, fn, refkw in stream_cases:
        gots = np.asarray(fn(), np.float32)
        refs = stream_ref(qkvs, lenss, Bs, Ls, **refkw)
        err = float(np.abs(gots[validh] - refs[validh]).max())
        results.append({"op": op, "kind": "bf16", "K": Ls, "N": E,
                        "max_abs_err": err, "ok": bool(err < 3e-2)})
        print(json.dumps(results[-1]), flush=True)

    # Qwen2-shaped causal stream: D=128 — exactly at the D <= LANE
    # boundary (ops/attention.py) — with GQA head sharing (n_rep=6,
    # gte-Qwen2-1.5B geometry H=12, KV=2): k/v repeat happens outside
    # the kernel (models/bert.py attention_context), so the kernel sees
    # repeated heads; the reference here mirrors that construction from
    # the 2 true KV heads to catch head-indexing bugs, not just D=128
    Hq, Hkv, Dq = 12, 2, 128
    Eq = Hq * Dq
    Bq, Lq = 2, 2048
    qh = rng.standard_normal((Bq, Lq, Hq, Dq)).astype(np.float32) * 0.3
    kh = rng.standard_normal((Bq, Lq, Hkv, Dq)).astype(np.float32) * 0.3
    vh = rng.standard_normal((Bq, Lq, Hkv, Dq)).astype(np.float32) * 0.3
    rep = Hq // Hkv
    kfull = np.repeat(kh, rep, axis=2)  # HF repeat_kv order
    vfull = np.repeat(vh, rep, axis=2)
    qkvq = jnp.asarray(np.concatenate(
        [qh.reshape(Bq, Lq, Eq), kfull.reshape(Bq, Lq, Eq),
         vfull.reshape(Bq, Lq, Eq)], -1).reshape(Bq * Lq, 3 * Eq),
        jnp.bfloat16)
    lensq = jnp.asarray([Lq, Lq - 301], jnp.int32)
    gotq = np.asarray(A.fused_attention_stream(
        qkvq, lensq, B=Bq, L=Lq, H=Hq, D=Dq, BK=512, causal=True),
        np.float32)
    qf = np.asarray(jnp.asarray(qh, jnp.bfloat16), np.float32)
    kf = np.asarray(jnp.asarray(kfull, jnp.bfloat16), np.float32)
    vf = np.asarray(jnp.asarray(vfull, jnp.bfloat16), np.float32)
    pos = np.arange(Lq)
    okq = ((pos[None, None, :] < np.asarray(lensq)[:, None, None])
           & (pos[None, :, None] >= pos[None, None, :]))
    s = np.einsum("blhd,bmhd->bhlm", qf, kf) / np.sqrt(Dq)
    s = np.where(okq[:, None], s, -1e9)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= np.maximum(p.sum(-1, keepdims=True), 1e-30)
    refq = np.einsum("bhlm,bmhd->blhd", p, vf).reshape(Bq * Lq, Eq)
    validq = (pos[None, :] < np.asarray(lensq)[:, None]).reshape(Bq * Lq)
    err = float(np.abs(gotq[validq] - refq[validq]).max())
    results.append({"op": "fused_attention_stream_causal_qwen2_d128",
                    "kind": "bf16", "K": Lq, "N": Eq,
                    "max_abs_err": err, "ok": bool(err < 3e-2)})
    print(json.dumps(results[-1]), flush=True)

    # CP kernel: local-query/global-KV (the sp=4 shard shape at L=512)
    Bc, Lc, Lf = 8, 128, 512
    q2 = jnp.asarray(rng.standard_normal((Bc * Lc, E)) * 0.3, jnp.bfloat16)
    kv2 = jnp.asarray(rng.standard_normal((Bc * Lf, 2 * E)) * 0.3,
                      jnp.bfloat16)
    lens = jnp.asarray(np.clip(rng.integers(8, Lf + 1, Bc), 8, Lf),
                       jnp.int32)
    got_cp = np.asarray(A.fused_attention_cp(
        q2, kv2, lens, B=Bc, Lc=Lc, L=Lf, H=H, D=D), np.float32)
    qf = np.asarray(q2, np.float32).reshape(Bc, Lc, H, D)
    kf = np.asarray(kv2, np.float32).reshape(Bc, Lf, 2 * E)
    kh2 = kf[..., :E].reshape(Bc, Lf, H, D)
    vh2 = kf[..., E:].reshape(Bc, Lf, H, D)
    s = np.einsum("blhd,bmhd->bhlm", qf, kh2) / np.sqrt(D)
    km = np.arange(Lf)[None, :] < np.asarray(lens)[:, None]
    s = np.where(km[:, None, None, :], s, -1e9)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref_cp = np.einsum("bhlm,bmhd->blhd", p, vh2).reshape(Bc * Lc, E)
    err = float(np.abs(got_cp - ref_cp).max())
    results.append({"op": "fused_attention_cp", "kind": "bf16", "K": Lf,
                    "N": E, "max_abs_err": err,
                    "ok": bool(err < 3e-2)})
    print(json.dumps(results[-1]), flush=True)

    # CP streaming kernel at a past-the-whole-row-ceiling shape (the
    # per-shard shape an sp-mesh dispatches at long L)
    Bc2, Lc2, Lf2 = 1, 256, 2048
    q3 = jnp.asarray(rng.standard_normal((Bc2 * Lc2, E)) * 0.3,
                     jnp.bfloat16)
    kv3 = jnp.asarray(rng.standard_normal((Bc2 * Lf2, 2 * E)) * 0.3,
                      jnp.bfloat16)
    lens3 = jnp.asarray([Lf2 - 301], jnp.int32)
    got_cps = np.asarray(A.fused_attention_cp_stream(
        q3, kv3, lens3, B=Bc2, Lc=Lc2, L=Lf2, H=H, D=D, BK=512),
        np.float32)
    qf3 = np.asarray(q3, np.float32).reshape(Bc2, Lc2, H, D)
    kf3 = np.asarray(kv3, np.float32).reshape(Bc2, Lf2, 2 * E)
    kh3 = kf3[..., :E].reshape(Bc2, Lf2, H, D)
    vh3 = kf3[..., E:].reshape(Bc2, Lf2, H, D)
    s = np.einsum("blhd,bmhd->bhlm", qf3, kh3) / np.sqrt(D)
    km3 = np.arange(Lf2)[None, :] < np.asarray(lens3)[:, None]
    s = np.where(km3[:, None, None, :], s, -1e9)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref_cps = np.einsum("bhlm,bmhd->blhd", p, vh3).reshape(Bc2 * Lc2, E)
    err = float(np.abs(got_cps - ref_cps).max())
    results.append({"op": "fused_attention_cp_stream", "kind": "bf16",
                    "K": Lf2, "N": E, "max_abs_err": err,
                    "ok": bool(err < 3e-2)})
    print(json.dumps(results[-1]), flush=True)


def main() -> int:
    only = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    results: list[dict] = []
    if only in ("all", "linear"):
        check_linear(results, rng)
    if only in ("all", "linear-int8"):
        check_linear_int8(results, np.random.default_rng(1))
    if only in ("all", "attention"):
        check_attention(results, rng)
    out = Path(__file__).parent / "results" / "tpu_kernel_parity.json"
    out.parent.mkdir(exist_ok=True)
    if only != "all" and out.exists():
        # partial rerun: replace the refreshed checks, keep the rest
        # (keyed per-check: the int8 section shares op names with the
        # bf16 section and must not clobber it)
        def _key(r):
            return (r["op"], r.get("kind"), r.get("mode", "bf16"),
                    r.get("K"), r.get("N"))
        prior = json.loads(out.read_text()).get("results", [])
        fresh = {_key(r) for r in results}
        results = [r for r in prior if _key(r) not in fresh] + results
    bad = [r for r in results if not r["ok"]]
    out.write_text(json.dumps(
        {"chip": str(jax.devices()[0]), "M": M,
         "checks": len(results), "failures": len(bad),
         "results": results}, indent=1))
    print(f"{len(results) - len(bad)}/{len(results)} checks pass; "
          f"wrote {out}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
