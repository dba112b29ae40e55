#!/usr/bin/env python
"""Per-kernel attribution on real TPU hardware: time each Pallas kernel of the
decode/prefill path in isolation at exact model shapes (TinyLlama-1.1B and
Llama-3-8B Q4_K_M inventories) and report achieved HBM GB/s and MXU fraction
against the v5e roofline (819 GB/s, 197 bf16 TFLOP/s).

This is the TPU analog of the reference's per-instruction hot-loop attribution
(its perf-annotate + llvm-mca tables): where the ablation tool attributes the
fused decode step end-to-end, this tool pins each pallas_call's own achieved
bandwidth so the residual-vs-roofline gap is attributable per kernel.

Weights are synthesized with random codes directly in the packed layouts
(quant/repack.py conventions) — bit patterns don't affect kernel speed, so no
fixture/quantization pass is needed.

Each measurement chains N_ITER kernel invocations inside ONE jitted lax.scan
dispatch (the tunneled dev TPU adds ~22 ms per dispatch; chaining amortizes
it to noise) with a data dependency through the activation to defeat CSE/DCE.

  python tools_kernel_bench.py --model 8b --phase decode
  python tools_kernel_bench.py --model tiny --phase prefill --rows 512
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".cache" / "jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from tpu_kquant.quant.qtensor import QTensor

HBM_GBS = 819.0
MXU_TFLOPS = 197.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# synthetic packed QTensors (exact repack.py layouts, random codes)
# ---------------------------------------------------------------------------


def mk_q4(N: int, K: int, rng, sm: bool = True) -> QTensor:
    qs = rng.integers(0, 256, (K // 2, N), dtype=np.uint8)
    arrays = {"qs": jnp.asarray(qs)}
    if sm:
        s = (rng.random((K // 32, N), dtype=np.float32) * 0.01).astype(np.float32)
        m = (rng.random((K // 32, N), dtype=np.float32) * 0.01).astype(np.float32)
        import ml_dtypes

        sb = s.astype(ml_dtypes.bfloat16).view(np.uint16).astype(np.uint32)
        mb = m.astype(ml_dtypes.bfloat16).view(np.uint16).astype(np.uint32)
        arrays["sm"] = jnp.asarray((sb | (mb << 16)).view(np.float32))
    else:
        arrays["scales"] = jnp.asarray(rng.random((K // 32, N), dtype=np.float32) * 0.01)
        arrays["mins"] = jnp.asarray(rng.random((K // 32, N), dtype=np.float32) * 0.01)
    return QTensor("q4", "kmajor", (N, K), arrays)


def mk_q6w(N: int, K: int, rng, sp: bool = True) -> QTensor:
    """sp=True matches the bench model's loader layout (scale_dtype='bf16'
    packs adjacent-group bf16 scale pairs, quant.repack.pack_scale_kpairs)."""
    qs = rng.integers(-32, 32, (K, N)).astype(np.int8)
    scales = (rng.random((K // 16, N), dtype=np.float32) * 0.01).astype(np.float32)
    qt = QTensor("q6w", "kmajor", (N, K), {
        "qs": jnp.asarray(qs), "scales": jnp.asarray(scales)})
    if sp:
        from tpu_kquant.quant.repack import pack_scale_kpairs

        qt = pack_scale_kpairs(qt)
        qt = QTensor(qt.kind, qt.layout, qt.shape,
                     {k: jnp.asarray(v) for k, v in qt.arrays.items()})
    return qt


def qt_bytes(qt: QTensor) -> int:
    return sum(int(v.size) * v.dtype.itemsize for v in qt.arrays.values())


MODELS = {
    # dim, n_heads, n_kv, head_dim, ffn, vocab, n_layers
    "tiny": dict(D=2048, H=32, Hkv=4, hd=64, F=5632, V=32000, L=22),
    "8b": dict(D=4096, H=32, Hkv=8, hd=128, F=14336, V=128256, L=32),
}


# ---------------------------------------------------------------------------
# measurement harness: chain n_iter kernel calls in one dispatch
# ---------------------------------------------------------------------------


# harness lives in the package (utils.attribution) — this file is the CLI
from tpu_kquant.utils.attribution import (  # noqa: F401
    chain_length_for as n_for,
    kernel_report,
    time_chained,
)


def report_line(name: str, t: float, nbytes: int, flops: float = 0.0):
    return kernel_report(name, t, nbytes, flops, log=log)


def bench_decode(model: str, R: int, n_iter: int, results: list,
                 only: str = ""):
    """Each decode-path kernel at R rows (single-stream decode R=1)."""
    from tpu_kquant.ops.pallas_qmm import qmm_pallas

    def sel(name: str) -> bool:
        return (not only) or (only in name)

    m = MODELS[model]
    D, H, Hkv, hd, F, V = m["D"], m["H"], m["Hkv"], m["hd"], m["F"], m["V"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, D)), jnp.bfloat16)

    log(f"--- decode kernels, {model} shapes, R={R} ---")

    # wqk fused [H*hd + Hkv*hd, D] q4
    wqk = mk_q4((H + Hkv) * hd, D, rng)
    wv = mk_q6w(Hkv * hd, D, rng)
    wo = mk_q4(D, H * hd, rng)
    gu = mk_q4(2 * F, D, rng)
    dn = mk_q6w(D, F, rng)
    head = mk_q6w(V, D, rng)

    # Measure blocks that naturally return to the [R, D] residual shape:
    # attn-in (wqk+wv) via the fused kernel, o_proj+FFN via its megakernel,
    # the head via a reduction dependency. Dependency fold-back is a tiny
    # scaled sum (un-DCE-able, ~zero cost) added into the carry.
    from tpu_kquant.ops.pallas_attn_in import fused_attn_in, rope_tables_full
    from tpu_kquant.ops.pallas_ffn import fused_ffn, fused_oproj_ffn

    norm_w = jnp.ones((D,), jnp.float32)
    cos = jnp.ones((R, 1, hd), jnp.float32)
    sin = jnp.zeros((R, 1, hd), jnp.float32)
    cf, sf = rope_tables_full(cos, sin, H + Hkv, hd, n_pad=0)

    def dep(xc, y):
        return xc + (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(xc.dtype)

    def attn_in_fn(xc):
        x3 = xc[:, None, :]
        qk, vout = fused_attn_in(x3, norm_w, 1e-5, [wqk, wv], cf, sf, hd // 2)
        return dep(dep(xc, qk), vout)

    if sel("attn_in"):
        nb = qt_bytes(wqk) + qt_bytes(wv)
        fl = 2.0 * R * D * (H + 2 * Hkv) * hd
        t = time_chained(attn_in_fn, x, n_for(nb))
        results.append(report_line("attn_in (norm+qkv+rope)", t, nb, fl))

    attn = jnp.asarray(rng.standard_normal((R, H * hd)), jnp.bfloat16)

    def oproj_ffn_fn(xc):
        return fused_oproj_ffn(xc, attn, wo, norm_w, 1e-5, gu, dn)

    if sel("oproj"):
        nb = qt_bytes(wo) + qt_bytes(gu) + qt_bytes(dn)
        fl = 2.0 * R * D * (H * hd + 3 * F)
        t = time_chained(oproj_ffn_fn, x, n_for(nb))
        results.append(report_line("oproj+ffn megakernel", t, nb, fl))

    def ffn_fn(xc):
        return fused_ffn(xc, norm_w, 1e-5, gu, dn)

    if sel("ffn megakernel") or only == "ffn":
        nb = qt_bytes(gu) + qt_bytes(dn)
        fl = 2.0 * R * D * 3 * F
        t = time_chained(ffn_fn, x, n_for(nb))
        results.append(report_line("ffn megakernel", t, nb, fl))

    # lm head: y [R, V] reduced back into x; weights via aux (656 MB at 8B
    # — too large for the remote-compile request as a constant)
    hkeys = tuple(sorted(head.arrays))

    def head_fn(xc, aux):
        qt = QTensor(head.kind, head.layout, head.shape, dict(zip(hkeys, aux)))
        y = qmm_pallas(xc, qt, out_dtype=jnp.float32)
        return dep(xc, y)

    if sel("head"):
        nb = qt_bytes(head)
        fl = 2.0 * R * D * V
        t = time_chained(head_fn, x, n_for(nb), aux=tuple(head.arrays[k] for k in hkeys))
        results.append(report_line("lm head qmm", t, nb, fl))

    # flash decode attention at S=704 (the bench regime) and S=4096
    from tpu_kquant.ops.pallas_attention import attention_decode_pallas

    for S in ((704, 4096) if sel("attn S=") else ()):
        B = R
        k_cache = jnp.asarray(
            rng.standard_normal((B, Hkv, S, hd)), jnp.bfloat16)
        v_cache = jnp.asarray(
            rng.standard_normal((B, Hkv, S, hd)), jnp.bfloat16)
        pos = jnp.full((B, 1), S - 2, jnp.int32)
        q_dummy = jnp.asarray(
            rng.standard_normal((B, 1, H, hd)), jnp.bfloat16)

        def attn_fn(xc):
            q = q_dummy + xc[:, None, None, :hd]
            o = attention_decode_pallas(q, k_cache, v_cache, pos, None, None)
            return dep(xc, o)

        nb = 2 * B * Hkv * S * hd * 2
        t = time_chained(attn_fn, x, n_for(nb))
        results.append(report_line(f"flash decode attn S={S}", t, nb))


def bench_prefill(model: str, rows: int, n_iter: int, results: list,
                  tb: int = 256, tn: int = 0):
    """Prefill-shape qmm vs alternatives: is the kernel MXU-bound or
    VPU-dequant-bound at R=rows?"""
    from tpu_kquant.ops.pallas_qmm import qmm_pallas

    m = MODELS[model]
    D, F, V = m["D"], m["F"], m["V"]
    rng = np.random.default_rng(0)
    R = rows
    x = jnp.asarray(rng.standard_normal((R, D)), jnp.bfloat16)

    log(f"--- prefill qmm, {model} shapes, R={R}, tb={tb}, tn={tn or 'dflt'} ---")

    gu = mk_q4(2 * F, D, rng)

    def dep(xc, y):
        return xc + (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(xc.dtype)

    kw = {}
    if tn:
        kw["tn"] = tn

    def fn(xc):
        y = qmm_pallas(xc, gu, out_dtype=jnp.bfloat16, tb=tb, **kw)
        return dep(xc, y)

    fl = 2.0 * R * D * 2 * F
    n_iter = int(min(512, max(16, 0.05 / (fl / (MXU_TFLOPS * 1e12) + qt_bytes(gu) / (HBM_GBS * 1e9)))))
    t = time_chained(fn, x, n_iter)
    r = report_line(f"qmm q4 gateup R={R}", t, qt_bytes(gu), fl)
    r["note"] = f"tb={tb} tn={tn}"
    results.append(r)

    # alternative: dequant whole weight to bf16 (one pass) + XLA matmul
    from tpu_kquant.quant.jnp_codecs import dequant_kmajor

    def fn_dq(xc):
        w = dequant_kmajor(gu, dtype=jnp.bfloat16)  # [K, N] = [D, 2F]
        return dep(xc, xc @ w)

    try:
        t = time_chained(fn_dq, x, n_iter)
        results.append(report_line(f"dequant+XLA mm R={R}", t, qt_bytes(gu), fl))
    except Exception as e:
        log("dequant+XLA path failed:", e)

    # int8-MXU path (Q8_K activation quant + int8 dot)
    try:
        from tpu_kquant.ops.qmatmul import qmatmul

        def fn_i8(xc):
            y = qmatmul(xc[:, None, :], gu, "int8", out_dtype=jnp.bfloat16)
            return dep(xc, y)

        t = time_chained(fn_i8, x, n_iter)
        results.append(report_line(f"int8-MXU qmm R={R}", t, qt_bytes(gu), fl))
    except Exception as e:
        log("int8 path failed:", e)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="8b", choices=list(MODELS))
    ap.add_argument("--phase", default="decode", choices=["decode", "prefill"])
    ap.add_argument("--rows", type=int, default=1)
    ap.add_argument("--iters", type=int, default=0, help="chain length (auto)")
    ap.add_argument("--tb", type=int, default=256)
    ap.add_argument("--tn", type=int, default=0)
    ap.add_argument("--only", default="", help="substring filter on kernel names")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    log(f"devices: {jax.devices()}")
    results: list = []
    if args.phase == "decode":
        n_iter = args.iters or (64 if args.model == "8b" else 256)
        bench_decode(args.model, args.rows, n_iter, results, only=args.only)
    else:
        n_iter = args.iters or 16
        bench_prefill(args.model, args.rows, n_iter, results,
                      tb=args.tb, tn=args.tn)
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
