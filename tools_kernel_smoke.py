#!/usr/bin/env python
"""On-TPU kernel compile smoke: lower + Mosaic-compile every dispatched Pallas
kernel at every dispatched shape class BEFORE any bench runs.

Motivation (VERDICT r2 weak #2): the kernel zoo is parity-tested in interpret
mode, which skips Mosaic verification — commit aa8e852 fixed a Mosaic
verification failure (bf16->f32 vector.broadcast on an N=1 dot) that only
surfaced on real hardware. This tool makes that class of failure un-shippable:
`bench.py` invokes it first and fails loudly if any dispatched kernel does not
compile on the real backend.

Weights are passed as jit ARGUMENTS (lowering uses avals only — nothing is
shipped to the remote compiler, so even the 8B 656 MB lm head costs nothing).

  python tools_kernel_smoke.py                 # all kernels, tiny+8b shapes
  python tools_kernel_smoke.py --preset tiny   # one model's shape classes
"""

from __future__ import annotations

import argparse
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


MODELS = {
    "tiny": dict(D=2048, H=32, Hkv=4, hd=64, F=5632, V=32000),
    "8b": dict(D=4096, H=32, Hkv=8, hd=128, F=14336, V=128256),
}


# -- synthetic packed QTensors (repack.py layouts, random codes; bit patterns
#    don't affect lowering) -------------------------------------------------

def mk_q4(N, K, rng):
    import ml_dtypes

    qs = rng.integers(0, 256, (K // 2, N), dtype=np.uint8)
    s = (rng.random((K // 32, N), dtype=np.float32) * 0.01)
    m = (rng.random((K // 32, N), dtype=np.float32) * 0.01)
    sb = s.astype(ml_dtypes.bfloat16).view(np.uint16).astype(np.uint32)
    mb = m.astype(ml_dtypes.bfloat16).view(np.uint16).astype(np.uint32)
    return QTensor("q4", "kmajor", (N, K), {
        "qs": jnp.asarray(qs),
        "sm": jnp.asarray((sb | (mb << 16)).view(np.float32))})


def mk_q6w(N, K, rng):
    qs = rng.integers(-32, 32, (K, N)).astype(np.int8)
    scales = rng.random((K // 16, N), dtype=np.float32) * 0.01
    return QTensor("q6w", "kmajor", (N, K), {
        "qs": jnp.asarray(qs), "scales": jnp.asarray(scales.astype(np.float32))})


def mk_q6(N, K, rng):
    """int8-MXU path layout: q6 with separate qh plane (quant/repack)."""
    qs = rng.integers(0, 256, (K // 2, N), dtype=np.uint8)
    qh = rng.integers(0, 256, (K // 4, N), dtype=np.uint8)
    scales = rng.random((K // 16, N), dtype=np.float32) * 0.01
    return QTensor("q6", "kmajor", (N, K), {
        "qs": jnp.asarray(qs), "qh": jnp.asarray(qh),
        "scales": jnp.asarray(scales.astype(np.float32))})


def _flat(qt: QTensor):
    keys = tuple(sorted(qt.arrays))
    return keys, tuple(qt.arrays[k] for k in keys)


def _rebuild(qt: QTensor, keys, arrs):
    return QTensor(qt.kind, qt.layout, qt.shape, dict(zip(keys, arrs)))


def compile_case(name: str, fn, args, results: list) -> bool:
    t0 = time.time()
    try:
        jax.jit(fn).lower(*args).compile()
        dt = time.time() - t0
        log(f"  ok   {name:44s} {dt:6.1f}s")
        results.append({"case": name, "ok": True, "secs": round(dt, 1)})
        return True
    except Exception as e:
        dt = time.time() - t0
        msg = f"{type(e).__name__}: {e}"
        log(f"  FAIL {name:44s} {dt:6.1f}s\n       {msg[:500]}")
        results.append({"case": name, "ok": False, "secs": round(dt, 1),
                        "error": msg[:1000]})
        return False


def smoke_model(preset: str, results: list, only: str = ""):
    m = MODELS[preset]
    D, H, Hkv, hd, F, V = m["D"], m["H"], m["Hkv"], m["hd"], m["F"], m["V"]
    rng = np.random.default_rng(0)

    wqk = mk_q4((H + Hkv) * hd, D, rng)
    wv = mk_q6w(Hkv * hd, D, rng)
    wo = mk_q4(D, H * hd, rng)
    gu = mk_q4(2 * F, D, rng)
    dn = mk_q6w(D, F, rng)
    head = mk_q6w(V, D, rng)

    norm_w = jnp.ones((D,), jnp.float32)

    def sel(n):
        return (not only) or (only in n)

    log(f"-- {preset} shape classes --")

    # fused attention-input megakernel (decode rows 1 and 4)
    from tpu_kquant.ops.pallas_attn_in import fused_attn_in, rope_tables_full

    for R in (1, 4):
        if not sel("attn_in"):
            break
        x = jnp.zeros((R, 1, D), jnp.bfloat16)
        cos = jnp.ones((R, 1, hd), jnp.float32)
        sin = jnp.zeros((R, 1, hd), jnp.float32)
        cf, sf = rope_tables_full(cos, sin, H + Hkv, hd, n_pad=0)
        k1, a1 = _flat(wqk)
        k2, a2 = _flat(wv)

        def f(x, cf, sf, a1, a2):
            return fused_attn_in(x, norm_w, 1e-5,
                                 [_rebuild(wqk, k1, a1), _rebuild(wv, k2, a2)],
                                 cf, sf, hd // 2)

        compile_case(f"attn_in R={R} {preset}", f, (x, cf, sf, a1, a2), results)

    # fused o_proj+FFN and FFN megakernels
    from tpu_kquant.ops.pallas_ffn import fused_ffn, fused_oproj_ffn

    for R in (1, 4):
        if not sel("ffn"):
            break
        x = jnp.zeros((R, D), jnp.bfloat16)
        attn = jnp.zeros((R, H * hd), jnp.bfloat16)
        ko, ao = _flat(wo)
        kg, ag = _flat(gu)
        kd, ad = _flat(dn)

        def f_of(x, attn, ao, ag, ad):
            return fused_oproj_ffn(x, attn, _rebuild(wo, ko, ao), norm_w, 1e-5,
                                   _rebuild(gu, kg, ag), _rebuild(dn, kd, ad))

        def f_ffn(x, ag, ad):
            return fused_ffn(x, norm_w, 1e-5,
                             _rebuild(gu, kg, ag), _rebuild(dn, kd, ad))

        compile_case(f"oproj_ffn R={R} {preset}", f_of,
                     (x, attn, ao, ag, ad), results)
        compile_case(f"ffn R={R} {preset}", f_ffn, (x, ag, ad), results)

    # lm head + generic qmm at decode and prefill rows
    from tpu_kquant.ops.pallas_qmm import qmm_pallas

    kh, ah = _flat(head)
    for R in (1, 512):
        if not sel("qmm"):
            break
        x = jnp.zeros((R, D), jnp.bfloat16)

        def f_head(x, ah):
            return qmm_pallas(x, _rebuild(head, kh, ah), out_dtype=jnp.float32)

        compile_case(f"qmm head q6w R={R} {preset}", f_head, (x, ah), results)
        if R > 1:
            kg, ag = _flat(gu)

            def f_gu(x, ag):
                return qmm_pallas(x, _rebuild(gu, kg, ag),
                                  out_dtype=jnp.bfloat16)

            compile_case(f"qmm gateup q4 R={R} {preset}", f_gu, (x, ag),
                         results)

    # int8-MXU qmm
    from tpu_kquant.ops.pallas_qmm_int8 import qmm_int8

    if sel("int8"):
        x = jnp.zeros((1, D), jnp.bfloat16)
        q6t = mk_q6(V, D, rng)
        k6, a6 = _flat(q6t)

        def f_i8(x, a6):
            return qmm_int8(x, _rebuild(q6t, k6, a6), out_dtype=jnp.float32)

        compile_case(f"qmm_int8 q6 head {preset}", f_i8, (x, a6), results)

    # flash decode attention, bf16 + int8 scales, bench-regime S
    from tpu_kquant.ops.pallas_attention import attention_decode_pallas

    # int8-KV needs S % 256 == 0 (ops.attention dispatch gate; this smoke
    # case at S=704 caught the violation before the gate existed)
    for S, quant in ((704, False), (768, True), (4096, False), (4096, True)):
        if not sel("decode attn"):
            break
        B = 1
        kc_dt = jnp.int8 if quant else jnp.bfloat16
        q = jnp.zeros((B, 1, H, hd), jnp.bfloat16)
        kc = jnp.zeros((B, Hkv, S, hd), kc_dt)
        vc = jnp.zeros((B, Hkv, S, hd), kc_dt)
        pos = jnp.full((B, 1), S - 2, jnp.int32)
        scales = ((jnp.ones((B, Hkv, S), jnp.float32),) * 2 if quant else None)

        def f_at(q, kc, vc, pos):
            return attention_decode_pallas(q, kc, vc, pos, scales)

        compile_case(f"decode attn S={S} int8={quant} {preset}", f_at,
                     (q, kc, vc, pos), results)

    # flash prefill attention
    from tpu_kquant.ops.pallas_prefill import attention_prefill_pallas

    for T, S, win in ((512, 704, 0), (512, 704, 256)):
        if not sel("prefill attn"):
            break
        B = 1
        q = jnp.zeros((B, T, H, hd), jnp.bfloat16)
        kc = jnp.zeros((B, Hkv, S, hd), jnp.bfloat16)
        vc = jnp.zeros((B, Hkv, S, hd), jnp.bfloat16)
        qs = jnp.zeros((B,), jnp.int32)

        def f_pf(q, kc, vc, qs):
            return attention_prefill_pallas(q, kc, vc, qs,
                                            sliding_window=win)

        compile_case(f"prefill attn T={T} S={S} win={win} {preset}", f_pf,
                     (q, kc, vc, qs), results)

    # rotated layer boundary: oproj+FFN+next-layer attn_in in one launch
    from tpu_kquant.ops.pallas_attn_in import rope_tables_full
    from tpu_kquant.ops.attic.pallas_rot import fused_oproj_ffn_attn_in

    for R in (1, 4):
        if not sel("rot"):
            break
        x = jnp.zeros((R, 1, D), jnp.bfloat16)
        attn = jnp.zeros((R, 1, H * hd), jnp.bfloat16)
        cos = jnp.ones((R, 1, hd // 2), jnp.float32)
        sin = jnp.zeros((R, 1, hd // 2), jnp.float32)
        cf, sf = rope_tables_full(cos, sin, H + Hkv, hd, n_pad=0)
        ws2 = [wqk, wv]
        ko, ao = _flat(wo)
        kg, ag = _flat(gu)
        kd, ad = _flat(dn)
        k1, a1 = _flat(wqk)
        k2, a2 = _flat(wv)

        def f_rot(x, attn, cf, sf, ao, ag, ad, a1, a2):
            return fused_oproj_ffn_attn_in(
                x, attn, _rebuild(wo, ko, ao), norm_w, 1e-5,
                _rebuild(gu, kg, ag), _rebuild(dn, kd, ad), norm_w,
                [_rebuild(wqk, k1, a1), _rebuild(wv, k2, a2)],
                cf, sf, hd // 2)

        compile_case(f"rot_layer R={R} {preset}", f_rot,
                     (x, attn, cf, sf, ao, ag, ad, a1, a2), results)

    # whole-layer kernel (off by default — smoke so the opt-in path compiles)
    from tpu_kquant.ops.pallas_layer import fused_layer, layer_supported

    if sel("fused_layer") and layer_supported(wqk, wv, wo, gu, dn, 1, D, H,
                                              Hkv, hd):
        B, S = 1, 704
        x = jnp.zeros((B, 1, D), jnp.bfloat16)
        pos = jnp.full((B, 1), S - 2, jnp.int32)
        cos = jnp.ones((B, 1, hd // 2), jnp.float32)
        sin = jnp.zeros((B, 1, hd // 2), jnp.float32)
        kc = jnp.zeros((B, Hkv, S, hd), jnp.bfloat16)
        vc = jnp.zeros((B, Hkv, S, hd), jnp.bfloat16)
        flats = [_flat(w) for w in (wqk, wv, wo, gu, dn)]

        def f_wl(x, pos, cos, sin, kc, vc, *arrs):
            qts = []
            i = 0
            for (keys, _), w in zip(flats, (wqk, wv, wo, gu, dn)):
                qts.append(_rebuild(w, keys, arrs[i:i + len(keys)]))
                i += len(keys)
            return fused_layer(x, pos, norm_w, norm_w, 1e-5, *qts, cos, sin,
                               kc, vc, H, Hkv)

        all_arrs = tuple(a for _, arrs in flats for a in arrs)
        compile_case(f"fused_layer S={S} {preset}", f_wl,
                     (x, pos, cos, sin, kc, vc) + all_arrs, results)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="all", choices=["all", "tiny", "8b"])
    ap.add_argument("--only", default="", help="substring filter on case names")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    log(f"kernel smoke on: {jax.devices()}")
    results: list = []
    t0 = time.time()
    presets = ["tiny", "8b"] if args.preset == "all" else [args.preset]
    for p in presets:
        smoke_model(p, results, only=args.only)
    n_fail = sum(1 for r in results if not r["ok"])
    log(f"kernel smoke: {len(results) - n_fail}/{len(results)} compiled "
        f"in {time.time() - t0:.0f}s")
    if args.json_out:
        import json

        Path(args.json_out).write_text(json.dumps(results, indent=1))
    if n_fail:
        log("KERNEL SMOKE FAILED — do not trust bench/deploy until fixed")
        sys.exit(1)


if __name__ == "__main__":
    main()
