"""ROTATED layer boundary kernel — ATTIC (measured-negative, default OFF).

o_proj + residual + FFN + the NEXT layer's attn-in (norm -> QKV matmuls ->
rope) in ONE pallas launch. Benchmarked twice on the v5e (r3 and again on
the r4 MXU-mins chain) and never beat the composed fused_oproj_ffn +
fused_attn_in pair: rotated 63.4 us vs composed 58.6 standalone; tg128
581.6 +/- 6.9 vs 580.0 +/- 24.5 (wash). The ~5 us/launch it saves is repaid
by in-kernel HBM-efficiency loss — the third fusion experiment confirming
Mosaic launch overhead is NOT the decode bottleneck at these shapes.

Enable for re-measurement with TKQ_ROTATE_LAYER=1 (models.llama dispatches
through rot_enabled below). Parity: tests/test_pallas_rot.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_kquant.ops.pallas_attn_in import _VMEM_CHUNK_ELEMS, _VMEM_LIMIT, _cap_chunk
from tpu_kquant.ops.pallas_dequant import (
    fold_dot_mxu,
    group_scale_mul_sp,
    group_scale_mulsub,
    mxu_mins_enabled,
    q4_codes_word,
)
from tpu_kquant.ops.pallas_ffn import (
    _FLAT_KINDS,
    _decode_sm,
    _pick_tf,
    oproj_ffn_supported,
)
from tpu_kquant.quant.qtensor import QTensor
from tpu_kquant.quant.repack import GROUP_SIZE

# ---------------------------------------------------------------------------
# ROTATED layer boundary: o_proj + residual + FFN + NEXT layer's attn-in
# (norm -> QKV matmuls -> rope) in ONE launch
# ---------------------------------------------------------------------------
#
# Motivation (r3 attribution, v5e tiny shapes): the separate attn_in launch
# costs ~10.5 us for only 3.6 MB of weights (~41% HBM) — ~6 us of pure
# per-launch fixed cost, x22 layers = ~130 us/token. Folding attention itself
# into a weight-streaming kernel was measured twice to LOSE (README perf log);
# instead this kernel rotates the LAYER BOUNDARY: attention for layer i runs
# as XLA glue, and everything between two attentions — o_proj(i) + residual +
# FFN(i) + norm(i+1) + QKV(i+1) + rope — is one grid:
#
#   step j < nko:              acc_x += attn chunk_j @ Wo chunk_j
#   at j == nko-1:             x2 = x + acc_x
#   nko <= j < nko+nf:         the fused_ffn pipeline on x2 -> acc
#   at j == nko+nf-1:          y = x2 + acc  (written to o_ref AND x3 scratch)
#   nko+nf <= j:               acc2_i += norm2(y) chunk @ dequant(W2_i chunk)
#   last step:                 rope epilogue on acc2_0 (NEOX half-rotate)
#
# Every phase stays a pipelined weight-streaming step, so Mosaic overlaps the
# next phase's DMA with the current compute — the wqk q4 dequant (VPU-heavy)
# gets the wv/down flat streams as DMA partners, which the standalone attn_in
# launch never had.


def _rot_kernel(wo_kind, wo_sm, wo_sp, wo_mins, gu_kind, dn_kind, gu_sm,
                gu_sp, gu_mins, dn_sp, mxu, specs2, dim, K, TKo2, nko, F,
                TF, nf, TK2, nk2, half_rot, eps, act_fn, *refs):
    """specs2: per-next-weight (kind, has_sm, has_mins, has_sp)."""
    it = iter(refs)
    x_ref = next(it)
    nw_ref = next(it)       # ffn norm [1, dim]
    nw2_ref = next(it)      # next layer's attn norm [1, dim] (full)
    a_lo_ref = next(it)
    a_hi_ref = next(it)
    if wo_kind == "q4":
        wo_qs = (next(it),)
        wo_s = (next(it), next(it))
        wo_m = (next(it), next(it)) if wo_mins else None
    else:
        wo_qs = (next(it), next(it))
        wo_s = (next(it), next(it))
        wo_m = None
    g_qs = next(it)
    u_qs = next(it)
    g_s = next(it)
    u_s = next(it)
    g_m = next(it) if gu_mins else None
    u_m = next(it) if gu_mins else None
    d_qs = next(it)
    d_s = next(it)
    wrefs2 = []
    for kind, has_sm, has_mins, _sp in specs2:
        if kind == "q4":
            qs = (next(it),)
            s = (next(it), next(it))
            m = (next(it), next(it)) if has_mins else None
        else:
            qs = (next(it), next(it))
            s = (next(it), next(it))
            m = None
        wrefs2.append((qs, s, m))
    cos_ref = next(it)
    sin_ref = next(it)
    o_ref = next(it)
    outs2 = [next(it) for _ in specs2]
    acc_x = next(it)
    x2_scr = next(it)
    acc = next(it)
    x3_scr = next(it)       # [R, dim] f32: the layer output (phase C input)
    accs2 = [next(it) for _ in specs2]

    j = pl.program_id(0)
    gw = GROUP_SIZE[wo_kind]

    @pl.when(j == 0)
    def _():
        acc_x[:] = jnp.zeros_like(acc_x)
        acc[:] = jnp.zeros_like(acc)
        for a2 in accs2:
            a2[:] = jnp.zeros_like(a2)

    def mm(x, w):
        return jax.lax.dot_general(
            x, w if mxu else w.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    a_dt = jnp.float32 if mxu else jnp.bfloat16

    # ---- phase A: o_proj K-chunk (fused_oproj_ffn phase A, dequant path) --
    @pl.when(j < nko)
    def _():
        if wo_kind == "q4":
            contrib = None
            for hi in (0, 1):
                if wo_sm:
                    sc, mn = _decode_sm(wo_s[hi][:])
                else:
                    sc = wo_s[hi][:].astype(jnp.float32)
                    mn = wo_m[hi][:].astype(jnp.float32) if wo_m else None
                if mxu:
                    a = (a_lo_ref if hi == 0 else a_hi_ref)[:].astype(jnp.float32)
                    d = fold_dot_mxu(a, q4_codes_word(wo_qs[0][:], bool(hi)),
                                     sc, mn, gw)
                else:
                    a = (a_lo_ref if hi == 0 else a_hi_ref)[:].astype(jnp.bfloat16)
                    q = q4_codes_word(wo_qs[0][:], bool(hi)).astype(jnp.float32)
                    w = group_scale_mulsub(q, sc, mn, gw)
                    d = mm(a, w)
                contrib = d if contrib is None else contrib + d
        else:
            contrib = None
            for hi, a_ref in ((0, a_lo_ref), (1, a_hi_ref)):
                if wo_sp:
                    w = group_scale_mul_sp(wo_qs[hi][:].astype(jnp.float32),
                                           wo_s[hi][:], gw)
                else:
                    w = group_scale_mulsub(
                        wo_qs[hi][:].astype(jnp.float32),
                        wo_s[hi][:].astype(jnp.float32), None, gw)
                d = mm(a_ref[:].astype(a_dt), w)
                contrib = d if contrib is None else contrib + d
        acc_x[:] = acc_x[:] + contrib

    @pl.when(j == nko - 1)
    def _():
        h = acc_x[:].astype(jnp.bfloat16).astype(jnp.float32)
        x2_scr[:] = (x_ref[:].astype(jnp.float32) + h).astype(jnp.bfloat16)

    # ---- phase B: FFN block on x2 (fused_ffn pipeline) --------------------
    @pl.when((j >= nko) & (j < nko + nf))
    def _():
        xf = x2_scr[:].astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xn = xf * jax.lax.rsqrt(var + eps) * nw_ref[:].astype(jnp.float32)
        if not mxu:
            xn = xn.astype(jnp.bfloat16)

        def gu_matmul(qs_ref, s_ref, m_ref):
            g = GROUP_SIZE[gu_kind]
            if gu_kind in _FLAT_KINDS:
                if gu_sp:
                    w = group_scale_mul_sp(qs_ref[:].astype(jnp.float32),
                                           s_ref[:], g)
                else:
                    w = group_scale_mulsub(
                        qs_ref[:].astype(jnp.float32),
                        s_ref[:].astype(jnp.float32),
                        m_ref[:].astype(jnp.float32) if m_ref is not None
                        else None, g)
                return mm(xn, w)
            if gu_sm:
                s_all, m_all = _decode_sm(s_ref[:])
            else:
                s_all = s_ref[:].astype(jnp.float32)
                m_all = m_ref[:].astype(jnp.float32) if m_ref is not None else None
            half_g = (dim // 2) // g
            out = None
            for hi in (False, True):
                sl = slice(half_g, None) if hi else slice(0, half_g)
                if mxu:
                    d = fold_dot_mxu(
                        xn[:, dim // 2:] if hi else xn[:, : dim // 2],
                        q4_codes_word(qs_ref[:], hi), s_all[sl],
                        m_all[sl] if m_all is not None else None, g)
                else:
                    q = q4_codes_word(qs_ref[:], hi).astype(jnp.float32)
                    w = group_scale_mulsub(
                        q, s_all[sl],
                        m_all[sl] if m_all is not None else None, g)
                    d = mm(xn[:, dim // 2:] if hi else xn[:, : dim // 2], w)
                out = d if out is None else out + d
            return out

        gate = gu_matmul(g_qs, g_s, g_m).astype(jnp.bfloat16).astype(jnp.float32)
        up = gu_matmul(u_qs, u_s, u_m).astype(jnp.bfloat16).astype(jnp.float32)
        if act_fn == "gelu":
            a = jax.nn.gelu(gate, approximate=False) * up
        else:
            a = jax.nn.silu(gate) * up
        a = a.astype(jnp.bfloat16)
        if mxu:
            a = a.astype(jnp.float32)

        gd = GROUP_SIZE[dn_kind]
        if dn_sp:
            wd = group_scale_mul_sp(d_qs[:].astype(jnp.float32), d_s[:], gd)
        else:
            wd = group_scale_mulsub(d_qs[:].astype(jnp.float32),
                                    d_s[:].astype(jnp.float32), None, gd)
        acc[:] = acc[:] + mm(a, wd)

    @pl.when(j == nko + nf - 1)
    def _():
        y = x2_scr[:].astype(jnp.float32) + acc[:]
        o_ref[:] = y.astype(o_ref.dtype)
        # phase C input — same rounding as the unfused path's residual stream
        x3_scr[:] = y.astype(o_ref.dtype).astype(jnp.float32)

    # ---- phase C: next layer's attn-in (norm -> QKV chunks) ---------------
    @pl.when(j >= nko + nf)
    def _():
        k2 = jnp.clip(j - nko - nf, 0, nk2 - 1)
        xf3 = x3_scr[:]
        rstd = jax.lax.rsqrt(jnp.mean(xf3 * xf3, axis=-1, keepdims=True) + eps)
        lo = k2 * TK2
        hi_off = dim // 2 + k2 * TK2
        nw_lo = nw2_ref[:, pl.ds(lo, TK2)].astype(jnp.float32)
        nw_hi = nw2_ref[:, pl.ds(hi_off, TK2)].astype(jnp.float32)
        x_lo_f = x3_scr[:, pl.ds(lo, TK2)] * rstd * nw_lo
        x_hi_f = x3_scr[:, pl.ds(hi_off, TK2)] * rstd * nw_hi
        x_lo = x_lo_f if mxu else x_lo_f.astype(jnp.bfloat16)
        x_hi = x_hi_f if mxu else x_hi_f.astype(jnp.bfloat16)

        for (kind, has_sm, has_mins, has_sp), (qs, s, m), a2 in zip(
                specs2, wrefs2, accs2):
            g = GROUP_SIZE[kind]
            if kind == "q4":
                contrib = None
                for hi in (0, 1):
                    if has_sm:
                        sc, mn = _decode_sm(s[hi][:])
                    else:
                        sc = s[hi][:].astype(jnp.float32)
                        mn = (m[hi][:].astype(jnp.float32)
                              if m is not None else None)
                    if mxu:
                        d = fold_dot_mxu(x_hi_f if hi else x_lo_f,
                                         q4_codes_word(qs[0][:], bool(hi)),
                                         sc, mn, g)
                    else:
                        q = q4_codes_word(qs[0][:], bool(hi)).astype(jnp.float32)
                        w = group_scale_mulsub(q, sc, mn, g)
                        d = mm(x_hi if hi else x_lo, w)
                    contrib = d if contrib is None else contrib + d
            else:
                contrib = None
                for hi, x_chunk in ((0, x_lo), (1, x_hi)):
                    if has_sp:
                        w = group_scale_mul_sp(qs[hi][:].astype(jnp.float32),
                                               s[hi][:], g)
                    else:
                        w = group_scale_mulsub(qs[hi][:].astype(jnp.float32),
                                               s[hi][:].astype(jnp.float32),
                                               None, g)
                    d = mm(x_chunk, w)
                    contrib = d if contrib is None else contrib + d
            a2[:] = a2[:] + contrib

    @pl.when(j == nko + nf + nk2 - 1)
    def _():
        for i, (a2, o2) in enumerate(zip(accs2, outs2)):
            y = a2[:].astype(jnp.bfloat16).astype(jnp.float32)
            if i == 0:
                # NEOX rope epilogue (pallas_attn_in conventions)
                lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
                first = (lane % (2 * half_rot)) < half_rot
                n = y.shape[-1]
                rot = jnp.where(first,
                                -pltpu.roll(y, n - half_rot, 1),
                                pltpu.roll(y, half_rot, 1))
                y = y * cos_ref[:] + rot * sin_ref[:]
            o2[:] = y.astype(o2.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("wo_kind", "gu_kind", "dn_kind", "wo_keys", "gu_keys",
                     "dn_keys", "kinds2", "keys2", "ns2", "dim", "K", "F",
                     "half_rot", "eps", "act_fn", "out_dtype", "interpret",
                     "tko", "tf", "tk2"),
)
def _rot_call(x2d, attn2d, norm_w, norm_w2, wo_arrays, gu_arrays, dn_arrays,
              flat_arrays2, cos_full, sin_full, wo_kind, gu_kind, dn_kind,
              wo_keys, gu_keys, dn_keys, kinds2, keys2, ns2, dim, K, F,
              half_rot, eps, act_fn, out_dtype, interpret, tko, tf, tk2):
    wo = dict(zip(wo_keys, wo_arrays))
    gu = dict(zip(gu_keys, gu_arrays))
    dn = dict(zip(dn_keys, dn_arrays))
    R = x2d.shape[0]

    TKo2 = tko
    while (K // 2) % TKo2:
        TKo2 //= 2
    TKo2 = _cap_chunk(TKo2, dim, 256)
    nko = (K // 2) // TKo2
    TF = tf or _pick_tf(F, dim)
    nf = F // TF
    TK2 = tk2
    while (dim // 2) % TK2:
        TK2 //= 2
    TK2 = _cap_chunk(TK2, max(ns2), 256)
    nk2 = (dim // 2) // TK2
    n_steps = nko + nf + nk2

    wo_sm, wo_sp, wo_mins = "sm" in wo, "sp" in wo, "mins" in wo
    gu_sm, gu_sp, gu_mins = "sm" in gu, "sp" in gu, "mins" in gu
    dn_sp = "sp" in dn
    gw = GROUP_SIZE[wo_kind]
    gd = GROUP_SIZE[dn_kind]

    def clampo(j):
        return jnp.minimum(j, nko - 1)

    def clampf(j):
        return jnp.clip(j - nko, 0, nf - 1)

    def clampc(j):
        return jnp.clip(j - nko - nf, 0, nk2 - 1)

    x_spec = pl.BlockSpec((R, dim), lambda j: (0, 0), memory_space=pltpu.VMEM)
    nw_spec = pl.BlockSpec((1, dim), lambda j: (0, 0), memory_space=pltpu.VMEM)
    alo_spec = pl.BlockSpec((R, TKo2), lambda j: (0, clampo(j)),
                            memory_space=pltpu.VMEM)
    ahi_spec = pl.BlockSpec((R, TKo2), lambda j: (0, nko + clampo(j)),
                            memory_space=pltpu.VMEM)
    in_specs = [x_spec, nw_spec, nw_spec, alo_spec, ahi_spec]
    inputs = [x2d, norm_w.reshape(1, dim), norm_w2.reshape(1, dim),
              attn2d, attn2d]

    wo_sg = TKo2 // (2 * gw) if wo_sp else TKo2 // gw
    wo_skey = "sm" if wo_sm else ("sp" if wo_sp else "scales")
    wlo_s = pl.BlockSpec((wo_sg, dim), lambda j: (clampo(j), 0),
                         memory_space=pltpu.VMEM)
    whi_s = pl.BlockSpec((wo_sg, dim), lambda j: (nko + clampo(j), 0),
                         memory_space=pltpu.VMEM)
    if wo_kind == "q4":
        in_specs.append(pl.BlockSpec((TKo2, dim), lambda j: (clampo(j), 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(wo["qs"])
        in_specs += [wlo_s, whi_s]
        inputs += [wo[wo_skey], wo[wo_skey]]
        if wo_mins:
            in_specs += [wlo_s, whi_s]
            inputs += [wo["mins"], wo["mins"]]
    else:
        in_specs += [
            pl.BlockSpec((TKo2, dim), lambda j: (clampo(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TKo2, dim), lambda j: (nko + clampo(j), 0),
                         memory_space=pltpu.VMEM),
            wlo_s, whi_s,
        ]
        inputs += [wo["qs"], wo["qs"], wo[wo_skey], wo[wo_skey]]

    qs_rows = gu["qs"].shape[0]
    s_key = "sm" if gu_sm else ("sp" if gu_sp else "scales")
    s_rows = gu[s_key].shape[0]
    gqs_spec = pl.BlockSpec((qs_rows, TF), lambda j: (0, clampf(j)),
                            memory_space=pltpu.VMEM)
    uqs_spec = pl.BlockSpec((qs_rows, TF), lambda j: (0, F // TF + clampf(j)),
                            memory_space=pltpu.VMEM)
    gs_spec = pl.BlockSpec((s_rows, TF), lambda j: (0, clampf(j)),
                           memory_space=pltpu.VMEM)
    us_spec = pl.BlockSpec((s_rows, TF), lambda j: (0, F // TF + clampf(j)),
                           memory_space=pltpu.VMEM)
    in_specs += [gqs_spec, uqs_spec, gs_spec, us_spec]
    inputs += [gu["qs"], gu["qs"], gu[s_key], gu[s_key]]
    if gu_mins:
        in_specs += [gs_spec, us_spec]
        inputs += [gu["mins"], gu["mins"]]
    in_specs.append(pl.BlockSpec((TF, dim), lambda j: (clampf(j), 0),
                                 memory_space=pltpu.VMEM))
    inputs.append(dn["qs"])
    d_s_rows = TF // (2 * gd) if dn_sp else TF // gd
    in_specs.append(pl.BlockSpec((d_s_rows, dim), lambda j: (clampf(j), 0),
                                 memory_space=pltpu.VMEM))
    inputs.append(dn["sp"] if dn_sp else dn["scales"])

    # next-layer projection blocks (pallas_attn_in geometry, clamped to C)
    specs2 = []
    ai = iter(flat_arrays2)
    for kind, kkeys, N in zip(kinds2, keys2, ns2):
        a = dict(zip(kkeys, [next(ai) for _ in kkeys]))
        g = GROUP_SIZE[kind]
        has_sm = "sm" in a
        has_sp = "sp" in a
        has_mins = "mins" in a
        sg = TK2 // (2 * g) if has_sp else TK2 // g
        skey = "sm" if has_sm else ("sp" if has_sp else "scales")
        lo_s = pl.BlockSpec((sg, N), lambda j: (clampc(j), 0),
                            memory_space=pltpu.VMEM)
        hi_s = pl.BlockSpec((sg, N), lambda j, _o=nk2: (_o + clampc(j), 0),
                            memory_space=pltpu.VMEM)
        if kind == "q4":
            in_specs.append(pl.BlockSpec((TK2, N), lambda j: (clampc(j), 0),
                                         memory_space=pltpu.VMEM))
            inputs.append(a["qs"])
            in_specs += [lo_s, hi_s]
            inputs += [a[skey], a[skey]]
            if has_mins:
                in_specs += [lo_s, hi_s]
                inputs += [a["mins"], a["mins"]]
        else:
            lo_q = pl.BlockSpec((TK2, N), lambda j: (clampc(j), 0),
                                memory_space=pltpu.VMEM)
            hi_q = pl.BlockSpec((TK2, N), lambda j, _o=nk2: (_o + clampc(j), 0),
                                memory_space=pltpu.VMEM)
            in_specs += [lo_q, hi_q, lo_s, hi_s]
            inputs += [a["qs"], a["qs"], a[skey], a[skey]]
        specs2.append((kind, has_sm, has_mins, has_sp))

    n0 = ns2[0]
    cs_spec = pl.BlockSpec((R, n0), lambda j: (0, 0), memory_space=pltpu.VMEM)
    in_specs += [cs_spec, cs_spec]
    inputs += [cos_full, sin_full]

    kernel = functools.partial(
        _rot_kernel, wo_kind, wo_sm, wo_sp, wo_mins, gu_kind, dn_kind, gu_sm,
        gu_sp, gu_mins, dn_sp, mxu_mins_enabled(), tuple(specs2), dim, K,
        TKo2, nko, F, TF, nf, TK2, nk2, half_rot, eps, act_fn)
    bytes_accessed = (
        sum(v.size * v.dtype.itemsize for v in wo.values())
        + sum(v.size * v.dtype.itemsize for v in gu.values())
        + sum(v.size * v.dtype.itemsize for v in dn.values())
        + sum(v.size * v.dtype.itemsize for v in flat_arrays2)
        + 2 * R * (K + 3 * dim)
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((R, dim), lambda j: (0, 0),
                                memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((R, N), lambda j: (0, 0), memory_space=pltpu.VMEM)
           for N in ns2],
        out_shape=[jax.ShapeDtypeStruct((R, dim), jnp.dtype(out_dtype))]
        + [jax.ShapeDtypeStruct((R, N), jnp.dtype(out_dtype)) for N in ns2],
        scratch_shapes=[
            pltpu.VMEM((R, dim), jnp.float32),
            pltpu.VMEM((R, dim), jnp.bfloat16),
            pltpu.VMEM((R, dim), jnp.float32),
            pltpu.VMEM((R, dim), jnp.float32),
        ] + [pltpu.VMEM((R, N), jnp.float32) for N in ns2],
        cost_estimate=pl.CostEstimate(
            flops=2 * R * (dim * (K + 3 * F) + dim * sum(ns2)),
            bytes_accessed=bytes_accessed,
            transcendentals=R * F,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*inputs)
    return tuple(outs)


def rot_supported(wo: QTensor, gu: QTensor, dn: QTensor, ws2, rows: int,
                  dim: int) -> bool:
    from tpu_kquant.ops.pallas_attn_in import attn_in_supported

    if not oproj_ffn_supported(wo, gu, dn, rows):
        return False
    return attn_in_supported(ws2, rows, dim)


def rot_enabled(impl: str, wo: QTensor, gu: QTensor, dn: QTensor, ws2,
                rows: int, dim: int) -> bool:
    import os

    # Default OFF — measured negative result (r3, v5e, tiny shapes, same
    # session): rotated 63.4 us vs composed oproj_ffn+attn_in 58.6 us
    # standalone; end-to-end tg128 581.6±6.9 vs 580.0±24.5 (wash). The
    # per-launch fixed cost the rotation saves (~5 us) is fully repaid by
    # in-kernel loss — the third fusion experiment (after attn_out and
    # fused_layer) confirming Mosaic launch overhead is NOT the decode
    # bottleneck at these shapes; within-kernel HBM efficiency is.
    if os.environ.get("TKQ_ROTATE_LAYER", "0") != "1":
        return False
    if os.environ.get("TKQ_FUSE_OPROJ", "1") != "1":
        return False
    if impl not in ("auto", "pallas", "int8"):
        return False
    if not rot_supported(wo, gu, dn, ws2, rows, dim):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def fused_oproj_ffn_attn_in(
    x: jnp.ndarray,  # [..., dim] residual stream (pre-attention-residual)
    attn: jnp.ndarray,  # [..., K] attention output (pre-o_proj)
    wo: QTensor,
    ffn_norm_w: jnp.ndarray,
    eps: float,
    gu: QTensor,
    dn: QTensor,
    attn_norm_w2: jnp.ndarray,  # NEXT layer's attention norm [dim]
    ws2: list[QTensor],  # next layer's projections [N_i, dim]
    cos_full: jnp.ndarray,  # [R, N_0] expanded rope tables
    sin_full: jnp.ndarray,
    half_rot: int,
    act_fn: str = "silu",
    out_dtype=None,
    interpret: bool = False,
    tko: int = 512,
    tf: int | None = None,
    tk2: int = 512,
):
    """Rotated layer boundary (see module comment). Returns
    (y [..., dim], *next-layer projection outputs [..., N_i]; output 0 roped)."""
    out_dtype = out_dtype or x.dtype
    dim = x.shape[-1]
    K = attn.shape[-1]
    F = dn.shape[-1]
    lead = x.shape[:-1]
    wo_keys = tuple(sorted(wo.arrays))
    gu_keys = tuple(sorted(gu.arrays))
    dn_keys = tuple(sorted(dn.arrays))
    kinds2 = tuple(w.kind for w in ws2)
    keys2 = tuple(tuple(sorted(w.arrays)) for w in ws2)
    ns2 = tuple(int(w.shape[0]) for w in ws2)
    flat_arrays2 = tuple(w.arrays[k] for w, kk in zip(ws2, keys2) for k in kk)
    outs = _rot_call(
        x.reshape(-1, dim), attn.reshape(-1, K), ffn_norm_w, attn_norm_w2,
        tuple(wo.arrays[k] for k in wo_keys),
        tuple(gu.arrays[k] for k in gu_keys),
        tuple(dn.arrays[k] for k in dn_keys),
        flat_arrays2, cos_full, sin_full,
        wo.kind, gu.kind, dn.kind, wo_keys, gu_keys, dn_keys,
        kinds2, keys2, ns2, dim, K, F, half_rot, float(eps), act_fn,
        jnp.dtype(out_dtype).name, interpret, tko, tf, tk2,
    )
    y = outs[0].reshape(*lead, dim)
    rest = tuple(o.reshape(*lead, n) for o, n in zip(outs[1:], ns2))
    return (y,) + rest
