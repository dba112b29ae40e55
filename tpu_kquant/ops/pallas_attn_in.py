"""Fused attention-input Pallas megakernel: rms_norm -> Q/K/V quantized
matmuls -> rope, in ONE kernel launch.

Why: after the FFN-block fusion (ops.pallas_ffn) the decode step's remaining
fixed-cost hotspot was the attention input path — per layer one norm, two or
three qmatmul launches, and two rope ops (~0.32 ms/tok measured vs ~0.14
HBM-ideal on TinyLlama, tools_ablate_decode.py). The reference pays the
analogous per-node dispatch in ggml_compute_forward (SURVEY.md 3.1); here all
of it collapses into one pallas_call whose grid pipelines K-depth chunks of
every projection weight:

  grid step k: fetch chunk k of each W in {wqk, wv} (or {wqkv}),
               xn_k = rms_norm(x)[:, chunk_k]          (stats recomputed
                                                        per step — VPU noise)
               acc_i += xn_k @ dequant(W_i chunk k)
  last step:   acc_0 = rope(acc_0 + bias) via the NEOX half-rotate
               (a lane roll by +-head_dim/2 — valid because the loader
               canonicalizes NORM-mode models, runtime/loader.py
               _rope_neox_perm), v sections ride cos=1/sin=0 table padding.

Weight bytes stream HBM->VMEM exactly once (same as ops.pallas_qmm); ~5 ops'
worth of launch overhead per layer collapses into one.

Supported packed layouts (quant/repack.py conventions, kmajor):
  q4 folded (sm pairs or f32 scales+mins), q6w, q8 — per weight tensor,
  kinds may differ between tensors (Q4_K_M: wqk q4, wv q6w).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_kquant.ops.pallas_dequant import (
    act_quant_to_scratch,
    attn_in_int8_auto,
    fold_dot_mxu,
    group_dot_enabled,
    group_scale_dot,
    group_scale_mul_sp,
    group_scale_mulsub,
    int8_group_fold,
    mxu_mins_enabled,
    q4_codes_word,
    sp_scales,
)
from tpu_kquant.quant.qtensor import QTensor
from tpu_kquant.quant.repack import GROUP_SIZE

_FLAT_KINDS = ("q6w", "q8")
_KINDS = ("q4",) + _FLAT_KINDS

# Scoped-VMEM budget for one weight chunk, in ELEMENTS of the widened dequant
# temporaries (Mosaic materializes the f32 widened tiles on the kernel
# stack). The compiler's DEFAULT scoped limit is 16 MB — 8B's 5120-wide wqk
# at TK2=512 blows it (measured: 18.95M > 16M) — so the megakernels raise
# vmem_limit_bytes to _VMEM_LIMIT (v5e has 128 MB VMEM) and this budget caps
# chunks so temporaries + double-buffered windows stay well inside it.
# Halving chunks below this instead costs per-grid-step fixed overhead:
# attn_in at 8B measured 34.3 us with TK2=256/16 steps vs 22.5 ideal.
_VMEM_CHUNK_ELEMS = 2_700_000
_VMEM_LIMIT = 100 * 1024 * 1024


def _cap_chunk(tk: int, width: int, min_tk: int) -> int:
    while tk > min_tk and tk * width > _VMEM_CHUNK_ELEMS:
        tk //= 2
    return tk


def attn_in_supported(ws: list[QTensor], rows: int, D: int) -> bool:
    if rows > 32:  # prefill shapes: the plain batched kernels win
        return False
    if D % 512:
        return False
    for w in ws:
        if w.layout != "kmajor" or w.kind not in _KINDS:
            return False
        if w.shape[-1] != D or w.shape[0] % 128:
            return False
    return True


def attn_in_enabled(impl: str, ws: list[QTensor], rows: int, D: int) -> bool:
    import os

    if os.environ.get("TKQ_FUSE_ATTN", "1") != "1":
        return False
    if impl not in ("auto", "pallas", "int8"):
        return False
    if not attn_in_supported(ws, rows, D):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _decode_sm(sm_block):
    """Packed bf16 (scale, min) pairs in an f32 container -> (s, m) f32."""
    bits = jax.lax.bitcast_convert_type(sm_block, jnp.int32)
    s = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
    m = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
    return s, m


def _attn_in_kernel(specs, i8, mxu, gdot, D, TK2, nk, half_rot, eps, nw_scale,
                    *refs):
    """specs: per-weight static descriptors (kind, has_sm, has_mins, has_bias).

    Ref order: x_full, nw, [nw_full if i8], x_lo, x_hi, per-weight packed
    refs (see _weight_refs), cos, sin, [biases...], outputs...,
    scratch accs..., [i8 quant scratch...]
    """
    it = iter(refs)
    x_full = next(it)
    nw_lo_ref = next(it)
    nw_hi_ref = next(it)
    nw_full_ref = next(it) if i8 else None
    x_lo_ref = next(it)
    x_hi_ref = next(it)
    wrefs = []
    for kind, has_sm, has_mins, _, _sp in specs:
        if kind == "q4":
            qs = (next(it),)
            s = (next(it), next(it))
            m = (next(it), next(it)) if has_mins else None
        else:  # flat: lo/hi row chunks are separate blocks of the same array
            qs = (next(it), next(it))
            s = (next(it), next(it))
            m = None
        wrefs.append((qs, s, m))
    cos_ref = next(it)
    sin_ref = next(it)
    biases = [next(it) if sp[3] else None for sp in specs]
    outs = [next(it) for _ in specs]
    accs = [next(it) for _ in specs]
    if i8:
        xq_scr, xs_scr, gs_scr = next(it), next(it), next(it)
    g4 = 32  # q4 group size (the only int8-folded kind here)

    k = pl.program_id(0)

    # rms_norm statistic over the FULL row, recomputed per step (R*D VPU
    # flops — noise next to the weight DMA); normalization applied per-chunk
    xf = x_full[:].astype(jnp.float32)
    rstd = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)

    @pl.when(k == 0)
    def _():
        for acc in accs:
            acc[:] = jnp.zeros_like(acc)
        if i8:
            # Q8_K-style quant of the FULL normed row ONCE; q4 projections
            # then run int8 group dots per chunk (pallas_dequant rationale)
            nw_f = nw_full_ref[:].astype(jnp.float32) + nw_scale
            act_quant_to_scratch(xf * rstd * nw_f, xq_scr, xs_scr, gs_scr, g4)

    nw_lo = nw_lo_ref[:].astype(jnp.float32) + nw_scale
    nw_hi = nw_hi_ref[:].astype(jnp.float32) + nw_scale
    x_lo_f = x_lo_ref[:].astype(jnp.float32) * rstd * nw_lo
    x_hi_f = x_hi_ref[:].astype(jnp.float32) * rstd * nw_hi
    # mxu chain (pallas_dequant.mxu_mins_enabled): the MXU's default-
    # precision f32 matmul rounds inputs to bf16 itself — skip the casts
    x_lo = x_lo_f if mxu else x_lo_f.astype(jnp.bfloat16)
    x_hi = x_hi_f if mxu else x_hi_f.astype(jnp.bfloat16)

    def mm(x, w):
        return jax.lax.dot_general(
            x, w if mxu else w.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for (kind, has_sm, has_mins, _, has_sp), (qs, s, m), acc in zip(
            specs, wrefs, accs):
        g = GROUP_SIZE[kind]
        if kind == "q4":
            contrib = None
            for hi in (0, 1):
                if has_sm:
                    sc, mn = _decode_sm(s[hi][:])
                else:
                    sc = s[hi][:].astype(jnp.float32)
                    mn = m[hi][:].astype(jnp.float32) if m is not None else None
                if i8:
                    # chunk k's lo fold covers elements [k*TK2, (k+1)*TK2),
                    # hi fold the same packed rows + D/2
                    goff = (D // 2) // g * hi + k * (TK2 // g)
                    d = int8_group_fold(
                        xq_scr, xs_scr, gs_scr, goff, TK2 // g,
                        q4_codes_word(qs[0][:], bool(hi)), sc, mn, g)
                elif gdot:
                    # per-GROUP scale application (group_dot_enabled): the
                    # per-code work drops to extract + convert
                    d = group_scale_dot(x_hi_f if hi else x_lo_f,
                                        q4_codes_word(qs[0][:], bool(hi)),
                                        sc, mn, g)
                elif mxu:
                    # per-code work = extract + convert + scale-mul; min
                    # term via two small MXU passes (fold_dot_mxu)
                    d = fold_dot_mxu(x_hi_f if hi else x_lo_f,
                                     q4_codes_word(qs[0][:], bool(hi)),
                                     sc, mn, g)
                else:
                    # i32-word nibble extraction (pallas_dequant): 4 codes/op
                    q = q4_codes_word(qs[0][:], bool(hi)).astype(jnp.float32)
                    w = group_scale_mulsub(q, sc, mn, g)
                    d = mm(x_hi if hi else x_lo, w)
                contrib = d if contrib is None else contrib + d
        else:
            contrib = None
            for hi, x_chunk in ((0, x_lo), (1, x_hi)):
                if gdot:
                    sv = (sp_scales(s[hi][:]) if has_sp
                          else s[hi][:].astype(jnp.float32))
                    d = group_scale_dot(x_hi_f if hi else x_lo_f,
                                        qs[hi][:], sv, None, g)
                elif has_sp:
                    w = group_scale_mul_sp(qs[hi][:].astype(jnp.float32),
                                           s[hi][:], g)
                    d = mm(x_chunk, w)
                else:
                    w = group_scale_mulsub(qs[hi][:].astype(jnp.float32),
                                           s[hi][:].astype(jnp.float32),
                                           None, g)
                    d = mm(x_chunk, w)
                contrib = d if contrib is None else contrib + d
        acc[:] = acc[:] + contrib

    @pl.when(k == nk - 1)
    def _():
        for i, (acc, o_ref, b) in enumerate(zip(accs, outs, biases)):
            # round the matmul result to bf16 first: bit-matches the unfused
            # path (qmatmul returns bf16 before rope is applied)
            y = acc[:].astype(jnp.bfloat16).astype(jnp.float32)
            if b is not None:
                y = y + b[:].astype(jnp.float32)
            if i == 0:
                # NEOX rope epilogue: rot(x)[d] = -x[d + h/2] for in-head lane
                # d < h/2, x[d - h/2] otherwise; selects never cross a head's
                # 64-lane block, so full-axis rolls are safe
                lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
                first = (lane % (2 * half_rot)) < half_rot
                n = y.shape[-1]  # roll(n - s) == roll(-s); shifts must be >= 0
                rot = jnp.where(first,
                                -pltpu.roll(y, n - half_rot, 1),
                                pltpu.roll(y, half_rot, 1))
                y = y * cos_ref[:] + rot * sin_ref[:]
            o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kinds", "keys", "ns", "has_bias", "D", "half_rot",
                     "eps", "nw_scale", "out_dtype", "interpret", "tk", "i8",
                     "mxu", "gdot"),
)
def _attn_in_call(x2d, norm_w, flat_arrays, cos_full, sin_full, flat_biases,
                  kinds, keys, ns, has_bias, D, half_rot, eps, nw_scale,
                  out_dtype, interpret, tk, i8=False, mxu=False, gdot=False):
    R = x2d.shape[0]
    nw2d = norm_w.reshape(1, D)
    i8 = i8 and "q4" in kinds

    # TK2 = packed-row chunk per grid step; folded kinds index rows [0, D/2)
    TK2 = tk
    while (D // 2) % TK2:
        TK2 //= 2
    # scoped-VMEM cap: the widest projection's dequant temporaries must fit
    # the kernel stack (min 256 keeps q4 scale blocks >= 8 sublanes)
    TK2 = _cap_chunk(TK2, max(ns), 256)
    nk = (D // 2) // TK2

    x_spec = pl.BlockSpec((R, D), lambda k: (0, 0), memory_space=pltpu.VMEM)
    xlo_spec = pl.BlockSpec((R, TK2), lambda k: (0, k), memory_space=pltpu.VMEM)
    xhi_spec = pl.BlockSpec((R, TK2), lambda k: (0, (D // 2) // TK2 + k),
                            memory_space=pltpu.VMEM)
    nwlo_spec = pl.BlockSpec((1, TK2), lambda k: (0, k), memory_space=pltpu.VMEM)
    nwhi_spec = pl.BlockSpec((1, TK2), lambda k: (0, (D // 2) // TK2 + k),
                             memory_space=pltpu.VMEM)
    in_specs = [x_spec, nwlo_spec, nwhi_spec]
    inputs = [x2d, nw2d, nw2d]
    if i8:
        in_specs.append(pl.BlockSpec((1, D), lambda k: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(nw2d)
    in_specs += [xlo_spec, xhi_spec]
    inputs += [x2d, x2d]

    specs = []
    ai = iter(flat_arrays)
    for kind, kkeys, N in zip(kinds, keys, ns):
        a = dict(zip(kkeys, [next(ai) for _ in kkeys]))
        g = GROUP_SIZE[kind]
        has_sm = "sm" in a
        has_sp = "sp" in a
        has_mins = "mins" in a
        sg = TK2 // (2 * g) if has_sp else TK2 // g
        s_key = "sm" if has_sm else ("sp" if has_sp else "scales")
        lo_s = pl.BlockSpec((sg, N), lambda k: (k, 0), memory_space=pltpu.VMEM)
        hi_s = pl.BlockSpec((sg, N), lambda k, _o=(D // 2) // TK2: (_o + k, 0),
                            memory_space=pltpu.VMEM)
        if kind == "q4":
            in_specs.append(pl.BlockSpec((TK2, N), lambda k: (k, 0),
                                         memory_space=pltpu.VMEM))
            inputs.append(a["qs"])
            in_specs += [lo_s, hi_s]
            inputs += [a[s_key], a[s_key]]
            if has_mins:
                in_specs += [lo_s, hi_s]
                inputs += [a["mins"], a["mins"]]
        else:
            lo_q = pl.BlockSpec((TK2, N), lambda k: (k, 0),
                                memory_space=pltpu.VMEM)
            hi_q = pl.BlockSpec((TK2, N), lambda k, _o=(D // 2) // TK2:
                                (_o + k, 0), memory_space=pltpu.VMEM)
            in_specs += [lo_q, hi_q, lo_s, hi_s]
            inputs += [a["qs"], a["qs"], a[s_key], a[s_key]]
        specs.append((kind, has_sm, has_mins, False, has_sp))

    n0 = ns[0]
    cs_spec = pl.BlockSpec((R, n0), lambda k: (0, 0), memory_space=pltpu.VMEM)
    in_specs += [cs_spec, cs_spec]
    inputs += [cos_full, sin_full]
    bi = iter(flat_biases)
    for i, hb in enumerate(has_bias):
        if hb:
            specs[i] = specs[i][:3] + (True,) + specs[i][4:]
            in_specs.append(pl.BlockSpec((1, ns[i]), lambda k: (0, 0),
                                         memory_space=pltpu.VMEM))
            inputs.append(next(bi).reshape(1, ns[i]))

    kernel = functools.partial(_attn_in_kernel, tuple(specs), i8, mxu, gdot,
                               D, TK2, nk, half_rot, eps, nw_scale)
    bytes_accessed = sum(
        v.size * v.dtype.itemsize for v in flat_arrays
    ) + 2 * R * D + 2 * R * sum(ns) + 8 * R * n0
    scratch = [pltpu.VMEM((R, N), jnp.float32) for N in ns]
    if i8:
        scratch += [pltpu.VMEM((D // 32, 32, R), jnp.int8),
                    pltpu.VMEM((D // 32, R), jnp.float32),
                    pltpu.VMEM((D // 32, R), jnp.float32)]
    outs = pl.pallas_call(
        kernel,
        grid=(nk,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((R, N), lambda k: (0, 0),
                                memory_space=pltpu.VMEM) for N in ns],
        out_shape=[jax.ShapeDtypeStruct((R, N), jnp.dtype(out_dtype))
                   for N in ns],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * R * D * sum(ns), bytes_accessed=bytes_accessed,
            transcendentals=0,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*inputs)
    return tuple(outs)


def rope_tables_full(cos, sin, n_heads_roped: int, head_dim: int,
                     n_pad: int = 0):
    """Expand per-position rope tables [..., head_dim/2] to flat per-feature
    tables [R, n_heads_roped*head_dim + n_pad] for the kernel epilogue: each
    head's lanes get (cos_half, cos_half); pad lanes (un-roped v sections in
    a fused QKV) get cos=1 / sin=0."""
    c2 = cos.reshape(-1, cos.shape[-1])
    s2 = sin.reshape(-1, sin.shape[-1])
    R = c2.shape[0]
    c = jnp.tile(jnp.concatenate([c2, c2], -1), (1, n_heads_roped))
    s = jnp.tile(jnp.concatenate([s2, s2], -1), (1, n_heads_roped))
    if n_pad:
        c = jnp.concatenate([c, jnp.ones((R, n_pad), c.dtype)], -1)
        s = jnp.concatenate([s, jnp.zeros((R, n_pad), s.dtype)], -1)
    return c.astype(jnp.float32), s.astype(jnp.float32)


def fused_attn_in(
    x: jnp.ndarray,  # [..., D] residual stream
    norm_w: jnp.ndarray,  # [D]
    eps: float,
    ws: list[QTensor],  # projections [N_i, D]; rope applies to ws[0]'s output
    cos_full: jnp.ndarray,  # [R, N_0] expanded tables (rope_tables_full)
    sin_full: jnp.ndarray,
    half_rot: int,  # head_dim // 2
    biases: list[jnp.ndarray | None] | None = None,
    nw_scale: float = 0.0,
    out_dtype=None,
    interpret: bool = False,
    tk: int = 512,
) -> tuple[jnp.ndarray, ...]:
    """Returns per-weight outputs [..., N_i]; output 0 is roped."""
    out_dtype = out_dtype or x.dtype
    D = x.shape[-1]
    lead = x.shape[:-1]
    x2d = x.reshape(-1, D)
    if (biases is None or all(b is None for b in biases)) and \
            manual_attn_in_enabled(ws, None, x2d.shape[0]) and not interpret:
        n0, n1 = int(ws[0].shape[0]), int(ws[1].shape[0])
        o0, o1 = _attn_in_manual_call(
            x2d, norm_w, ws[0].arrays["qs"], ws[0].arrays["sm"],
            ws[1].arrays["qs"], ws[1].arrays["sp"], cos_full, sin_full,
            n0, n1, D, half_rot, float(eps), float(nw_scale),
            jnp.dtype(out_dtype).name, interpret,
            int(__import__("os").environ.get("TKQ_MANUAL_TK", "256")))
        return (o0.reshape(*lead, n0), o1.reshape(*lead, n1))
    biases = biases or [None] * len(ws)
    kinds = tuple(w.kind for w in ws)
    keys = tuple(tuple(sorted(w.arrays)) for w in ws)
    ns = tuple(int(w.shape[0]) for w in ws)
    flat_arrays = tuple(w.arrays[k] for w, kk in zip(ws, keys) for k in kk)
    has_bias = tuple(b is not None for b in biases)
    flat_biases = tuple(b for b in biases if b is not None)
    outs = _attn_in_call(
        x2d, norm_w, flat_arrays, cos_full, sin_full, flat_biases,
        kinds, keys, ns, has_bias, D, half_rot, float(eps), float(nw_scale),
        jnp.dtype(out_dtype).name, interpret, tk,
        i8=attn_in_int8_auto(max(
            (n for w, n in zip(ws, ns) if w.kind == "q4"), default=0)),
        mxu=mxu_mins_enabled(),
        gdot=group_dot_enabled(x2d.shape[0]),
    )
    return tuple(o.reshape(*lead, n) for o, n in zip(outs, ns))


# ---------------------------------------------------------------------------
# MANUAL-pipeline variant (r5): hand-rolled double-buffered DMA.
#
# Kernel-lab finding (r5, same-session 8B ladders): Mosaic's automatic grid
# pipeline does NOT overlap the VPU dequant chain with the weight DMA
# (r4 finding 4), but a manual fori_loop that STARTS chunk i+1's async
# copies before computing chunk i does — wqk full-chain 29.9 us (Mosaic
# kgrid) -> 21.4 (manual, tk=256), gu 159.7 -> 106.1. This variant applies
# that structure to the whole attention-input megakernel for the dominant
# production layout (q4-sm wqk + flat-sp wv, no biases); other layouts fall
# back to the Mosaic-grid kernel above.
# ---------------------------------------------------------------------------


def _attn_in_manual_kernel(D, TK2, nk, half_rot, eps, nw_scale, n0, n1, g4,
                           g6, x_ref, nw_ref, cos_ref, sin_ref,
                           qk_qs, qk_sm, v_qs, v_sp, out0, out1, bqk, bsm,
                           bsmh, bvlo, bvhi, bsplo, bsphi, acc0, acc1, sems):
    """Weights stay in HBM (ANY); 6 double-buffered streams. Chunk i covers
    packed wqk rows [i*TK2, (i+1)*TK2) == elements i*TK2 (lo fold) and
    + D/2 (hi fold); wv (flat) fetches both element ranges as row blocks."""
    from tpu_kquant.ops.pallas_dequant import fold_dot_mxu, group_scale_mul_sp

    sgq = TK2 // g4          # q4 sm rows per chunk
    sgp = TK2 // (2 * g6)    # sp rows per chunk (adjacent-pair packed)
    hoff = (D // 2) // TK2   # hi-fold chunk offset in packed rows

    def copies(i, slot):
        return (
            pltpu.make_async_copy(qk_qs.at[pl.ds(i * TK2, TK2)],
                                  bqk.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(qk_sm.at[pl.ds(i * sgq, sgq)],
                                  bsm.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(
                qk_sm.at[pl.ds((D // 2) // g4 + i * sgq, sgq)],
                bsmh.at[slot], sems.at[slot, 6]),
            pltpu.make_async_copy(v_qs.at[pl.ds(i * TK2, TK2)],
                                  bvlo.at[slot], sems.at[slot, 2]),
            pltpu.make_async_copy(v_qs.at[pl.ds(D // 2 + i * TK2, TK2)],
                                  bvhi.at[slot], sems.at[slot, 3]),
            pltpu.make_async_copy(v_sp.at[pl.ds(i * sgp, sgp)],
                                  bsplo.at[slot], sems.at[slot, 4]),
            pltpu.make_async_copy(
                v_sp.at[pl.ds((D // 2) // (2 * g6) + i * sgp, sgp)],
                bsphi.at[slot], sems.at[slot, 5]),
        )

    def start(i, slot):
        for c in copies(i, slot):
            c.start()

    def wait(i, slot):
        for c in copies(i, slot):
            c.wait()

    xf = x_ref[:].astype(jnp.float32)
    rstd = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)

    acc0[:] = jnp.zeros_like(acc0)
    acc1[:] = jnp.zeros_like(acc1)
    start(0, 0)

    def body(i, carry):
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < nk)
        def _():
            start(i + 1, nslot)

        wait(i, slot)

        def xchunk(off):
            xs = x_ref[:, pl.ds(off, TK2)].astype(jnp.float32)
            nws = nw_ref[:, pl.ds(off, TK2)].astype(jnp.float32) + nw_scale
            return xs * rstd * nws

        x_lo = xchunk(i * TK2)
        x_hi = xchunk(D // 2 + i * TK2)
        a0 = None
        for hi, xc, smref in ((0, x_lo, bsm), (1, x_hi, bsmh)):
            s, m = _decode_sm(smref[slot])
            d = fold_dot_mxu(xc, q4_codes_word(bqk[slot], bool(hi)), s, m, g4)
            a0 = d if a0 is None else a0 + d
        acc0[:] = acc0[:] + a0

        a1 = None
        for xc, qref, spref in ((x_lo, bvlo, bsplo), (x_hi, bvhi, bsphi)):
            w = group_scale_mul_sp(qref[slot].astype(jnp.float32),
                                   spref[slot], g6)
            d = jax.lax.dot_general(
                xc, w, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            a1 = d if a1 is None else a1 + d
        acc1[:] = acc1[:] + a1
        return carry

    jax.lax.fori_loop(0, nk, body, 0)

    # epilogue: bf16 rounding parity with the unfused path, then NEOX rope
    y = acc0[:].astype(jnp.bfloat16).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    first = (lane % (2 * half_rot)) < half_rot
    n = y.shape[-1]
    rot = jnp.where(first, -pltpu.roll(y, n - half_rot, 1),
                    pltpu.roll(y, half_rot, 1))
    y = y * cos_ref[:] + rot * sin_ref[:]
    out0[:] = y.astype(out0.dtype)
    out1[:] = acc1[:].astype(jnp.bfloat16).astype(out1.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n0", "n1", "D", "half_rot", "eps", "nw_scale",
                     "out_dtype", "interpret", "tk"),
)
def _attn_in_manual_call(x2d, norm_w, qk_qs, qk_sm, v_qs, v_sp, cos_full,
                         sin_full, n0, n1, D, half_rot, eps, nw_scale,
                         out_dtype, interpret, tk):
    R = x2d.shape[0]
    g4, g6 = 32, 16
    TK2 = tk
    while (D // 2) % TK2:
        TK2 //= 2
    nk = (D // 2) // TK2
    sgq = TK2 // g4
    sgp = TK2 // (2 * g6)

    # callers may pass wider tables (the Mosaic kernel's BlockSpec takes the
    # first n0 columns implicitly); match that here
    cos_full = cos_full[:, :n0]
    sin_full = sin_full[:, :n0]
    kernel = functools.partial(_attn_in_manual_kernel, D, TK2, nk, half_rot,
                               eps, nw_scale, n0, n1, g4, g6)
    outs = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # norm_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cos
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sin
            pl.BlockSpec(memory_space=pltpu.ANY),   # qk qs
            pl.BlockSpec(memory_space=pltpu.ANY),   # qk sm
            pl.BlockSpec(memory_space=pltpu.ANY),   # v qs
            pl.BlockSpec(memory_space=pltpu.ANY),   # v sp
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((R, n0), jnp.dtype(out_dtype)),
                   jax.ShapeDtypeStruct((R, n1), jnp.dtype(out_dtype))],
        scratch_shapes=[
            pltpu.VMEM((2, TK2, n0), qk_qs.dtype),
            pltpu.VMEM((2, sgq, n0), jnp.float32),
            pltpu.VMEM((2, sgq, n0), jnp.float32),
            pltpu.VMEM((2, TK2, n1), v_qs.dtype),
            pltpu.VMEM((2, TK2, n1), v_qs.dtype),
            pltpu.VMEM((2, sgp, n1), jnp.float32),
            pltpu.VMEM((2, sgp, n1), jnp.float32),
            pltpu.VMEM((R, n0), jnp.float32),
            pltpu.VMEM((R, n1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 7)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x2d, norm_w.reshape(1, D), cos_full, sin_full, qk_qs, qk_sm, v_qs, v_sp)
    return tuple(outs)


def manual_attn_in_enabled(ws: list[QTensor], biases, rows: int) -> bool:
    """Manual-pipeline dispatch: exactly the (q4-sm wqk, flat-sp wv) pair,
    no biases, decode rows. TKQ_MANUAL_ATTN_IN=0 restores the Mosaic grid."""
    import os

    if os.environ.get("TKQ_MANUAL_ATTN_IN", "1") != "1":
        return False
    if rows > 8 or biases is not None:
        return False
    if len(ws) != 2:
        return False
    if ws[0].kind != "q4" or "sm" not in ws[0].arrays:
        return False
    if ws[1].kind not in _FLAT_KINDS or "sp" not in ws[1].arrays:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
