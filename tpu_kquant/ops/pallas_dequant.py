"""Shared in-kernel dequant primitives for the Pallas matmul kernels.

Word-level nibble extraction (the int8-MXU kernel's trick, pallas_qmm_int8):
u8 tiles bitcast to i32 pack 4 consecutive sublanes per word, so ONE
AND/SHIFT yields 4 codes — ~0.25 VPU ops/element vs ~2 for the per-element
`astype(i32) >> 4 & 0xF` sequence. Measured motivation: at 8B decode shapes
the q4 bf16-dequant kernels sit at 67-82% of HBM roofline with the VPU
dequant chain (~6 ops/element) on the critical path; cutting unpack+scale
ops moves them back to DMA-bound.

Group-broadcast scaling: reshape [TK, TN] -> [TK/g, g, TN] and broadcast the
[TK/g, TN] scales over the middle axis instead of materializing
`jnp.repeat(s, g)` copies — saves a full-tile VPU copy per side array.

Numerics are IDENTICAL to the repeat/per-element forms (same f32 multiply
and subtract per element, same order), so the bit-exactness parity tests
pin these paths too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LO = 0x0F0F0F0F


def int8_folds_enabled() -> bool:
    """Q8_K-style int8-MXU folds for q4 weights inside the megakernels.

    Measured motivation (r3, v5e, tiny gu [11264, 2048] q4-sm, R=1): the
    f32-dequant pipeline is VPU-bound at ~4.25 ops/element (word-extract,
    i32->f32, scale-mul, min-sub, bf16 cast) and lands at 50-60%% of the HBM
    roofline; the int8 group-dot form (extract + bitcast only, scales/mins
    applied to per-group partials) measured 24.8 us vs 34.3 (71%% vs 52%%).
    Numerics: the activation side quantizes to per-group int8 (amax/127) —
    the reference's own hot-loop design (quantize_row_q8_K + int8 sdot,
    SURVEY.md 3.1).

    Default OFF — kept as a documented negative result: the standalone win
    did NOT transfer into the megakernels. Same-session A/B on v5e (r3,
    tiny shapes, R=1): oproj+ffn 47.4 us (81% HBM) dequant vs 53.6 us int8;
    ffn megakernel ~unchanged (43.2 vs 42.1 across sessions). The megakernel
    grid already overlaps the q4 VPU dequant with the flat-kind down/v DMA
    stream, so the VPU was not the critical path there, and the int8 form
    adds per-group batched-matvec MXU passes (1 activation row per 32-deep
    pass) plus an in-kernel activation-quant transpose at the phase
    boundary. The standalone qmm context (no DMA partner to hide VPU work)
    is where int8 wins: 24.8 us vs 34.3 us on the same tensor.

    EXCEPTION (attn_in at 8B-class widths): the attention-input kernel has
    no flat-kind DMA partner wide enough to hide a 5120-wide q4 dequant —
    same-session 8B A/B measured 34.1 us (int8) vs 37.9 us (dequant), so
    'auto' mode (the default) turns the folds on for attn_in when its
    widest q4 projection is >= 4096 columns (attn_in_int8_auto below).
    """
    import os

    return os.environ.get("TKQ_INT8_FOLDS", "auto") == "1"


def attn_in_int8_auto(ns_q4_max: int) -> bool:
    """Shape-aware int8-fold policy for the attention-input kernel (see
    int8_folds_enabled docstring). ns_q4_max: widest q4 projection's N.

    r4: with the MXU-mins/f32-dot chain on, the dequant path beats the int8
    folds at the 8B width that motivated the auto rule (same-session A/B:
    33.1 us mxu vs 34.1 int8-auto on 8B attn_in), so 'auto' resolves to
    False whenever mxu_mins_enabled(); TKQ_INT8_FOLDS=1 still forces them."""
    import os

    mode = os.environ.get("TKQ_INT8_FOLDS", "auto")
    if mode == "1":
        return True
    if mode == "auto":
        return ns_q4_max >= 4096 and not mxu_mins_enabled()
    return False


def q4_codes_word(qs_u8: jnp.ndarray, hi_fold: bool) -> jnp.ndarray:
    """[TK2, TN] packed u8 tile -> [TK2, TN] i8 codes (0..15) of one fold.

    Requires TK2 % 4 == 0 (i32 word packs 4 sublanes; all callers use
    TK2 >= 256). The >>4 word shift leaks bits across byte boundaries, which
    the 0x0F mask then clears — per-byte semantics are exact.
    """
    qs32 = pltpu.bitcast(qs_u8, jnp.int32)
    lo = ((qs32 >> 4) if hi_fold else qs32) & _LO
    return pltpu.bitcast(lo, jnp.int8)


def group_scale_mulsub(
    q_f32: jnp.ndarray,  # [TK, TN] f32 codes
    s: jnp.ndarray,  # [TK/g, TN] f32 per-group scales
    m: jnp.ndarray | None,  # [TK/g, TN] f32 per-group mins (or None)
    g: int,
) -> jnp.ndarray:
    """w = q * s_broadcast - m_broadcast, without materializing repeats."""
    TK, TN = q_f32.shape
    q3 = q_f32.reshape(TK // g, g, TN)
    w = q3 * s[:, None, :]
    if m is not None:
        w = w - m[:, None, :]
    return w.reshape(TK, TN)


def group_scale_mul_sp(q_f32: jnp.ndarray, sp_block: jnp.ndarray,
                       g: int) -> jnp.ndarray:
    """w = q * s for flat kinds with adjacent-group bf16 scale pairs
    (quant.repack.pack_scale_kpairs). sp_block: [TK/(2g), TN] f32 container;
    low 16 bits = even group's bf16 scale, high 16 = odd group's."""
    TK, TN = q_f32.shape
    bits = jax.lax.bitcast_convert_type(sp_block, jnp.int32)
    s_even = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
    s_odd = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
    q4d = q_f32.reshape(TK // (2 * g), 2, g, TN)
    w = q4d * jnp.stack([s_even, s_odd], axis=1)[:, :, None, :]
    return w.reshape(TK, TN)


def mxu_mins_enabled() -> bool:
    """Kernel-lab r4 finding (tools_kernel_lab.py, artifacts/perf/
    kernel_lab_r4.json): the Mosaic grid pipeline does NOT overlap in-body
    VPU work with the weight DMA stream (a fixed synthetic VPU load adds
    wall time 1:1 even when far below the DMA time), so every op of the q4
    f32 dequant chain (convert, scale-mul, min-sub, bf16 cast) is pure
    kernel time — the gu-shape ladder measured dma 19.0 / convert 22.4 /
    full 36.2 us. Two restructurings recover most of it, measured on the
    same ladder (combo 25.9 vs full 36.2 at tk=256):

      * min-subtract via MXU: sum_k x_k m_(k/g)n = (x @ G) @ M where G is
        the [TK, TK/g] group-membership matrix — two small extra MXU passes
        (idle unit) replace one VPU op per code.
      * f32 dot, no explicit bf16 cast: the MXU's default-precision f32
        matmul rounds its inputs to bf16 internally, so the explicit
        .astype(bf16) of the widened [TK, N] dequant temporary (a full
        VPU pass) is redundant with what the MXU does anyway.

    Numerics: flat kinds are unchanged (same bf16 roundings, done by the
    MXU instead of the VPU); q4 differs only in WHERE the min enters
    (after the products' bf16 rounding instead of before) — within the
    2e-2 kernel parity tolerances."""
    import os

    return os.environ.get("TKQ_Q4_MXU_MINS", "1") == "1"


def group_gmat(TK: int, g: int, dtype=jnp.float32) -> jnp.ndarray:
    """[TK, TK/g] group-membership matrix: G[k, j] = 1 iff k // g == j."""
    r = jax.lax.broadcasted_iota(jnp.int32, (TK, TK // g), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (TK, TK // g), 1)
    return (r // g == c).astype(dtype)


def _dot_f32(x, w):
    return jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def fold_dot_mxu(x_f32, codes_i8, s, m, g: int,
                 t_f32=None, feed_bf16: bool = False) -> jnp.ndarray:
    """One fold's [R, TN] f32 partial via the mxu_mins_enabled chain:
    per-code work is convert + scale-mul only; the min term rides the MXU.

    x_f32: [R, TK] f32 activation chunk; codes_i8: [TK, TN]; s/m:
    [TK/g, TN] f32 (m may be None); t_f32: optional precomputed
    [R, TK/g] per-group activation sums (else derived here via G).

    feed_bf16: cast the main dot's operands to bf16 explicitly. At decode
    rows (R<=32, HBM-bound, MXU idle) f32 feeds are strictly cheaper (the
    MXU rounds internally, skipping a full VPU cast pass — measured r4);
    at prefill rows (R>=256, MXU-bound) f32 operand feeds HALVE the
    effective MXU rate (same-session R=512 gu A/B: 197.6 us f32 feeds vs
    153.5 baseline), so MXU-bound callers pass feed_bf16=True and pay the
    cast to keep the systolic array at full bf16 ingest rate."""
    TK, TN = codes_i8.shape
    qf = codes_i8.astype(jnp.float32)
    w = (qf.reshape(TK // g, g, TN) * s[:, None, :]).reshape(TK, TN)
    if feed_bf16:
        d = _dot_f32(x_f32.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    else:
        d = _dot_f32(x_f32, w)
    if m is not None:
        t = t_f32 if t_f32 is not None else _dot_f32(x_f32, group_gmat(TK, g))
        d = d - _dot_f32(t, m)
    return d


def group_dot_enabled(rows: int) -> bool:
    """Per-group scale application via group_scale_dot in the decode
    megakernels. Default OFF — a documented negative result, the same
    pattern as the int8 folds: the standalone kgrid ladders win big (r5,
    same-session 8B: wqk full 29.9 us -> gdot 24.2; gu t=256 full 149.8 ->
    gdot 110.9, 59.8%% -> 80.8%% HBM, vs the OLD full chain), but the
    production megakernels already run the mxu-mins/f32-dot combo chain,
    and against IT gdot measured a wash on attn_in (32.3 vs 32.9) and a
    consistent ~14 us LOSS on the 8B ffn megakernel (two A/B pairs:
    207.4/222.1 and 193.1/206.6 off/on). TKQ_GROUP_SCALE=1 re-enables for
    re-measurement at decode rows."""
    import os

    v = os.environ.get("TKQ_GROUP_SCALE", "0")
    if v == "1":
        return rows <= 8
    return False


def sp_scales(sp_block) -> jnp.ndarray:
    """Adjacent-group bf16 scale pairs [G/2, TN] f32-container -> [G, TN]
    f32 scales (the group_scale_mul_sp unpack, without the code multiply —
    for callers that consume scales per GROUP, e.g. group_scale_dot)."""
    bits = jax.lax.bitcast_convert_type(sp_block, jnp.int32)
    e = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
    o = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
    return jnp.stack([e, o], axis=1).reshape(-1, sp_block.shape[-1])


def group_scale_dot(x_f32, codes_i8, s, m, g: int,
                    t_f32=None, xp=None) -> jnp.ndarray:
    """One fold's [R, TN] f32 partial with the scale applied PER GROUP
    instead of per code: the VPU cost of the chain drops from ~TK*TN
    (scale-mul every element) to ~2*G*R*TN (one mul+add per group per
    output), with the group dots riding the idle-at-decode MXU.

      X'[g*R+r, k] = x[r, k] * (k//g == g)      (masked block-diagonal x)
      partial      = X' @ codes                  [G*R, TN]  (ONE plain dot)
      out[r, n]    = sum_g s[g, n] * partial[g*R+r, n]  - (x@G) @ m

    Unlike int8_group_fold's batched per-group matvecs (measured negative
    in the megakernels), the group dots here are ONE standard matmul whose
    row count G*R (e.g. 64 at TK=2048, R=1) still fits a single MXU tile
    pass — at decode rows the extra MXU work is free. Codes feed the dot
    as f32 (exact: values <= 63 are exact in bf16, and the MXU's default
    precision rounds inputs itself — the mxu_mins_enabled rationale).

    Numerics: the scale now multiplies the group PARTIAL (one f32 product
    per group) instead of each code before the dot — within the kernels'
    parity tolerances, slightly FEWER roundings than the per-element form.
    """
    R, TK = x_f32.shape
    TN = codes_i8.shape[-1]
    G = TK // g
    if xp is None:
        xp = masked_groups(x_f32, g)
    partial = _dot_f32(xp, codes_i8.astype(jnp.float32))  # [G*R, TN]
    out = jnp.sum(partial.reshape(G, R, TN) * s[:, None, :], axis=0)
    if m is not None:
        t = t_f32 if t_f32 is not None else _dot_f32(x_f32, group_gmat(TK, g))
        out = out - _dot_f32(t, m)
    return out


def masked_groups(x_f32, g: int) -> jnp.ndarray:
    """The block-diagonal X' for group_scale_dot: [G*R, TK] with row
    g*R + r = x[r] masked to group g. Grid-invariant callers (the FFN
    F-tiled phases, whose x is the same every step) build it ONCE into a
    VMEM scratch at step 0 — rebuilding per tile measured away the whole
    gdot win in the lab's ngrid geometry."""
    R, TK = x_f32.shape
    G = TK // g
    rowg = jax.lax.broadcasted_iota(jnp.int32, (G * R, TK), 0) // R
    colg = jax.lax.broadcasted_iota(jnp.int32, (G * R, TK), 1) // g
    return jnp.where(rowg == colg, jnp.tile(x_f32, (G, 1)), 0.0)


def act_quant_to_scratch(xn_f32, xq_scr, xs_scr, gs_scr, g: int) -> None:
    """Quantize a [R, K] f32 activation row-block into group-major int8
    scratch: xq [K/g, g, R] i8, xs [K/g, R] f32 scales, gs [K/g, R] f32
    scale-weighted group sums (the Q8_K ``bsums``, for the q4 min term).

    The transpose + sublane-split reshape are Mosaic-legal on a kernel value
    (splitting the SUBLANE axis); splitting the lane axis of [R, K] directly
    is not, which is why the group axis must be moved to sublanes first.
    """
    K = xn_f32.shape[-1]
    xg = xn_f32.T.reshape(K // g, g, -1)  # [K/g, g, R]
    amax = jnp.max(jnp.abs(xg), axis=1, keepdims=True)  # [K/g, 1, R]
    sc = amax / 127.0
    safe = jnp.where(sc > 0, sc, 1.0)
    q = jnp.round(xg / safe)
    xq_scr[:] = q.astype(jnp.int8)
    xs_scr[:] = sc[:, 0, :]
    gs_scr[:] = sc[:, 0, :] * jnp.sum(q, axis=1)


def int8_group_fold(xq_scr, xs_scr, gs_scr, goff, Gt: int, codes_i8,
                    s, m, g: int):
    """One fold's [R, TN] f32 partial: int8 group dots + per-group rescale.

    codes_i8: [Gt*g, TN] i8 weight codes; s/m: [Gt, TN] f32 per-group
    scale/min (m None for symmetric kinds); goff: first group index of this
    fold in the activation scratch (may be traced).
    """
    TN = codes_i8.shape[-1]
    z = jax.lax.dot_general(
        xq_scr[pl.ds(goff, Gt)], codes_i8.reshape(Gt, g, TN),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [Gt, R, TN]
    xs = xs_scr[pl.ds(goff, Gt)]  # [Gt, R]
    out = z.astype(jnp.float32) * (xs[:, :, None] * s[:, None, :])
    if m is not None:
        gs = gs_scr[pl.ds(goff, Gt)]
        out = out - gs[:, :, None] * m[:, None, :]
    return jnp.sum(out, axis=0)
