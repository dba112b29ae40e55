"""Fused FFN-block Pallas megakernel: rms_norm -> gate/up qmatmul -> gated
activation -> down qmatmul -> residual add, in ONE kernel launch.

Why: the decode step is HBM-bound, but its wall time was dominated by
per-op fixed costs — ~14 XLA/Pallas dispatches per layer at a few us each
(measured via tools_ablate_decode.py: norms alone 0.107 ms/tok, rope 0.149).
The reference pays the analogous cost in ggml graph-node dispatch
(SURVEY.md 3.1: ggml_compute_forward per node); on TPU the fix is fusing the
whole block into one pallas_call whose grid pipelines the two matmuls:

  grid step j: fetch gate/up column-chunk j AND down row-chunk j,
               act_j = silu(x_n @ Wg_j) * (x_n @ Wu_j)     [R, TF]
               acc  += act_j @ Wdown_j                      [R, D]

Because swiglu is elementwise on the F axis and the down projection contracts
over F, chunk j of gate/up feeds chunk j of down directly — the two matmuls
pipeline with NO phase barrier, and Mosaic's automatic double-buffering
overlaps every weight fetch with the previous chunk's compute. Weight bytes
stream HBM->VMEM exactly once (same as ops.pallas_qmm), but five ops' worth
of dispatch overhead collapses into one.

Supported packed layouts (quant/repack.py conventions):
  gate+up (fused w_gateup, shape [2F, D]): q4 folded (sm pairs or f32
    scales+mins), q6w, q8
  down (shape [D, F]): q6w, q8 (flat codes; folded kinds would interleave
    the F axis between chunks — those fall back to the unfused path)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_kquant.ops.pallas_dequant import (
    act_quant_to_scratch,
    fold_dot_mxu,
    group_dot_enabled,
    group_scale_dot,
    group_scale_mul_sp,
    group_scale_mulsub,
    int8_folds_enabled,
    int8_group_fold,
    masked_groups,
    mxu_mins_enabled,
    q4_codes_word,
    sp_scales,
)
from tpu_kquant.quant.qtensor import QTensor
from tpu_kquant.quant.repack import GROUP_SIZE

_FLAT_KINDS = ("q6w", "q8")  # codes stored [K, N], no bit-fold on K

from tpu_kquant.ops.pallas_attn_in import _VMEM_CHUNK_ELEMS, _VMEM_LIMIT, _cap_chunk


def _pick_tf(F: int, D: int = 0, cap: int = 1024) -> int:
    """Largest divisor of F that is a multiple of 256 and <= cap; when D is
    given, additionally capped so the [TF, D] down-chunk dequant temporaries
    fit the 16MB scoped-VMEM kernel stack (see pallas_attn_in)."""
    if D:
        cap = min(cap, max(256, _VMEM_CHUNK_ELEMS // D // 256 * 256))
    best = 0
    t = 256
    while t <= cap:
        if F % t == 0:
            best = t
        t += 256
    return best


def fused_ffn_enabled(impl: str, gu: QTensor, dn: QTensor, rows: int) -> bool:
    """Dispatch gate for models.llama: fused block only where the Pallas
    path would run anyway (TPU, or interpret mode forced for tests)."""
    import os

    if os.environ.get("TKQ_FUSE_FFN", "1") != "1":
        return False
    if impl not in ("auto", "pallas", "int8"):
        return False
    if not ffn_supported(gu, dn, rows):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def ffn_supported(gu: QTensor, dn: QTensor, rows: int) -> bool:
    if gu.layout != "kmajor" or dn.layout != "kmajor":
        return False
    if rows > 32:  # prefill shapes: the plain batched kernels win
        return False
    D = gu.shape[-1]
    F = dn.shape[-1]
    if gu.shape[0] != 2 * F or dn.shape[0] != D:
        return False
    if dn.kind not in _FLAT_KINDS:
        return False
    if gu.kind not in ("q4",) + _FLAT_KINDS:
        return False
    if D % 512 or _pick_tf(F, D) == 0:
        return False
    return True


def _decode_sm(sm_block):
    """Packed bf16 (scale, min) pairs in an f32 container -> (s, m) f32."""
    bits = jax.lax.bitcast_convert_type(sm_block, jnp.int32)
    s = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
    m = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
    return s, m


def _ffn_kernel(gu_kind, dn_kind, gu_sm, gu_sp, gu_mins, dn_sp, i8, mxu,
                gdot, D, F, TF, nf, eps, act_fn, *refs):
    it = iter(refs)
    x_ref = next(it)
    nw_ref = next(it)
    g_qs = next(it)
    u_qs = next(it)
    g_s = next(it)
    u_s = next(it)
    g_m = next(it) if gu_mins else None
    u_m = next(it) if gu_mins else None
    d_qs = next(it)
    d_s = next(it)
    o_ref = next(it)
    acc = next(it)
    if i8:
        xq_scr, xs_scr, gs_scr = next(it), next(it), next(it)
    xp_scr = next(it) if gdot else None

    j = pl.program_id(0)
    g4 = GROUP_SIZE[gu_kind]

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        if gdot:
            # grid-invariant X' (masked block-diagonal normed x) built ONCE:
            # the F-tiled grid reuses it every step (pallas_dequant
            # .masked_groups rationale)
            xf0 = x_ref[:].astype(jnp.float32)
            var0 = jnp.mean(xf0 * xf0, axis=-1, keepdims=True)
            xn0 = xf0 * jax.lax.rsqrt(var0 + eps) * nw_ref[:].astype(
                jnp.float32)
            rows_h = xp_scr.shape[0] // 2
            xp_scr[:rows_h] = masked_groups(xn0[:, : D // 2], g4)
            xp_scr[rows_h:] = masked_groups(xn0[:, D // 2:], g4)
        if i8:
            # int8 folds: norm + Q8_K-style activation quant ONCE into
            # scratch; every gate/up chunk then runs int8 group dots
            xf0 = x_ref[:].astype(jnp.float32)
            var0 = jnp.mean(xf0 * xf0, axis=-1, keepdims=True)
            xn0 = xf0 * jax.lax.rsqrt(var0 + eps) * nw_ref[:].astype(jnp.float32)
            act_quant_to_scratch(xn0, xq_scr, xs_scr, gs_scr, g4)

    if not i8:
        # rms_norm recomputed per step (R*D VPU flops — noise next to the DMA)
        xf = x_ref[:].astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xn = xf * jax.lax.rsqrt(var + eps) * nw_ref[:].astype(jnp.float32)
        if not mxu:
            xn = xn.astype(jnp.bfloat16)

    def gu_matmul(qs_ref, s_ref, m_ref):
        """x_n @ dequant(W_chunk) -> [R, TF] f32."""
        g = GROUP_SIZE[gu_kind]
        if gu_kind in _FLAT_KINDS:
            if gu_sp:
                w = group_scale_mul_sp(qs_ref[:].astype(jnp.float32),
                                       s_ref[:], g)
            else:
                w = group_scale_mulsub(
                    qs_ref[:].astype(jnp.float32),
                    s_ref[:].astype(jnp.float32),
                    m_ref[:].astype(jnp.float32) if m_ref is not None else None,
                    g)
            return jax.lax.dot_general(
                xn, w if mxu else w.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        # q4 folded: packed row k carries elements k (lo) and k + D/2 (hi);
        # nibbles extracted at i32-word level (pallas_dequant)
        if gu_sm:
            s_all, m_all = _decode_sm(s_ref[:])
        else:
            s_all = s_ref[:].astype(jnp.float32)
            m_all = m_ref[:].astype(jnp.float32) if m_ref is not None else None
        half_g = (D // 2) // g
        out = None
        for hi in (False, True):
            sl = slice(half_g, None) if hi else slice(0, half_g)
            s_h = s_all[sl]
            m_h = m_all[sl] if m_all is not None else None
            if i8:
                d = int8_group_fold(
                    xq_scr, xs_scr, gs_scr, half_g if hi else 0, half_g,
                    q4_codes_word(qs_ref[:], hi), s_h, m_h, g)
            elif gdot:
                rows_h = xp_scr.shape[0] // 2
                d = group_scale_dot(
                    xn[:, D // 2:] if hi else xn[:, : D // 2],
                    q4_codes_word(qs_ref[:], hi), s_h, m_h, g,
                    xp=xp_scr[rows_h:] if hi else xp_scr[:rows_h])
            elif mxu:
                d = fold_dot_mxu(xn[:, D // 2:] if hi else xn[:, : D // 2],
                                 q4_codes_word(qs_ref[:], hi), s_h, m_h, g)
            else:
                q = q4_codes_word(qs_ref[:], hi).astype(jnp.float32)
                w = group_scale_mulsub(q, s_h, m_h, g)
                d = jax.lax.dot_general(
                    xn[:, D // 2:] if hi else xn[:, : D // 2],
                    w.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            out = d if out is None else out + d
        return out

    gate = gu_matmul(g_qs, g_s, g_m).astype(jnp.bfloat16).astype(jnp.float32)
    up = gu_matmul(u_qs, u_s, u_m).astype(jnp.bfloat16).astype(jnp.float32)
    if act_fn == "gelu":
        a = jax.nn.gelu(gate, approximate=False) * up
    else:
        a = jax.nn.silu(gate) * up
    a = a.astype(jnp.bfloat16)

    # down chunk: rows [j*TF, (j+1)*TF) of the flat [F, D] codes
    gd = GROUP_SIZE[dn_kind]
    if gdot and dn_kind in _FLAT_KINDS:
        # per-group scales on the down dot too: a changes per chunk, so X'
        # builds inline (TF-sized — cheap, unlike the gu full-D case)
        sv = (sp_scales(d_s[:]) if dn_sp
              else d_s[:].astype(jnp.float32))
        acc[:] = acc[:] + group_scale_dot(
            a.astype(jnp.float32), d_qs[:], sv, None, gd)
    else:
        if dn_sp:
            wd = group_scale_mul_sp(d_qs[:].astype(jnp.float32), d_s[:], gd)
        else:
            wd = group_scale_mulsub(d_qs[:].astype(jnp.float32),
                                    d_s[:].astype(jnp.float32), None, gd)
        acc[:] = acc[:] + jax.lax.dot_general(
            a.astype(jnp.float32) if mxu else a,
            wd if mxu else wd.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == nf - 1)
    def _():
        o_ref[:] = (x_ref[:].astype(jnp.float32) + acc[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("gu_kind", "dn_kind", "gu_keys", "dn_keys", "D", "F",
                     "eps", "act_fn", "out_dtype", "interpret", "tf", "i8",
                     "mxu", "gdot"),
)
def _ffn_call(x2d, norm_w, gu_arrays, dn_arrays, gu_kind, dn_kind, gu_keys,
              dn_keys, D, F, eps, act_fn, out_dtype, interpret, tf, i8=False,
              mxu=False, gdot=False):
    gu = dict(zip(gu_keys, gu_arrays))
    dn = dict(zip(dn_keys, dn_arrays))
    R = x2d.shape[0]
    TF = tf or _pick_tf(F, D)
    nf = F // TF
    gu_sm = "sm" in gu
    gu_sp = "sp" in gu
    gu_mins = "mins" in gu
    dn_sp = "sp" in dn
    g4 = GROUP_SIZE[gu_kind]
    gd = GROUP_SIZE[dn_kind]
    i8 = i8 and gu_kind == "q4"
    gdot = gdot and gu_kind == "q4" and mxu and not i8

    x_spec = pl.BlockSpec((R, D), lambda j: (0, 0), memory_space=pltpu.VMEM)
    nw_spec = pl.BlockSpec((1, D), lambda j: (0, 0), memory_space=pltpu.VMEM)

    # gate/up packed code blocks: column-chunk j (gate) and F//TF + j (up)
    qs_rows = gu["qs"].shape[0]  # D/2 folded, D flat
    gqs_spec = pl.BlockSpec((qs_rows, TF), lambda j: (0, j),
                            memory_space=pltpu.VMEM)
    uqs_spec = pl.BlockSpec((qs_rows, TF), lambda j: (0, F // TF + j),
                            memory_space=pltpu.VMEM)
    s_key = "sm" if gu_sm else ("sp" if gu_sp else "scales")
    s_rows = gu[s_key].shape[0]  # D/g (D/2g for sp)
    gs_spec = pl.BlockSpec((s_rows, TF), lambda j: (0, j),
                           memory_space=pltpu.VMEM)
    us_spec = pl.BlockSpec((s_rows, TF), lambda j: (0, F // TF + j),
                           memory_space=pltpu.VMEM)

    in_specs = [x_spec, nw_spec, gqs_spec, uqs_spec, gs_spec, us_spec]
    inputs = [x2d, norm_w.reshape(1, D), gu["qs"], gu["qs"], gu[s_key],
              gu[s_key]]
    if gu_mins:
        in_specs += [gs_spec, us_spec]
        inputs += [gu["mins"], gu["mins"]]

    in_specs.append(pl.BlockSpec((TF, D), lambda j: (j, 0),
                                 memory_space=pltpu.VMEM))
    inputs.append(dn["qs"])
    d_s_rows = TF // (2 * gd) if dn_sp else TF // gd
    in_specs.append(pl.BlockSpec((d_s_rows, D), lambda j: (j, 0),
                                 memory_space=pltpu.VMEM))
    inputs.append(dn["sp"] if dn_sp else dn["scales"])

    kernel = functools.partial(_ffn_kernel, gu_kind, dn_kind, gu_sm, gu_sp,
                               gu_mins, dn_sp, i8, mxu, gdot, D, F, TF, nf,
                               eps, act_fn)
    bytes_accessed = (
        sum(v.size * v.dtype.itemsize for v in gu.values())
        + sum(v.size * v.dtype.itemsize for v in dn.values())
        + 4 * R * D * 2
    )
    scratch = [pltpu.VMEM((R, D), jnp.float32)]
    if i8:
        scratch += [pltpu.VMEM((D // g4, g4, R), jnp.int8),
                    pltpu.VMEM((D // g4, R), jnp.float32),
                    pltpu.VMEM((D // g4, R), jnp.float32)]
    if gdot:
        scratch.append(
            pltpu.VMEM((2 * ((D // 2) // g4) * R, D // 2), jnp.float32))
    y = pl.pallas_call(
        kernel,
        grid=(nf,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, D), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, D), jnp.dtype(out_dtype)),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * R * D * 3 * F, bytes_accessed=bytes_accessed,
            transcendentals=R * F,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*inputs)
    return y


def fused_ffn(
    x: jnp.ndarray,  # [..., D] residual stream
    norm_w: jnp.ndarray,  # [D]
    eps: float,
    gu: QTensor,  # fused gate+up [2F, D]
    dn: QTensor,  # down [D, F]
    act_fn: str = "silu",
    out_dtype=None,
    interpret: bool = False,
    tf: int | None = None,
) -> jnp.ndarray:
    """x + down(act(gate(x_n), up(x_n))) with x_n = rms_norm(x, norm_w)."""
    out_dtype = out_dtype or x.dtype
    D = x.shape[-1]
    F = dn.shape[-1]
    lead = x.shape[:-1]
    x2d = x.reshape(-1, D)
    gu_keys = tuple(sorted(gu.arrays))
    dn_keys = tuple(sorted(dn.arrays))
    y = _ffn_call(
        x2d, norm_w, tuple(gu.arrays[k] for k in gu_keys),
        tuple(dn.arrays[k] for k in dn_keys), gu.kind, dn.kind, gu_keys,
        dn_keys, D, F, float(eps), act_fn, jnp.dtype(out_dtype).name,
        interpret, tf, i8=int8_folds_enabled(), mxu=mxu_mins_enabled(),
        gdot=group_dot_enabled(x2d.shape[0]),
    )
    return y.reshape(*lead, D)


# ---------------------------------------------------------------------------
# o_proj + residual + FFN block in ONE launch
# ---------------------------------------------------------------------------
#
# fused_oproj_ffn extends the FFN megakernel with a K-chunked o_proj PROLOGUE:
#
#   grid step j < nko:  acc_x += attn[:, chunk_j] @ dequant(Wo chunk j)
#   at j == nko-1:      x2 = x + acc_x                (attention residual)
#   grid step j >= nko: the fused_ffn pipeline on x2  (norm -> gate/up ->
#                       act -> down -> +x2)
#
# This removes the separate o_proj qmatmul + residual-add dispatches per layer
# and keeps every phase a pipelined qmm step (weight DMA overlapped with the
# previous chunk's dequant+matmul) — unlike folding o_proj into the attention
# kernel, whose KV-tile grid steps are too small to hide the Wo stream at
# decode-shape S (measured: 715 -> 514 t/s tg128, rejected). The attention
# region itself stays the XLA-fused path at decode shapes (ops.attention).
#
# Wo is kmajor [dim, K=H*D]: folded q4 chunks use the attn-in lo/hi-nibble
# activation split; flat kinds (q6w/q8) fetch lo/hi row blocks.


def oproj_ffn_supported(wo: QTensor, gu: QTensor, dn: QTensor,
                        rows: int) -> bool:
    if not ffn_supported(gu, dn, rows):
        return False
    if wo.layout != "kmajor" or wo.kind not in ("q4",) + _FLAT_KINDS:
        return False
    dim = gu.shape[-1]
    K = int(wo.shape[-1])
    if wo.shape[0] != dim or K % 1024:
        return False
    return True


def oproj_ffn_enabled(impl: str, wo: QTensor, gu: QTensor, dn: QTensor,
                      rows: int) -> bool:
    import os

    if os.environ.get("TKQ_FUSE_OPROJ", "1") != "1":
        return False
    if impl not in ("auto", "pallas", "int8"):
        return False
    if not oproj_ffn_supported(wo, gu, dn, rows):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _oproj_ffn_kernel(wo_kind, wo_sm, wo_sp, wo_mins, gu_kind, dn_kind,
                      gu_sm, gu_sp, gu_mins, dn_sp, i8_wo, i8_gu, mxu, dim,
                      K, TKo2, nko, F, TF, nf, eps, act_fn, *refs):
    it = iter(refs)
    x_ref = next(it)
    nw_ref = next(it)
    if i8_wo:
        a_full_ref = next(it)  # [R, K] attention output, fetched once
        a_lo_ref = a_hi_ref = None
    else:
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
    o_ref = next(it)
    acc_x = next(it)   # [R, dim] f32: o_proj accumulator
    x2_scr = next(it)  # [R, dim] bf16: post-attention residual stream
    acc = next(it)     # [R, dim] f32: FFN down accumulator
    if i8_wo:
        aq_scr, as_scr, ags_scr = next(it), next(it), next(it)
    if i8_gu:
        xq_scr, xs_scr, gs_scr = next(it), next(it), next(it)

    j = pl.program_id(0)
    gw = GROUP_SIZE[wo_kind]
    g4 = GROUP_SIZE[gu_kind]

    @pl.when(j == 0)
    def _():
        acc_x[:] = jnp.zeros_like(acc_x)
        acc[:] = jnp.zeros_like(acc)
        if i8_wo:
            act_quant_to_scratch(a_full_ref[:].astype(jnp.float32),
                                 aq_scr, as_scr, ags_scr, gw)

    def mm(x, w):
        return jax.lax.dot_general(
            x, w if mxu else w.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    a_dt = jnp.float32 if mxu else jnp.bfloat16

    # ---- phase A: o_proj K-chunk ------------------------------------------
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
                if i8_wo:
                    # chunk j's lo fold = elements [j*TKo2, (j+1)*TKo2),
                    # hi fold = the same rows + K/2
                    goff = (K // 2) // gw * hi + j * (TKo2 // gw)
                    d = int8_group_fold(
                        aq_scr, as_scr, ags_scr, goff, TKo2 // gw,
                        q4_codes_word(wo_qs[0][:], bool(hi)), sc, mn, gw)
                elif mxu:
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
        # attention residual; round acc to bf16 first (matches the unfused
        # qmatmul output dtype), add in f32, round once
        h = acc_x[:].astype(jnp.bfloat16).astype(jnp.float32)
        x2 = x_ref[:].astype(jnp.float32) + h
        x2_scr[:] = x2.astype(jnp.bfloat16)
        if i8_gu:
            # norm + activation quant of the FFN input ONCE, here at the
            # phase boundary (x2 just became available)
            x2r = x2_scr[:].astype(jnp.float32)
            var0 = jnp.mean(x2r * x2r, axis=-1, keepdims=True)
            xn0 = x2r * jax.lax.rsqrt(var0 + eps) * nw_ref[:].astype(jnp.float32)
            act_quant_to_scratch(xn0, xq_scr, xs_scr, gs_scr, g4)

    # ---- phase B: FFN block on x2 (fused_ffn pipeline) --------------------
    @pl.when(j >= nko)
    def _():
        if not i8_gu:
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
                s_h = s_all[sl]
                m_h = m_all[sl] if m_all is not None else None
                if i8_gu:
                    d = int8_group_fold(
                        xq_scr, xs_scr, gs_scr, half_g if hi else 0, half_g,
                        q4_codes_word(qs_ref[:], hi), s_h, m_h, g)
                elif mxu:
                    d = fold_dot_mxu(
                        xn[:, dim // 2:] if hi else xn[:, : dim // 2],
                        q4_codes_word(qs_ref[:], hi), s_h, m_h, g)
                else:
                    q = q4_codes_word(qs_ref[:], hi).astype(jnp.float32)
                    w = group_scale_mulsub(q, s_h, m_h, g)
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
        o_ref[:] = (x2_scr[:].astype(jnp.float32) + acc[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("wo_kind", "gu_kind", "dn_kind", "wo_keys", "gu_keys",
                     "dn_keys", "dim", "K", "F", "eps", "act_fn", "out_dtype",
                     "interpret", "tko", "tf", "i8", "mxu"),
)
def _oproj_ffn_call(x2d, attn2d, norm_w, wo_arrays, gu_arrays, dn_arrays,
                    wo_kind, gu_kind, dn_kind, wo_keys, gu_keys, dn_keys,
                    dim, K, F, eps, act_fn, out_dtype, interpret, tko, tf,
                    i8=False, mxu=False):
    wo = dict(zip(wo_keys, wo_arrays))
    gu = dict(zip(gu_keys, gu_arrays))
    dn = dict(zip(dn_keys, dn_arrays))
    R = x2d.shape[0]
    i8_wo = i8 and wo_kind == "q4"
    i8_gu = i8 and gu_kind == "q4"

    TKo2 = tko
    while (K // 2) % TKo2:
        TKo2 //= 2
    # scoped-VMEM cap on the Wo chunk's dequant temporaries (pallas_attn_in)
    TKo2 = _cap_chunk(TKo2, dim, 256)
    nko = (K // 2) // TKo2
    TF = tf or _pick_tf(F, dim)
    nf = F // TF
    n_steps = nko + nf

    wo_sm = "sm" in wo
    wo_sp = "sp" in wo
    wo_mins = "mins" in wo
    gu_sm = "sm" in gu
    gu_sp = "sp" in gu
    gu_mins = "mins" in gu
    dn_sp = "sp" in dn
    gw = GROUP_SIZE[wo_kind]
    gd = GROUP_SIZE[dn_kind]

    def clampo(j):
        return jnp.minimum(j, nko - 1)

    def clampf(j):
        return jnp.clip(j - nko, 0, nf - 1)

    x_spec = pl.BlockSpec((R, dim), lambda j: (0, 0), memory_space=pltpu.VMEM)
    nw_spec = pl.BlockSpec((1, dim), lambda j: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [x_spec, nw_spec]
    inputs = [x2d, norm_w.reshape(1, dim)]
    if i8_wo:
        # int8 folds read the quantized attn scratch; fetch attn once whole
        in_specs.append(pl.BlockSpec((R, K), lambda j: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(attn2d)
    else:
        alo_spec = pl.BlockSpec((R, TKo2), lambda j: (0, clampo(j)),
                                memory_space=pltpu.VMEM)
        ahi_spec = pl.BlockSpec((R, TKo2), lambda j: (0, nko + clampo(j)),
                                memory_space=pltpu.VMEM)
        in_specs += [alo_spec, ahi_spec]
        inputs += [attn2d, attn2d]

    # Wo chunk blocks (kmajor [K(/2), dim])
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

    # gate/up + down blocks (fused_ffn geometry, clamped to phase B)
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

    kernel = functools.partial(_oproj_ffn_kernel, wo_kind, wo_sm, wo_sp,
                               wo_mins, gu_kind, dn_kind, gu_sm, gu_sp,
                               gu_mins, dn_sp, i8_wo, i8_gu, mxu,
                               dim, K, TKo2, nko, F, TF, nf, eps, act_fn)
    bytes_accessed = (
        sum(v.size * v.dtype.itemsize for v in wo.values())
        + sum(v.size * v.dtype.itemsize for v in gu.values())
        + sum(v.size * v.dtype.itemsize for v in dn.values())
        + 2 * R * (K + 3 * dim)
    )
    scratch = [
        pltpu.VMEM((R, dim), jnp.float32),
        pltpu.VMEM((R, dim), jnp.bfloat16),
        pltpu.VMEM((R, dim), jnp.float32),
    ]
    if i8_wo:
        scratch += [pltpu.VMEM((K // gw, gw, R), jnp.int8),
                    pltpu.VMEM((K // gw, R), jnp.float32),
                    pltpu.VMEM((K // gw, R), jnp.float32)]
    if i8_gu:
        g4 = GROUP_SIZE[gu_kind]
        scratch += [pltpu.VMEM((dim // g4, g4, R), jnp.int8),
                    pltpu.VMEM((dim // g4, R), jnp.float32),
                    pltpu.VMEM((dim // g4, R), jnp.float32)]
    y = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, dim), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, dim), jnp.dtype(out_dtype)),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * R * dim * (K + 3 * F), bytes_accessed=bytes_accessed,
            transcendentals=R * F,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*inputs)
    return y


def fused_oproj_ffn(
    x: jnp.ndarray,  # [..., dim] residual stream (pre-attention-residual)
    attn: jnp.ndarray,  # [..., K] attention output (pre-o_proj)
    wo: QTensor,  # [dim, K] kmajor
    norm_w: jnp.ndarray,  # [dim] ffn norm weight
    eps: float,
    gu: QTensor,  # fused gate+up [2F, dim]
    dn: QTensor,  # down [dim, F]
    act_fn: str = "silu",
    out_dtype=None,
    interpret: bool = False,
    tko: int = 1024,  # same-session sweep r3: tko=1024/tf=512 52.9 us vs
    #                   54.4 at tko=512 (VMEM cap still bounds 8B chunks)
    tf: int | None = None,
) -> jnp.ndarray:
    """x2 + ffn(x2) with x2 = x + attn @ Wo^T; one kernel launch."""
    out_dtype = out_dtype or x.dtype
    dim = x.shape[-1]
    K = attn.shape[-1]
    F = dn.shape[-1]
    lead = x.shape[:-1]
    x2d = x.reshape(-1, dim)
    if manual_oproj_enabled(wo, gu, dn, x2d.shape[0]) and not interpret:
        import os

        y = _oproj_ffn_manual_call(
            x2d, attn.reshape(-1, K), norm_w, wo.arrays["qs"],
            wo.arrays["sm"], gu.arrays["qs"], gu.arrays["sm"],
            dn.arrays["qs"], dn.arrays["sp"], dim, K, F, float(eps), act_fn,
            jnp.dtype(out_dtype).name, interpret,
            int(os.environ.get("TKQ_MANUAL_TKO", "512")),
            int(os.environ.get("TKQ_MANUAL_TF", "1024")))
        return y.reshape(*lead, dim)
    wo_keys = tuple(sorted(wo.arrays))
    gu_keys = tuple(sorted(gu.arrays))
    dn_keys = tuple(sorted(dn.arrays))
    y = _oproj_ffn_call(
        x.reshape(-1, dim), attn.reshape(-1, K), norm_w,
        tuple(wo.arrays[k] for k in wo_keys),
        tuple(gu.arrays[k] for k in gu_keys),
        tuple(dn.arrays[k] for k in dn_keys),
        wo.kind, gu.kind, dn.kind, wo_keys, gu_keys, dn_keys,
        dim, K, F, float(eps), act_fn, jnp.dtype(out_dtype).name, interpret,
        tko, tf, i8=int8_folds_enabled(), mxu=mxu_mins_enabled(),
    )
    return y.reshape(*lead, dim)



# ---------------------------------------------------------------------------
# MANUAL-pipeline o_proj + residual + FFN (r5)
#
# Same finding as pallas_attn_in's manual variant: a hand-rolled
# double-buffered DMA loop overlaps the VPU dequant chain with the weight
# stream where Mosaic's automatic grid pipeline does not. Additionally the
# FFN phase's first chunk is prefetched BEFORE the o_proj loop starts, so
# the phase transition has no pipeline-refill bubble. Supported layout is
# the production Q4_K_M shape set (wo q4-sm, fused gate+up q4-sm, down
# flat-sp) at decode rows; everything else falls back to the Mosaic kernel.
# ---------------------------------------------------------------------------


def _oproj_ffn_manual_kernel(dim, K, TKo, nko, F, TF, nf, eps, act_fn,
                             gw, g4, gd,
                             x_ref, nw_ref, attn_ref, wo_qs, wo_sm, gu_qs,
                             gu_sm, dn_qs, dn_sp, o_ref,
                             bwo, bwosm, bwosmh, bg, bu, bgsm, busm, bd,
                             bdsp, accx, acc, x2n, sems):
    from tpu_kquant.ops.pallas_dequant import fold_dot_mxu, group_scale_mul_sp

    sgw = TKo // gw
    sgu = (dim // 2) // g4  # gu sm rows (per fold) — full column slices
    sgd = TF // (2 * gd)

    def wo_copies(i, slot):
        return (
            pltpu.make_async_copy(wo_qs.at[pl.ds(i * TKo, TKo)],
                                  bwo.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(wo_sm.at[pl.ds(i * sgw, sgw)],
                                  bwosm.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(
                wo_sm.at[pl.ds((K // 2) // gw + i * sgw, sgw)],
                bwosmh.at[slot], sems.at[slot, 2]),
        )

    def ffn_copies(j, slot):
        return (
            pltpu.make_async_copy(gu_qs.at[:, pl.ds(j * TF, TF)],
                                  bg.at[slot], sems.at[slot, 3]),
            pltpu.make_async_copy(gu_qs.at[:, pl.ds(F + j * TF, TF)],
                                  bu.at[slot], sems.at[slot, 4]),
            pltpu.make_async_copy(gu_sm.at[:, pl.ds(j * TF, TF)],
                                  bgsm.at[slot], sems.at[slot, 5]),
            pltpu.make_async_copy(gu_sm.at[:, pl.ds(F + j * TF, TF)],
                                  busm.at[slot], sems.at[slot, 6]),
            pltpu.make_async_copy(dn_qs.at[pl.ds(j * TF, TF)],
                                  bd.at[slot], sems.at[slot, 7]),
            pltpu.make_async_copy(dn_sp.at[pl.ds(j * sgd, sgd)],
                                  bdsp.at[slot], sems.at[slot, 8]),
        )

    def start(copies):
        for c in copies:
            c.start()

    def wait(copies):
        for c in copies:
            c.wait()

    accx[:] = jnp.zeros_like(accx)
    acc[:] = jnp.zeros_like(acc)
    # prefetch BOTH phase streams' first chunks up front: the FFN phase's
    # window fills while the o_proj loop runs
    start(wo_copies(0, 0))
    start(ffn_copies(0, 0))

    # ---- phase A: o_proj (attn @ Wo), K-chunked -------------------------
    def body_a(i, carry):
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < nko)
        def _():
            start(wo_copies(i + 1, nslot))

        wait(wo_copies(i, slot))
        a0 = None
        for hi in (0, 1):
            a_chunk = attn_ref[
                :, pl.ds((K // 2 if hi else 0) + i * TKo, TKo)
            ].astype(jnp.float32)
            s, m = _decode_sm((bwosmh if hi else bwosm)[slot])
            d = fold_dot_mxu(a_chunk, q4_codes_word(bwo[slot], bool(hi)),
                             s, m, gw)
            a0 = d if a0 is None else a0 + d
        accx[:] = accx[:] + a0
        return carry

    jax.lax.fori_loop(0, nko, body_a, 0)

    # residual + norm (bf16 rounding parity with the Mosaic kernel)
    x2 = (x_ref[:].astype(jnp.float32) + accx[:]).astype(jnp.bfloat16)
    x2f = x2.astype(jnp.float32)
    var = jnp.mean(x2f * x2f, axis=-1, keepdims=True)
    x2n[:] = x2f * jax.lax.rsqrt(var + eps) * nw_ref[:].astype(jnp.float32)

    # ---- phase B: FFN, F-tiled ------------------------------------------
    def body_b(j, carry):
        slot = jax.lax.rem(j, 2)
        nslot = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < nf)
        def _():
            start(ffn_copies(j + 1, nslot))

        wait(ffn_copies(j, slot))
        xn = x2n[:]

        def gu_mm(qref, smref):
            out = None
            for hi in (0, 1):
                sm_all = smref[slot]
                s, m = _decode_sm(sm_all[sgu:] if hi else sm_all[:sgu])
                d = fold_dot_mxu(
                    xn[:, dim // 2:] if hi else xn[:, : dim // 2],
                    q4_codes_word(qref[slot], bool(hi)), s, m, g4)
                out = d if out is None else out + d
            return out

        gate = gu_mm(bg, bgsm).astype(jnp.bfloat16).astype(jnp.float32)
        up = gu_mm(bu, busm).astype(jnp.bfloat16).astype(jnp.float32)
        if act_fn == "gelu":
            a = jax.nn.gelu(gate, approximate=False) * up
        else:
            a = jax.nn.silu(gate) * up
        a = a.astype(jnp.bfloat16)
        wd = group_scale_mul_sp(bd[slot].astype(jnp.float32), bdsp[slot], gd)
        acc[:] = acc[:] + jax.lax.dot_general(
            a.astype(jnp.float32), wd,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, nf, body_b, 0)
    o_ref[:] = (x2f + acc[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("dim", "K", "F", "eps", "act_fn", "out_dtype",
                     "interpret", "tko", "tf"),
)
def _oproj_ffn_manual_call(x2d, attn2d, norm_w, wo_qs, wo_sm, gu_qs, gu_sm,
                           dn_qs, dn_sp, dim, K, F, eps, act_fn, out_dtype,
                           interpret, tko, tf):
    R = x2d.shape[0]
    gw = g4 = 32
    gd = 16
    TKo = tko
    while (K // 2) % TKo:
        TKo //= 2
    nko = (K // 2) // TKo
    TF = tf
    while F % TF:
        TF //= 2
    nf = F // TF
    sgw = TKo // gw
    sgu2 = 2 * ((dim // 2) // g4)  # full gu sm rows (both folds)
    sgd = TF // (2 * gd)

    kernel = functools.partial(_oproj_ffn_manual_kernel, dim, K, TKo, nko,
                               F, TF, nf, eps, act_fn, gw, g4, gd)
    y = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # norm_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # attn
            pl.BlockSpec(memory_space=pltpu.ANY),   # wo qs
            pl.BlockSpec(memory_space=pltpu.ANY),   # wo sm
            pl.BlockSpec(memory_space=pltpu.ANY),   # gu qs
            pl.BlockSpec(memory_space=pltpu.ANY),   # gu sm
            pl.BlockSpec(memory_space=pltpu.ANY),   # dn qs
            pl.BlockSpec(memory_space=pltpu.ANY),   # dn sp
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, dim), jnp.dtype(out_dtype)),
        scratch_shapes=[
            pltpu.VMEM((2, TKo, dim), jnp.uint8),       # bwo
            pltpu.VMEM((2, sgw, dim), jnp.float32),     # bwosm
            pltpu.VMEM((2, sgw, dim), jnp.float32),     # bwosmh
            pltpu.VMEM((2, dim // 2, TF), jnp.uint8),   # bg
            pltpu.VMEM((2, dim // 2, TF), jnp.uint8),   # bu
            pltpu.VMEM((2, sgu2, TF), jnp.float32),     # bgsm
            pltpu.VMEM((2, sgu2, TF), jnp.float32),     # busm
            pltpu.VMEM((2, TF, dim), dn_qs.dtype),      # bd
            pltpu.VMEM((2, sgd, dim), jnp.float32),     # bdsp
            pltpu.VMEM((R, dim), jnp.float32),          # accx
            pltpu.VMEM((R, dim), jnp.float32),          # acc
            pltpu.VMEM((R, dim), jnp.float32),          # x2n
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x2d, norm_w.reshape(1, dim), attn2d, wo_qs, wo_sm, gu_qs, gu_sm,
      dn_qs, dn_sp)
    return y


def manual_oproj_enabled(wo: QTensor, gu: QTensor, dn: QTensor,
                         rows: int) -> bool:
    """Manual-pipeline dispatch for the o_proj+FFN megakernel: the Q4_K_M
    production layout (wo q4-sm, gate+up q4-sm, down flat-sp) at decode
    rows. TKQ_MANUAL_OPROJ=0 restores the Mosaic grid kernel."""
    import os

    if os.environ.get("TKQ_MANUAL_OPROJ", "1") != "1":
        return False
    if rows > 8:
        return False
    if wo.kind != "q4" or "sm" not in wo.arrays:
        return False
    if gu.kind != "q4" or "sm" not in gu.arrays:
        return False
    if dn.kind not in _FLAT_KINDS or "sp" not in dn.arrays:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
