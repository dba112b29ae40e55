"""Fused dequant+matmul Pallas kernels — the TPU replacement for the
reference's hand-written NEON vec-dot hot loop.

Reference analog (SURVEY.md 3.1): ggml_vec_dot_q4_K_q8_K (67.15% of decode
cycles) + ggml_vec_dot_q6_K_q8_K (25.93%) at quants.c:2059, whose optimization
lesson was "keep accumulation in-lane, avoid register-domain crossings"
(reference README.md:1425-1480). The TPU translation: packed 4/6-bit weights
stream HBM->VMEM exactly once, the VPU unpacks+dequantizes in-tile, and the
MXU contracts bf16 tiles with f32 accumulation in a VMEM scratch accumulator —
no horizontal reductions, no int<->float round trips per sub-block.

Layout contract (see quant/repack.py): a packed byte row k of ``qs`` carries
codes for logical rows k and k + K/2 (the "folded-K" convention). Each grid
step therefore dequantizes BOTH folds of its tile — every packed byte is
loaded exactly once per output tile, which is what makes the kernel
HBM-bandwidth-optimal. Side inputs (x, scales, mins) are passed twice with
offset index maps to address the two folds.

y[b, n] = sum_k x[b, k] * (scales[k//g, n] * q[k, n] - mins[k//g, n])
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_kquant.ops.pallas_dequant import (
    fold_dot_mxu,
    group_scale_mul_sp,
    group_scale_mulsub,
    mxu_mins_enabled,
    q4_codes_word,
)
from tpu_kquant.quant.qtensor import QTensor
from tpu_kquant.quant.repack import GROUP_SIZE


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _pow2_divisor(v: int, cap: int) -> int:
    t = 1
    while t * 2 <= cap and v % (t * 2) == 0:
        t *= 2
    return t


_MIN_K = {"q4": 512, "q5": 2048, "q6": 512, "q2": 512, "q3": 1024, "q8": 256,
          "q6w": 256}


def pallas_supported(kind: str, K: int) -> bool:
    """Mosaic requires scale blocks >= 8 sublanes: TK2 >= 8*g, which bounds
    the minimum K per kind (TK2 must divide the finest fold)."""
    return kind in _MIN_K and K >= _MIN_K[kind] and K % 256 == 0 or (
        kind == "q8" and K >= 256 and K % 32 == 0
    )


def _dyn_rshift(arr: jnp.ndarray, shift) -> jnp.ndarray:
    """Right-shift an i32 tile by a traced scalar (broadcast on the VPU).

    Mosaic only supports vector shifts at i32 width, so packed tiles are
    widened before any bit manipulation.
    """
    return jax.lax.shift_right_logical(arr, jnp.full(arr.shape, shift, arr.dtype))


def _codes_for_fold(kind, qs, qh, a, K, hi_fold):
    """Unpack one fold's integer codes from the packed tiles.

    a: traced element offset of the LO fold of this tile (= k * TK2).
    hi_fold: static — whether this is the k + K/2 fold.
    """
    if kind in ("q8", "q6w"):
        return qs
    if kind in ("q4", "q5", "q6"):
        q4 = (qs >> 4) if hi_fold else (qs & 0xF)
        if kind == "q4":
            return q4
        if kind == "q5":
            sh = a // (K // 8) + (4 if hi_fold else 0)
            return q4 | ((_dyn_rshift(qh, sh) & 1) << 4)
        sh = 2 * (a // (K // 4)) + (4 if hi_fold else 0)
        return q4 | ((_dyn_rshift(qh, sh) & 3) << 4)
    # q2 / q3: 2-bit base codes packed 4-fold
    sh = 2 * (a // (K // 4)) + (4 if hi_fold else 0)
    q2 = _dyn_rshift(qs, sh) & 3
    if kind == "q2":
        return q2
    shh = a // (K // 8) + (4 if hi_fold else 0)
    return q2 | ((_dyn_rshift(qh, shh) & 1) << 2)


def _qmm_kernel(kind, g, K, TK2, nk, has_qh, has_mins, has_hi, has_sm,
                has_sp, mxu, *refs):
    it = iter(refs)
    x_lo = next(it)
    x_hi = next(it) if has_hi else None
    qs_ref = next(it)
    qh_ref = next(it) if has_qh else None
    s_lo = next(it)  # 'sm' packed-pair ref when has_sm (see half())
    s_hi = next(it) if has_hi else None
    m_lo = next(it) if has_mins else None
    m_hi = next(it) if (has_mins and has_hi) else None
    o_ref = next(it)
    acc = next(it)

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    # widen packed bytes to i32 once: Mosaic vector shifts/casts need i32
    # (u8 zero-extends; q8's i8 sign-extends — both what we want). q4 skips
    # the widen: nibbles come out at i32-WORD level (pallas_dequant, 4
    # codes per op) straight from the u8 tile.
    qs = qs_ref[:].astype(jnp.int32) if kind != "q4" else None
    qh = qh_ref[:].astype(jnp.int32) if qh_ref is not None else None
    a = k * TK2  # traced element offset of the lo fold

    def half(x_ref, s_ref, m_ref, hi_fold):
        if kind == "q4":
            codes = q4_codes_word(qs_ref[:], hi_fold)
            if mxu:
                # MXU-mins/f32-dot chain (pallas_dequant.mxu_mins_enabled):
                # same-session prefill A/B at R=512 gu shapes measured
                # 152.7 -> 136-ish us together with tb=512 (the VPU dequant
                # serializes with the MXU — no in-kernel overlap)
                if has_sm:
                    bits = jax.lax.bitcast_convert_type(s_ref[:], jnp.int32)
                    s = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
                    m = jax.lax.bitcast_convert_type(
                        bits & jnp.int32(-65536), jnp.float32)
                else:
                    s = s_ref[:].astype(jnp.float32)
                    m = (m_ref[:].astype(jnp.float32)
                         if m_ref is not None else None)
                return fold_dot_mxu(x_ref[:].astype(jnp.float32), codes,
                                    s, m, g)
            q = codes.astype(jnp.float32)
        else:
            q = _codes_for_fold(kind, qs, qh, a, K, hi_fold).astype(jnp.float32)
        if has_sp:
            # adjacent-group bf16 scale pairs (pack_scale_kpairs, flat kinds)
            w = group_scale_mul_sp(q, s_ref[:], g)
        elif has_sm:
            # packed-pair scales: f32 container, low 16 bits = bf16(scale)
            # bits, high 16 = bf16(min) bits (quant.repack.pack_scale_pairs)
            bits = jax.lax.bitcast_convert_type(s_ref[:], jnp.int32)
            s = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
            m = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
            w = group_scale_mulsub(q, s, m, g)
        else:
            w = group_scale_mulsub(
                q, s_ref[:].astype(jnp.float32),
                m_ref[:].astype(jnp.float32) if m_ref is not None else None, g)
        return jax.lax.dot_general(
            x_ref[:].astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    contrib = half(x_lo, s_lo, m_lo, False)
    if has_hi:
        contrib = contrib + half(x_hi, s_hi, m_hi, True)
    acc[:] = acc[:] + contrib

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc[:]


@functools.partial(
    jax.jit,
    static_argnames=("kind", "shape", "keys", "out_dtype", "interpret", "tn", "tb"),
)
def _qmm_call(x2d, arrays_tuple, kind, shape, keys, out_dtype, interpret, tn, tb):
    a = dict(zip(keys, arrays_tuple))
    N = 1
    for s in shape[:-1]:
        N *= s
    K = shape[-1]
    B = x2d.shape[0]
    g = GROUP_SIZE[kind]
    has_qh = "qh" in a
    has_sm = "sm" in a
    has_sp = "sp" in a  # flat kinds, adjacent-group scale pairs
    has_mins = "mins" in a
    has_hi = kind not in ("q8", "q6w")

    if kind in ("q8", "q6w"):
        max_tk2 = K
    elif kind in ("q5", "q3"):
        max_tk2 = K // 8
    elif kind in ("q6", "q2"):
        max_tk2 = K // 4
    else:  # q4
        max_tk2 = K // 2

    # prefill rows: full-depth K blocks measured best (r4 same-session
    # R=512 gu sweep: TK=1024 139 us / 86%% MXU vs TK=512 153 / 78%%);
    # decode keeps 512 (520 -> 543 t/s r3 measurement)
    TK2 = _pow2_divisor(max_tk2, _TK_PREFILL if B > 32 else _TK_DEFAULT)
    TK2 = max(TK2, g)  # at least one scale group
    # partial edge blocks are handled by pallas (masked); do NOT shrink TN
    # to divide N — small tiles multiply grid steps and per-step overhead.
    # Large (prefill) batches cap TN so acc/out/x tiles fit VMEM.
    tn_eff = tn if B <= 32 else min(tn, 1024)
    TN = min(tn_eff, _round_up(N, 128))
    TB = min(tb, B)
    kdepth = K // 2 if has_hi else K
    nb, ni, nk = pl.cdiv(B, TB), pl.cdiv(N, TN), kdepth // TK2

    if has_sp:
        assert TK2 % (2 * g) == 0, (TK2, g)
        sg = TK2 // (2 * g)
    else:
        sg = TK2 // g
    qs_rows = a["qs"].shape[0]
    qh_rows = a["qh"].shape[0] if has_qh else 1

    in_specs = [pl.BlockSpec((TB, TK2), lambda b, i, k: (b, k), memory_space=pltpu.VMEM)]
    inputs = [x2d]
    if has_hi:
        in_specs.append(
            pl.BlockSpec(
                (TB, TK2),
                lambda b, i, k: (b, (K // 2) // TK2 + k),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(x2d)
    in_specs.append(
        pl.BlockSpec(
            (TK2, TN),
            lambda b, i, k: ((k * TK2 % qs_rows) // TK2, i),
            memory_space=pltpu.VMEM,
        )
    )
    inputs.append(a["qs"])
    if has_qh:
        in_specs.append(
            pl.BlockSpec(
                (TK2, TN),
                lambda b, i, k: ((k * TK2 % qh_rows) // TK2, i),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(a["qh"])
    s_lo_spec = pl.BlockSpec((sg, TN), lambda b, i, k: (k, i), memory_space=pltpu.VMEM)
    s_hi_spec = pl.BlockSpec(
        (sg, TN), lambda b, i, k: ((K // 2) // TK2 + k, i), memory_space=pltpu.VMEM
    )
    s_arr = a["sm"] if has_sm else (a["sp"] if has_sp else a["scales"])
    in_specs.append(s_lo_spec)
    inputs.append(s_arr)
    if has_hi:
        in_specs.append(s_hi_spec)
        inputs.append(s_arr)
    if has_mins:
        in_specs.append(s_lo_spec)
        inputs.append(a["mins"])
        if has_hi:
            in_specs.append(s_hi_spec)
            inputs.append(a["mins"])

    kernel = functools.partial(
        _qmm_kernel, kind, g, K, TK2, nk, has_qh, has_mins, has_hi, has_sm,
        # MXU-mins chain only at decode rows: at R>=256 the mins ride
        # tiny-N / 16-deep MXU passes whose padding wastes ~25%% of the
        # now-busy MXU (same-session R=512 gu A/B: 197.6-198.6 us with
        # either f32 or bf16 feeds vs 153.5 with the classic chain, whose
        # per-code VPU cost is already amortized over the row block)
        has_sp, kind == "q4" and B <= 32 and mxu_mins_enabled(),
    )
    bytes_accessed = (
        sum(v.size * v.dtype.itemsize for v in a.values()) + 2 * B * K + 4 * B * N
    )
    y = pl.pallas_call(
        kernel,
        grid=(nb, ni, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (TB, TN), lambda b, i, k: (b, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TB, TN), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        # NOTE: measured on v5e — declaring dimension_semantics=("parallel",
        # "parallel", "arbitrary") and/or raising vmem_limit_bytes LOWERS tg128
        # by ~4% (543 -> 521 t/s); Mosaic's defaults pipeline this grid better.
        compiler_params=(
            pltpu.CompilerParams(
                # fuse only the x operand(s)' producers (norms/residuals)
                allow_input_fusion=[i < (2 if has_hi else 1)
                                    for i in range(len(inputs))]
            )
            if _FUSE_X and not interpret else (
                # prefill shapes: the f32 x/w temporaries of the mxu chain
                # overflow the 16 MB scoped default by ~0.1 MB at R=512;
                # decode (B<=32) keeps Mosaic's defaults, which measured
                # better there (see NOTE above)
                pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
                if B > 32 and not interpret else None
            )
        ),
        interpret=interpret,
    )(*inputs)
    return y.astype(out_dtype)


import os

# tn=4096/tb=256 measured best on the q6w+sp lm head (v5e same-session
# sweep, r3): 100.5 us / 89.6% HBM vs 107.5-109.7 at tn=3072
_TN_DEFAULT = int(os.environ.get("TKQ_TN", "4096"))
_FUSE_X = os.environ.get("TKQ_FUSE_X", "0") == "1"
# 512 halves the K-grid depth vs 256 (fewer per-step fixed costs; ffn_down's
# K=5632 = 512*11 divides exactly): tg128 520 -> 543 t/s measured on v5e
_TK_DEFAULT = int(os.environ.get("TKQ_TK", "512"))
_TK_PREFILL = int(os.environ.get("TKQ_TK_PREFILL", "1024"))


def qmm_pallas(
    x: jnp.ndarray,
    qt: QTensor,
    out_dtype=None,
    interpret: bool = False,
    tn: int | None = None,
    tb: int = 512,  # r4 same-session sweep at R=512 gu: tb=512 78.5%% MXU
    #                 vs 72.9%% at the old 256 (one fewer weight refetch pass)
) -> jnp.ndarray:
    """Fused y = x @ dequant(W)^T. x: [..., K]; returns [..., N]."""
    tn = tn or _TN_DEFAULT
    assert qt.layout == "kmajor", qt.layout
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2d = x.reshape(-1, K)
    keys = tuple(sorted(qt.arrays))
    arrays_tuple = tuple(qt.arrays[k] for k in keys)
    y = _qmm_call(
        x2d,
        arrays_tuple,
        qt.kind,
        tuple(qt.shape),
        keys,
        jnp.dtype(out_dtype).name,
        interpret,
        tn,
        tb,
    )
    N = 1
    for s in qt.shape[:-1]:
        N *= s
    return y.reshape(*lead, N)
