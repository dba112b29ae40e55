"""INT8-MXU fused quantized matmul — the speed-of-light decode kernel.

This is the faithful TPU translation of the reference's actual hot-loop
DESIGN (SURVEY.md 3.1): ggml quantizes activations to Q8_K on the fly and
contracts int8 codes against int8 codes (NEON sdot), applying per-sub-block
scales to small partial sums and handling the Q4_K min-term via the Q8_K
``bsums``. Here:

  - activations are quantized per 32-group on device (ops.act_quant);
  - 4-bit weight codes are extracted with i32-WORD ops: the u8 [TK2, TN]
    tile bitcasts to i32 [TK2/4, TN] (Mosaic packs 4 consecutive sublanes
    per 32-bit word), one AND / one SHIFT+AND yields all lo/hi codes as i8 —
    ~0.75 VPU ops per element vs ~6 for the bf16-dequant kernel;
  - the MXU contracts int8 x int8 per 32-group (batched over the tile's
    groups) into i32 partials z[g, b, n];
  - partials are rescaled by xs[b,g] * s[g,n] and accumulated (VPU work
    ~B/32 of the weight volume — negligible);
  - the min-term never enters the kernel: y -= gsums @ mins is a 1/32-depth
    XLA matmul outside (the bsums trick).

Numerics are the reference's own: Q8_K activation rounding is the only
difference from the bf16-dequant path (ggml accepts the same error).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_kquant.ops.act_quant import quantize_activations
from tpu_kquant.quant.qtensor import QTensor

_LO_MASK = 0x0F0F0F0F


def _int8_kernel(TK2, nk, *refs):
    (xq_lo, xq_hi, xs_lo, xs_hi, qs_ref, s_lo, s_hi, o_ref, acc) = refs

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    qs32 = pltpu.bitcast(qs_ref[:], jnp.int32)  # [TK2/4, TN] words
    lo = pltpu.bitcast(qs32 & _LO_MASK, jnp.int8)  # [TK2, TN] codes 0..15
    hi = pltpu.bitcast((qs32 >> 4) & _LO_MASK, jnp.int8)

    def fold(xq_ref, xs_ref, s_ref, w_i8):
        # xq_ref: [Gt, B, 32] i8;  w: [TK2, TN] -> [Gt, 32, TN]
        Gt, B, _ = xq_ref.shape
        TN = w_i8.shape[-1]
        z = jax.lax.dot_general(
            xq_ref[:], w_i8.reshape(Gt, 32, TN),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # [Gt, B, TN]
        scale = xs_ref[:][:, :, None] * s_ref[:][:, None, :]  # [Gt,B,1]*[Gt,1,TN]
        return jnp.sum(z.astype(jnp.float32) * scale, axis=0)  # [B, TN]

    acc[:] = acc[:] + fold(xq_lo, xs_lo, s_lo, lo) + fold(xq_hi, xs_hi, s_hi, hi)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc[:]


@functools.partial(jax.jit, static_argnames=("shape", "interpret", "tn", "tk"))
def _qmm_int8_call(xq_t, xs_t, qs, scales, shape, interpret, tn, tk):
    """xq_t: [K/32, B, 32] i8 (group-major); xs_t: [K/32, B] f32."""
    N = 1
    for s in shape[:-1]:
        N *= s
    K = shape[-1]
    B = xq_t.shape[1]
    TK2 = tk
    while (K // 2) % TK2 != 0 or TK2 > K // 2:
        TK2 //= 2
    TK2 = max(TK2, 32)
    TN = min(tn, N) if N % 128 == 0 else N
    while N % TN != 0:
        TN //= 2
    Gt = TK2 // 32
    nk = (K // 2) // TK2
    ni = N // TN
    off = (K // 2) // 32 // Gt  # hi-fold group-block offset

    grid = (1, ni, nk)
    out = pl.pallas_call(
        functools.partial(_int8_kernel, TK2, nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Gt, B, 32), lambda b, i, k: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Gt, B, 32), lambda b, i, k: (off + k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Gt, B), lambda b, i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Gt, B), lambda b, i, k: (off + k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK2, TN), lambda b, i, k: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Gt, TN), lambda b, i, k: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Gt, TN), lambda b, i, k: (off + k, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda b, i, k: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, TN), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N,
            bytes_accessed=qs.size + scales.size * scales.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq_t, xq_t, xs_t, xs_t, qs, scales, scales)
    return out


def qmm_int8(
    x: jnp.ndarray,
    qt: QTensor,
    out_dtype=None,
    interpret: bool = False,
    tn: int = 2048,
    tk: int = 256,
) -> jnp.ndarray:
    """y = x @ dequant(W)^T via int8 MXU with Q8_K-style activation quant.

    Supports kind 'q4' (kmajor). Returns [..., N].
    """
    assert qt.kind == "q4" and qt.layout == "kmajor", (qt.kind, qt.layout)
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2d = x.reshape(-1, K)
    B = x2d.shape[0]

    xq, xs, gsums = quantize_activations(x2d, group=32)  # [B,K] i8, [B,K/32]
    xq_t = xq.reshape(B, K // 32, 32).transpose(1, 0, 2)  # [K/32, B, 32]
    xs_t = xs.astype(jnp.float32).transpose(1, 0)  # [K/32, B]

    y = _qmm_int8_call(
        xq_t, xs_t, qt.arrays["qs"], qt.arrays["scales"].astype(jnp.float32),
        tuple(qt.shape), interpret, tn, tk,
    )
    if "mins" in qt.arrays:
        # bsums trick: the Q4_K min-term is a rank-K/32 correction
        y = y - jax.lax.dot_general(
            gsums.astype(jnp.float32),
            qt.arrays["mins"].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    N = 1
    for s in qt.shape[:-1]:
        N *= s
    return y.reshape(*lead, N).astype(out_dtype)
