"""INT8-MXU fused quantized matmul — the speed-of-light decode kernel.

This is the faithful TPU translation of the reference's actual hot-loop
DESIGN (SURVEY.md 3.1): ggml quantizes activations to Q8_K on the fly and
contracts int8 codes against int8 codes (NEON sdot), applying per-sub-block
scales to small partial sums and handling the Q4_K/Q6_K constant terms via
the Q8_K ``bsums``. Here:

  - activations are quantized per weight-group on device (ops.act_quant);
  - weight codes are extracted with i32-WORD ops: u8 tiles bitcast to i32
    (Mosaic packs 4 consecutive sublanes per 32-bit word); one AND / SHIFT
    yields 4 codes at once, and for Q6_K the 2-bit highs combine with the
    nibbles entirely at word level (`lo | ((qh >> sh) & 0x03..) << 4`) —
    under 1 VPU op per element vs ~6 for the bf16-dequant kernel;
  - the MXU contracts int8 x int8 per scale-group (batched over the tile's
    groups) into i32 partials z[g, b, n];
  - partials are rescaled by xs[b,g] * s[g,n] and accumulated;
  - offset/min terms never enter the kernel: y -= gsums @ mins is a
    1/group-depth XLA matmul outside (the bsums trick; Q6_K's -32 offset is
    already folded into ``mins`` by the repack layer).

Numerics are the reference's own: Q8_K activation rounding is the only
difference from the bf16-dequant path (ggml accepts the same error).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_kquant.quant.qtensor import QTensor
from tpu_kquant.quant.repack import GROUP_SIZE

def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


_LO = 0x0F0F0F0F
_H2 = 0x03030303


def _int8_kernel(kind, g, K, TK2, nk, *refs):
    has_qh = kind == "q6"
    it = iter(refs)
    xq_lo, xq_hi, xs_lo, xs_hi = next(it), next(it), next(it), next(it)
    qs_ref = next(it)
    qh_ref = next(it) if has_qh else None
    s_lo, s_hi = next(it), next(it)
    o_ref, acc = next(it), next(it)

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    qs32 = pltpu.bitcast(qs_ref[:], jnp.int32)  # [TK2/4, TN] words
    qh32 = pltpu.bitcast(qh_ref[:], jnp.int32) if has_qh else None
    a = k * TK2  # lo-fold element offset

    def codes(hi_fold):
        lo = (qs32 >> 4) & _LO if hi_fold else qs32 & _LO
        if not has_qh:
            return pltpu.bitcast(lo, jnp.int8)
        sh = 2 * (a // (K // 4)) + (4 if hi_fold else 0)
        h2 = jax.lax.shift_right_logical(qh32, jnp.full(qh32.shape, sh, jnp.int32)) & _H2
        return pltpu.bitcast(lo | (h2 << 4), jnp.int8)

    def fold(xq_ref, xs_ref, s_ref, w_i8):
        Gt, B, _ = xq_ref.shape
        TN = w_i8.shape[-1]
        z = jax.lax.dot_general(
            xq_ref[:], w_i8.reshape(Gt, g, TN),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # [Gt, B, TN]
        scale = xs_ref[:][:, :, None] * s_ref[:][:, None, :]
        return jnp.sum(z.astype(jnp.float32) * scale, axis=0)  # [B, TN]

    acc[:] = acc[:] + fold(xq_lo, xs_lo, s_lo, codes(False)) + fold(
        xq_hi, xs_hi, s_hi, codes(True)
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc[:]


@functools.partial(jax.jit, static_argnames=("kind", "shape", "interpret", "tn", "tk"))
def _qmm_int8_call(xq_t, xs_t, qs, qh, scales, kind, shape, interpret, tn, tk):
    """xq_t: [K/g, B, g] i8 (group-major); xs_t: [K/g, B] f32."""
    N = 1
    for s in shape[:-1]:
        N *= s
    K = shape[-1]
    g = GROUP_SIZE[kind]
    B = xq_t.shape[1]
    max_tk2 = K // 4 if kind == "q6" else K // 2
    TK2 = tk
    while TK2 > max_tk2 or max_tk2 % TK2 != 0:
        TK2 //= 2
    TK2 = max(TK2, g)
    # partial edge blocks are handled by pallas (masked); do NOT shrink TN
    # to divide N — small tiles multiply grid steps and per-step overhead
    TN = min(tn, _round_up(N, 128))
    Gt = TK2 // g
    nk = (K // 2) // TK2
    ni = pl.cdiv(N, TN)
    off_g = (K // 2) // g // Gt  # hi-fold group-block offset
    qh_rows = qh.shape[0] if qh is not None else 1

    in_specs = [
        pl.BlockSpec((Gt, B, g), lambda b, i, k: (k, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Gt, B, g), lambda b, i, k: (off_g + k, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Gt, B), lambda b, i, k: (k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Gt, B), lambda b, i, k: (off_g + k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TK2, TN), lambda b, i, k: (k, i), memory_space=pltpu.VMEM),
    ]
    inputs = [xq_t, xq_t, xs_t, xs_t, qs]
    if qh is not None:
        in_specs.append(
            pl.BlockSpec(
                (TK2, TN),
                lambda b, i, k: ((k * TK2 % qh_rows) // TK2, i),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(qh)
    in_specs += [
        pl.BlockSpec((Gt, TN), lambda b, i, k: (k, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((Gt, TN), lambda b, i, k: (off_g + k, i), memory_space=pltpu.VMEM),
    ]
    inputs += [scales, scales]

    out = pl.pallas_call(
        functools.partial(_int8_kernel, kind, g, K, TK2, nk),
        grid=(1, ni, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, TN), lambda b, i, k: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, TN), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N,
            bytes_accessed=qs.size + (qh.size if qh is not None else 0)
            + scales.size * scales.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
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

    Supports kinds 'q4' and 'q6' (kmajor). Returns [..., N].
    """
    from tpu_kquant.ops.act_quant import quantize_activations

    assert qt.kind in ("q4", "q6") and qt.layout == "kmajor", (qt.kind, qt.layout)
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    K = x.shape[-1]
    g = GROUP_SIZE[qt.kind]
    x2d = x.reshape(-1, K)
    B = x2d.shape[0]

    xq, xs, gsums = quantize_activations(x2d, group=g)  # [B,K] i8, [B,K/g]
    xq_t = xq.reshape(B, K // g, g).transpose(1, 0, 2)  # [K/g, B, g]
    xs_t = xs.astype(jnp.float32).transpose(1, 0)  # [K/g, B]

    y = _qmm_int8_call(
        xq_t, xs_t, qt.arrays["qs"], qt.arrays.get("qh"),
        qt.arrays["scales"].astype(jnp.float32),
        qt.kind, tuple(qt.shape), interpret, tn, tk,
    )
    if "mins" in qt.arrays:
        # bsums trick: constant/min terms are a rank-K/g correction
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
