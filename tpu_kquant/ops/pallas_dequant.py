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

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

_LO = 0x0F0F0F0F


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
