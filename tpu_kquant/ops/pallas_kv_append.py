"""Single-launch KV cache append: both K and V rows merged into the full
[L, B, Hkv, S, D] cache arrays in ONE Pallas call per layer.

Why (r4 trace attribution, artifacts/perf/trace_decode_r4_ops.json): the XLA
append path costs 44 tiny `dynamic_update_slice` ops + 44 layout broadcasts
per decode step — ~1.4 us of op overhead each for a 512-byte write, 63+15 us
per step on TinyLlama (10% of the fused decode loop, 2nd only to the weight
kernels). A [B,Hkv,T,D] row is far below the op-dispatch floor, so the fix is
fewer ops: one kernel per layer, with the cache arrays aliased in/out (no
copy of the 90 MB buffers).

Mechanics: a Mosaic DMA cannot address a single cache slot (a [.., 1, 64]
bf16 view of a (8,128)/(16,128)-tiled buffer is inexpressible — measured
r4), so the kernel instead uses a scalar-prefetch index map to fetch the
ALIGNED 16-slot window containing each row's write position, merges the new
row in with an iota==slot mask, and writes the window back. Aligned windows
are always legal blocks; everything outside them is untouched through the
aliasing.

The reference's analog is ggml's `set_rows` K/V append (SURVEY.md 2.1,
llama_kv_cache evidence out.folded:52-55).

bf16 unified-layout caches only; the quantized / iSWA / recurrent layouts
keep the XLA path (their appends also rewrite scale planes / ring indices).

**Measured NEGATIVE end-to-end, default OFF** (TKQ_KV_APPEND_PALLAS=1 to
opt in). Same-session r4 A/B: the kernel itself wins exactly as designed —
append cost 78.9 -> 22.5 us/step in the trace — but the custom call
perturbs XLA around it: the attention fusions grow 72.0 -> 99.5 us/step
and full-cache layout copies appear (~6 us/step), netting tg128
539.5 +- 34.8 vs 571.4 +- 14.7 with the plain DUS path. The op-overhead
diagnosis stands (trace_decode_r4_ops.json); the fix must avoid breaking
XLA's cache layout/fusion decisions — e.g. batching appends at the XLA
level rather than interposing a custom call per layer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WIN = 16  # S-window per block: bf16 sublane tile, always slice-legal


def kv_append_enabled(quantized: bool, T: int, B: int, S: int) -> bool:
    import os

    if os.environ.get("TKQ_KV_APPEND_PALLAS", "0") != "1":
        return False
    # one window per row: all of a row's T slots must fit one aligned window
    if quantized or T > 1 or B > 32 or S % _WIN:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _append_kernel(Hkv, D, scal_ref, knew_ref, vnew_ref, kin, vin,
                   kout, vout):
    b = pl.program_id(0)
    slot = scal_ref[1 + b] % _WIN
    lane = jax.lax.broadcasted_iota(jnp.int32, (Hkv, _WIN, D), 1)
    sel = lane == slot
    kout[0, 0] = jnp.where(sel, knew_ref[0].astype(kout.dtype), kin[0, 0])
    vout[0, 0] = jnp.where(sel, vnew_ref[0].astype(vout.dtype), vin[0, 0])


def kv_append_pallas(full_k, full_v, k_new, v_new, layer_idx, start,
                     interpret: bool = False):
    """full_k/full_v: [L, B, Hkv, S, D]; k_new/v_new: [B, 1, Hkv, D];
    layer_idx scalar, start [B] — returns updated (full_k, full_v)."""
    L, B, Hkv, S, D = full_k.shape
    dt = full_k.dtype
    kn = k_new.reshape(B, Hkv, 1, D)  # T=1: [B, T, Hkv, D] -> [B, Hkv, T, D]
    vn = v_new.reshape(B, Hkv, 1, D)
    scalars = jnp.concatenate(
        [jnp.asarray(layer_idx, jnp.int32).reshape(1),
         jnp.asarray(start, jnp.int32).reshape(B)])

    cache_spec = pl.BlockSpec(
        (1, 1, Hkv, _WIN, D),
        lambda b, scal: (scal[0], b, 0, scal[1 + b] // _WIN, 0),
    )
    new_spec = pl.BlockSpec((1, Hkv, 1, D), lambda b, scal: (b, 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[new_spec, new_spec, cache_spec, cache_spec],
        out_specs=[cache_spec, cache_spec],
    )
    kernel = functools.partial(_append_kernel, Hkv, D)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(full_k.shape, dt),
                   jax.ShapeDtypeStruct(full_v.shape, dt)],
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(scalars, kn, vn, full_k, full_v)
