#!/usr/bin/env python
"""Variant G: two-phase causal-skip flash prefill attention.

Phase 1 (grid s in [0, nS)): live QK tiles -> s_buf scratch + global row max.
Phase 2 (grid s in [nS, 2nS)): live tiles: p = exp(s - m), l += sum, acc += pV.
No online rescaling (m is final before any exp); dead tiles skipped entirely.

Measured with the marginal chained estimator against the XLA fused path.
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".cache" / "jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_kquant.ops.attention import attention_decode
from tpu_kquant.utils.attribution import dep, time_chained

_NEG = -1e30


def _kernel_g(TQ, TS, nS, G, D, S, scale, qs_ref, q_ref, k_ref, v_ref, o_ref,
              s_buf, m_scr, l_scr, acc):
    rows = G * TQ
    tq = pl.program_id(1)
    si = pl.program_id(2)
    blk_lo = qs_ref[0] + tq * TQ
    blk_hi = blk_lo + TQ - 1
    ragged = (S % TS) != 0

    @pl.when(si == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc[:] = jnp.zeros_like(acc)

    # ---- phase 1: QK tiles + global max ----
    tile_start = si * TS
    live1 = (si < nS) & (tile_start <= blk_hi)
    interior1 = live1 & (tile_start + TS - 1 <= blk_lo)

    def qk(masked):
        q = q_ref[0, 0].reshape(rows, D)
        s = jax.lax.dot_general(
            q, k_ref[0, 0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if masked:
            t_off = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % TQ
            q_pos = blk_lo + t_off
            kv = tile_start + jax.lax.broadcasted_iota(jnp.int32, (1, TS), 1)
            ok = kv <= q_pos
            if ragged:
                ok &= kv < S
            s = jnp.where(ok, s, _NEG)
        s_buf[:, pl.ds(si * TS, TS)] = s
        m_scr[:] = jnp.maximum(m_scr[:],
                               jnp.max(s, axis=1, keepdims=True))

    @pl.when(interior1)
    def _():
        qk(masked=False)

    @pl.when(live1 & jnp.logical_not(interior1))
    def _():
        qk(masked=True)

    # ---- phase 2: exp + AV ----
    j = si - nS
    tile2 = j * TS
    live2 = (si >= nS) & (tile2 <= blk_hi)

    @pl.when(live2)
    def _():
        s = s_buf[:, pl.ds(j * TS, TS)]
        p = jnp.exp(s - m_scr[:, 0:1])
        l_scr[:] = l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
        vt = v_ref[0, 0]
        if ragged:
            rid = jax.lax.broadcasted_iota(jnp.int32, (TS, 1), 0)
            vt = jnp.where(tile2 + rid < S, vt, 0)
        acc[:] = acc[:] + jax.lax.dot_general(
            p.astype(jnp.bfloat16), vt,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(si == 2 * nS - 1)
    def _():
        l = jnp.maximum(l_scr[:], 1e-20)
        o_ref[0, 0] = (acc[:] / l).reshape(G, TQ, D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "tq", "ts"))
def call_g(q, k, v, q_start, scale, tq, ts):
    B, Hkv, G, T, D = q.shape
    S = k.shape[2]
    TQ = min(tq, T)
    nT = T // TQ
    TS = min(ts, S)
    nS = pl.cdiv(S, TS)
    kern = functools.partial(_kernel_g, TQ, TS, nS, G, D, S, scale)

    def kmap(bh, t, s):
        return (bh // Hkv, bh % Hkv, jnp.where(s < nS, s, 0), 0)

    def vmap_(bh, t, s):
        return (bh // Hkv, bh % Hkv, jnp.where(s >= nS, s - nS, 0), 0)

    return pl.pallas_call(
        kern,
        grid=(B * Hkv, nT, 2 * nS),
        in_specs=[
            pl.BlockSpec((1,), lambda bh, t, s: (bh // Hkv,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, G, TQ, D),
                         lambda bh, t, s: (bh // Hkv, bh % Hkv, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TS, D), kmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TS, D), vmap_, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, G, TQ, D),
                               lambda bh, t, s: (bh // Hkv, bh % Hkv, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((G * TQ, nS * TS), jnp.float32),
            pltpu.VMEM((G * TQ, 1), jnp.float32),
            pltpu.VMEM((G * TQ, 1), jnp.float32),
            pltpu.VMEM((G * TQ, D), jnp.float32),
        ],
    )(q_start.astype(jnp.int32), q, k, v)


def main():
    B, T, H, Hkv, D, S = 1, 512, 32, 4, 64, 704
    G = H // Hkv
    scale = D ** -0.5
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    qs = pos[:, 0]
    qg = jnp.asarray(
        np.asarray(q, np.float32).reshape(B, T, Hkv, G, D)
        .transpose(0, 2, 3, 1, 4), jnp.bfloat16)

    xla = jax.jit(lambda q, k, v, p: attention_decode(q, k, v, p, impl="xla"))
    ref = np.asarray(xla(q, k, v, pos), np.float32)

    def t_xla():
        def fn(x, aux):
            k, v, pos = aux
            return dep(x, attention_decode(x, k, v, pos, impl="xla"))
        return time_chained(fn, q, 128, aux=(k, v, pos)) * 1e6

    print(f"XLA                  : {t_xla():7.1f} us/layer")

    for tq in (128, 256):
        for ts in (128, 256):
            try:
                f = functools.partial(call_g, scale=scale, tq=tq, ts=ts)
                out = np.asarray(f(qg, k, v, qs), np.float32)
                out = out.transpose(0, 3, 1, 2, 4).reshape(B, T, H, D)
                err = np.abs(out - ref).max()

                def fn(x, aux):
                    k, v, qs = aux
                    return dep(x, f(x, k, v, qs))
                us = time_chained(fn, qg, 128, aux=(k, v, qs)) * 1e6
                print(f"G tq={tq:<4d} ts={ts:<4d}    : {us:7.1f} us/layer"
                      f"   maxerr {err:.4f}")
            except Exception as e:
                print(f"G tq={tq:<4d} ts={ts:<4d}    : FAIL {str(e)[:160]}")


if __name__ == "__main__":
    main()
