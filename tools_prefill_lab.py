#!/usr/bin/env python
"""Prefill-attention lab: XLA fused attention vs the blockwise Pallas kernel
at the production pp512 shapes, with a tile sweep.

The r4/r5 gate note says the Pallas prefill kernel lost 3.4x to XLA at
pp512/S=704 (ops/attention.py). Suspected cause: `while S % TS: TS //= 2`
degrades TS 256 -> 64 at S=704 (704 = 11 * 64) — tiny tiles, 11 grid steps
per q block. This lab measures both paths and the sweep that decides whether
a ragged-tail (cdiv) kernel wins.

  python tools_prefill_lab.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".cache" / "jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tpu_kquant.ops.attention import attention_decode


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e6


def main():
    B, T, H, Hkv, D, S = 1, 512, 32, 4, 64, 704
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))

    xla = jax.jit(lambda q, k, v, p: attention_decode(q, k, v, p, impl="xla"))
    us = timeit(xla, q, k, v, pos)
    print(f"XLA fused attention       : {us:8.1f} us/layer")

    from tpu_kquant.ops.pallas_prefill import attention_prefill_pallas

    ref = np.asarray(xla(q, k, v, pos), np.float32)
    for tq in (128, 256, 512):
        for ts in (64, 128, 256, 704):
            try:
                f = jax.jit(lambda q, k, v, qs, tq=tq, ts=ts:
                            attention_prefill_pallas(q, k, v, qs,
                                                     tq=tq, ts=ts))
                qs = pos[:, 0]
                got = np.asarray(f(q, k, v, qs), np.float32)
                err = np.abs(got - ref).max()
                us = timeit(f, q, k, v, qs)
                print(f"pallas tq={tq:<4d} ts={ts:<4d}    : {us:8.1f} us/layer"
                      f"   maxerr {err:.4f}")
            except Exception as e:
                print(f"pallas tq={tq:<4d} ts={ts:<4d}    : FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
