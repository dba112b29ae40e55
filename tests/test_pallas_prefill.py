"""Flash prefill attention kernel vs the XLA reference (interpret mode):
causal GQA, mid-history chunk starts, int8 KV, sliding window, batch."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_kquant.ops.attention import attention_decode
from tpu_kquant.ops.pallas_prefill import attention_prefill_pallas

RNG = np.random.default_rng(11)


def _setup(B, T, S, H, Hkv, D, starts, quantized=False):
    q = jnp.asarray(RNG.standard_normal((B, T, H, D)), jnp.float32)
    if quantized:
        k = jnp.asarray(RNG.integers(-127, 127, (B, Hkv, S, D)), jnp.int8)
        v = jnp.asarray(RNG.integers(-127, 127, (B, Hkv, S, D)), jnp.int8)
        ks = jnp.asarray(RNG.random((B, Hkv, S)) * 0.01 + 0.001, jnp.float32)
        vs = jnp.asarray(RNG.random((B, Hkv, S)) * 0.01 + 0.001, jnp.float32)
        scales = (ks, vs)
    else:
        k = jnp.asarray(RNG.standard_normal((B, Hkv, S, D)), jnp.float32)
        v = jnp.asarray(RNG.standard_normal((B, Hkv, S, D)), jnp.float32)
        scales = None
    starts = np.asarray(starts, np.int32)
    positions = jnp.asarray(starts[:, None] + np.arange(T)[None, :], jnp.int32)
    return q, k, v, positions, scales


def _xla_ref(q, k, v, positions, scales, window=0):
    return attention_decode(q, k, v, positions, scales, impl="xla",
                            sliding_window=window)


def test_fresh_prompt_matches_xla():
    B, T, S, H, Hkv, D = 2, 64, 128, 8, 2, 64
    q, k, v, positions, scales = _setup(B, T, S, H, Hkv, D, [0, 0])
    ref = _xla_ref(q, k, v, positions, scales)
    got = attention_prefill_pallas(q, k, v, positions[:, 0], scales,
                                   tq=32, ts=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_chunk_start_mid_history():
    """Chunked prefill: queries start past existing cache history."""
    B, T, S, H, Hkv, D = 2, 32, 256, 4, 4, 64
    q, k, v, positions, scales = _setup(B, T, S, H, Hkv, D, [96, 96])
    ref = _xla_ref(q, k, v, positions, scales)
    got = attention_prefill_pallas(q, k, v, positions[:, 0], scales,
                                   tq=16, ts=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_int8_kv():
    B, T, S, H, Hkv, D = 2, 32, 128, 8, 2, 64
    q, k, v, positions, scales = _setup(B, T, S, H, Hkv, D, [40, 40],
                                        quantized=True)
    ref = _xla_ref(q, k, v, positions, scales)
    got = attention_prefill_pallas(q, k, v, positions[:, 0], scales,
                                   tq=16, ts=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("window", [32, 100])
def test_sliding_window(window):
    B, T, S, H, Hkv, D = 1, 64, 256, 4, 2, 64
    q, k, v, positions, scales = _setup(B, T, S, H, Hkv, D, [150])
    ref = _xla_ref(q, k, v, positions, scales, window=window)
    got = attention_prefill_pallas(q, k, v, positions[:, 0], scales,
                                   sliding_window=window, tq=32, ts=64,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_uneven_tiles_and_gqa8():
    B, T, S, H, Hkv, D = 3, 40, 320, 16, 2, 64
    q, k, v, positions, scales = _setup(B, T, S, H, Hkv, D, [0, 100, 200])
    ref = _xla_ref(q, k, v, positions, scales)
    got = attention_prefill_pallas(q, k, v, positions[:, 0], scales,
                                   tq=8, ts=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_dispatch_routes_prefill(monkeypatch):
    """impl='pallas' with T > 1 must route through the prefill kernel."""
    import tpu_kquant.ops.pallas_prefill as pp

    called = {}
    orig = pp.attention_prefill_pallas

    def spy(*a, **kw):
        called["hit"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pp, "attention_prefill_pallas", spy)
    B, T, S, H, Hkv, D = 1, 16, 64, 4, 2, 64
    q, k, v, positions, scales = _setup(B, T, S, H, Hkv, D, [0])
    out = attention_decode(q, k, v, positions, scales, impl="pallas")
    ref = _xla_ref(q, k, v, positions, scales)
    assert called.get("hit")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
