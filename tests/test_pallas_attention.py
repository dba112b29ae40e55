"""Flash decode attention kernel vs the XLA reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_kquant.ops.attention import attention_decode
from tpu_kquant.ops.pallas_attention import attention_decode_pallas

RNG = np.random.default_rng(4)


def _setup(B, S, H, Hkv, D, pos, quantized=False):
    q = jnp.asarray(RNG.standard_normal((B, 1, H, D)), jnp.float32)
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
    positions = jnp.asarray(pos, jnp.int32).reshape(B, 1)
    return q, k, v, positions, scales


@pytest.mark.parametrize("pos", [[5], [127], [200]])
def test_matches_xla(pos):
    B, S, H, Hkv, D = 1, 256, 8, 2, 64
    q, k, v, positions, scales = _setup(B, S, H, Hkv, D, pos)
    ref = attention_decode(q, k, v, positions, scales)
    got = attention_decode_pallas(q, k, v, positions, scales, ts=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_batch_ragged_positions():
    B, S, H, Hkv, D = 3, 256, 4, 4, 64
    q, k, v, positions, scales = _setup(B, S, H, Hkv, D, [3, 100, 255])
    ref = attention_decode(q, k, v, positions, scales)
    got = attention_decode_pallas(q, k, v, positions, scales, ts=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_int8_kv():
    B, S, H, Hkv, D = 2, 128, 8, 2, 64
    q, k, v, positions, scales = _setup(B, S, H, Hkv, D, [60, 127], quantized=True)
    ref = attention_decode(q, k, v, positions, scales)
    got = attention_decode_pallas(q, k, v, positions, scales, ts=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-2, atol=3e-2)


def test_mostly_dead_cache():
    # q_pos in the FIRST tile of a 16-tile cache: the clamped scalar-prefetch
    # index map re-requests tile 0 for all 15 dead tiles (DMA elided); result
    # must be unaffected, incl. int8 scale tiles
    B, S, H, Hkv, D = 2, 1024, 8, 2, 64
    q, k, v, positions, scales = _setup(B, S, H, Hkv, D, [7, 130], quantized=True)
    ref = attention_decode(q, k, v, positions, scales)
    got = attention_decode_pallas(q, k, v, positions, scales, ts=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-2, atol=3e-2)


def test_single_tile():
    B, S, H, Hkv, D = 1, 64, 4, 1, 64
    q, k, v, positions, scales = _setup(B, S, H, Hkv, D, [63])
    ref = attention_decode(q, k, v, positions, scales)
    got = attention_decode_pallas(q, k, v, positions, scales, ts=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)
