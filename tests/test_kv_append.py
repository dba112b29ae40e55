"""Single-launch Pallas KV append (ops.pallas_kv_append) vs the XLA
dynamic-update-slice path it replaces."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_kquant.ops.pallas_kv_append import kv_append_pallas
from tpu_kquant.runtime.kv_cache import KVCache


@pytest.mark.parametrize("B,T", [(1, 1), (3, 1)])
def test_kv_append_matches_xla(B, T):
    L, Hkv, S, D = 3, 4, 64, 8
    rng = np.random.default_rng(0)
    cache = KVCache.create(L, B, S, Hkv, D)
    k_new = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.bfloat16)
    starts = np.array([5 * (b + 1) for b in range(B)], np.int32)
    positions = jnp.asarray(starts[:, None] + np.arange(T)[None, :])

    ref = cache.append(1, k_new, v_new, positions)  # XLA path (CPU backend)
    k2, v2 = kv_append_pallas(cache.k, cache.v, k_new, v_new, 1,
                              positions[:, 0], interpret=True)

    np.testing.assert_array_equal(np.asarray(ref.k), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(ref.v), np.asarray(v2))


def test_kv_append_preserves_other_rows():
    L, B, Hkv, S, D = 2, 2, 2, 32, 8
    rng = np.random.default_rng(1)
    k0 = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), jnp.bfloat16)
    v0 = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, 1, Hkv, D)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, 1, Hkv, D)), jnp.bfloat16)
    start = jnp.asarray([3, 7], jnp.int32)
    k2, v2 = kv_append_pallas(k0, v0, k_new, v_new, 0, start,
                              interpret=True)
    k2, v2 = np.asarray(k2), np.asarray(v2)
    k0n = np.asarray(k0).copy()
    v0n = np.asarray(v0).copy()
    for b in range(B):
        k0n[0, b, :, int(start[b]), :] = np.asarray(k_new[b, 0])
        v0n[0, b, :, int(start[b]), :] = np.asarray(v_new[b, 0])
    np.testing.assert_array_equal(k2, k0n)
    np.testing.assert_array_equal(v2, v0n)


def test_deferred_append_matches_eager(monkeypatch):
    """TKQ_DEFER_APPEND decode path (batched end-of-step cache writes +
    in-attention current-token patches) must produce the same tokens and
    the same cache contents as the eager per-layer append path."""
    import jax.numpy as jnp

    from tpu_kquant.models.fixtures import tiny_config, write_fixture_gguf
    from tpu_kquant.runtime import InferenceEngine, load_model
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.gguf")
        cfg = tiny_config(n_layers=2, dim=64, n_heads=4, n_kv_heads=2,
                          ffn_dim=128, vocab_size=512, max_seq_len=128)
        write_fixture_gguf(path, cfg, seed=7, quant="q4_k_m", scale=0.08)
        cfg, params, _ = load_model(path)

        def run(defer, kv_int8=False):
            monkeypatch.setenv("TKQ_DEFER_APPEND", "1" if defer else "0")
            eng = InferenceEngine(cfg, params, max_batch=2, max_seq=64,
                                  impl="xla", kv_quantized=kv_int8)
            toks = eng.generate([[3, 100, 7], [9, 300, 2, 41]],
                                max_new_tokens=8)
            return toks

        assert run(True) == run(False)
        # int8 KV: the deferred path quantizes the stacked rows with the
        # same per-(token, head) amax scales; the one numeric difference
        # (the current token attends its own k/v unquantized for one step)
        # must not flip greedy tokens on this fixture
        assert run(True, kv_int8=True) == run(False, kv_int8=True)
