"""KV session save/restore + qwen2 (attention-bias) architecture support."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_kquant.models.fixtures import tiny_config, write_fixture_gguf
from tpu_kquant.runtime import InferenceEngine, load_model


def test_session_save_restore(tmp_path):
    path = tmp_path / "m.gguf"
    cfg = tiny_config(n_layers=2, dim=64, n_heads=4, n_kv_heads=2, ffn_dim=128,
                      vocab_size=512)
    write_fixture_gguf(path, cfg, seed=3, scale=0.08)
    cfg, params, _ = load_model(str(path))
    eng = InferenceEngine(cfg, params, max_batch=1, max_seq=64, impl="xla")

    prompt = [3, 100, 7, 256]
    cache = eng.new_cache(1)
    logits, cache, lens = eng.prefill([prompt], cache)
    eng.save_session(str(tmp_path / "sess.npz"), cache, lens)

    # continue from the restored session; must match continuing directly
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    direct, _ = eng.decode_step(tok, jnp.asarray(lens), cache)

    cache2, lens2 = eng.load_session(str(tmp_path / "sess.npz"))
    resumed, _ = eng.decode_step(tok, jnp.asarray(lens2), cache2)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(resumed),
                               rtol=1e-5, atol=1e-5)


def test_session_int8(tmp_path):
    path = tmp_path / "m.gguf"
    cfg = tiny_config(n_layers=2, dim=64, n_heads=4, n_kv_heads=2, ffn_dim=128,
                      vocab_size=512)
    write_fixture_gguf(path, cfg, seed=3, scale=0.08)
    cfg, params, _ = load_model(str(path))
    eng = InferenceEngine(cfg, params, max_batch=1, max_seq=64, impl="xla",
                          kv_quantized=True)
    cache = eng.new_cache(1)
    logits, cache, lens = eng.prefill([[3, 100, 7]], cache)
    eng.save_session(str(tmp_path / "s8.npz"), cache, lens)
    cache2, lens2 = eng.load_session(str(tmp_path / "s8.npz"))
    assert cache2.quantized


def test_qwen2_attention_bias(tmp_path):
    path = tmp_path / "q.gguf"
    cfg = tiny_config(arch="qwen2", n_layers=2, dim=64, n_heads=4, n_kv_heads=2,
                      ffn_dim=128, vocab_size=512)
    write_fixture_gguf(path, cfg, seed=4, scale=0.08)
    cfg2, params, _ = load_model(str(path))
    assert cfg2.arch == "qwen2"
    assert cfg2.attn_bias  # detected from tensor presence
    assert "bq" in params["layers"][0]
    eng = InferenceEngine(cfg2, params, max_batch=1, max_seq=64, impl="xla")
    out = eng.generate([[3, 100, 7]], max_new_tokens=5)
    assert len(out[0]) == 5

    # bias must actually change the logits
    import dataclasses

    params_nb = dict(params)
    params_nb["layers"] = [
        {k: v for k, v in layer.items() if k not in ("bq", "bk", "bv")}
        for layer in params["layers"]
    ]
    cfg_nb = dataclasses.replace(cfg2, attn_bias=False)
    eng_nb = InferenceEngine(cfg_nb, params_nb, max_batch=1, max_seq=64, impl="xla")
    l1, _, _ = eng.prefill([[3, 100, 7]], eng.new_cache(1))
    l2, _, _ = eng_nb.prefill([[3, 100, 7]], eng_nb.new_cache(1))
    assert not np.allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)


def test_sliding_window_attention(tmp_path):
    """SWA must mask tokens beyond the window (Mistral/Gemma2-style)."""
    import jax.numpy as jnp
    import numpy as np

    from tpu_kquant.ops.attention import attention_decode

    rng = np.random.default_rng(0)
    B, S, H, Hkv, D = 1, 64, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    pos = jnp.asarray([[40]], jnp.int32)

    full = attention_decode(q, k, v, pos, impl="xla")
    win = attention_decode(q, k, v, pos, sliding_window=8, impl="xla")
    assert not np.allclose(np.asarray(full), np.asarray(win), atol=1e-4)

    # corrupting K/V outside the window must not change windowed output
    k2 = k.at[:, :30].set(99.0)
    v2 = v.at[:, :30].set(99.0)
    win2 = attention_decode(q, k2, v2, pos, sliding_window=8, impl="xla")
    np.testing.assert_allclose(np.asarray(win), np.asarray(win2), atol=1e-6)


def test_sliding_window_from_metadata(tmp_path):
    from tpu_kquant.models.fixtures import tiny_config, write_fixture_gguf
    from tpu_kquant.runtime import load_model

    path = tmp_path / "swa.gguf"
    cfg = tiny_config(n_layers=2, dim=64, n_heads=4, n_kv_heads=2, ffn_dim=128,
                      vocab_size=512, sliding_window=16)
    write_fixture_gguf(path, cfg, seed=8, scale=0.08)
    cfg2, params, _ = load_model(str(path))
    assert cfg2.sliding_window == 16
    from tpu_kquant.runtime import InferenceEngine

    eng = InferenceEngine(cfg2, params, max_batch=1, max_seq=64, impl="xla")
    out = eng.generate([[3, 100, 7]], max_new_tokens=4)
    assert len(out[0]) == 4
