"""Tests for aux ops/utils: activation quant, roofline accounting, rope YaRN."""

import numpy as np

import jax.numpy as jnp

from tpu_kquant.ops.act_quant import dequantize_activations, quantize_activations
from tpu_kquant.ops.rope import RopeParams, rope_cos_sin


def test_act_quant_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
    xq, scales, gsums = quantize_activations(x)
    assert xq.dtype == jnp.int8
    assert scales.shape == (4, 8)
    y = dequantize_activations(xq, scales)
    rel = np.abs(np.asarray(y - x)).max() / np.abs(np.asarray(x)).max()
    assert rel < 0.02


def test_act_quant_gsums():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    xq, scales, gsums = quantize_activations(x)
    # gsums approximate the true group sums (the Q8_K bsums contract)
    true = np.asarray(x).reshape(2, 2, 32).sum(axis=-1)
    np.testing.assert_allclose(np.asarray(gsums), true, atol=0.15)


def test_roofline_accounting():
    from tpu_kquant.models.fixtures import random_qparams, tiny_config
    from tpu_kquant.utils.roofline import model_bytes_per_token, roofline_report

    cfg = tiny_config(n_layers=2, dim=64, n_heads=4, n_kv_heads=2,
                      ffn_dim=128, vocab_size=512)
    params = random_qparams(cfg)
    mb = model_bytes_per_token(params)
    assert mb["weight_bytes"] > 0
    # q4 with f32 scales/mins = 0.75 B/elem; weights exclude tok_embd rows
    rep = roofline_report(params, cfg, measured_tok_s=100.0, chip="v5e",
                          batch=1, seq_len=128)
    assert rep["roofline_tok_s"] > 0
    assert 0 < rep["fraction_of_roofline"] < 1e6


def test_yarn_rope_differs_from_plain():
    plain = RopeParams(head_dim=64, n_rot=64, freq_base=10000.0)
    yarn = RopeParams(head_dim=64, n_rot=64, freq_base=10000.0,
                      freq_scale=0.25, ext_factor=1.0, n_ctx_orig=2048)
    pos = jnp.asarray([100.0])
    c0, s0 = rope_cos_sin(pos, plain)
    c1, s1 = rope_cos_sin(pos, yarn)
    assert not np.allclose(np.asarray(c0), np.asarray(c1))
    # yarn attn mscale amplifies magnitude
    assert np.abs(np.asarray(c1)).max() > 1.0
