"""Fused attention-input megakernel vs the unfused composition
(rms_norm -> qmatmul wqk/wv -> neox rope)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_kquant.gguf.constants import GGMLType
from tpu_kquant.ops.norms import rms_norm
from tpu_kquant.ops.pallas_attn_in import (
    attn_in_supported,
    fused_attn_in,
    rope_tables_full,
)
from tpu_kquant.ops.qmatmul import qmatmul
from tpu_kquant.ops.rope import RopeParams, apply_rope, rope_cos_sin
from tpu_kquant.quant import quantize
from tpu_kquant.quant.repack import pack_scale_pairs, repack, widen_q6

RNG = np.random.default_rng(11)
D, HD = 512, 64  # model dim, head dim
H, HKV = 6, 2  # 6*64=384 q feats, 2*64=128 k feats
EPS = 1e-5


def _mk(qtype, N, K, pack_pairs=False, widen=False):
    w = RNG.standard_normal((N, K)).astype(np.float32) * 0.1
    qt = repack(quantize(w, qtype), qtype, (N, K), layout="kmajor")
    if widen:
        qt = widen_q6(qt)
    if pack_pairs:
        qt = pack_scale_pairs(qt)
    return qt


def _reference(x, nw, wqk, wv, cos, sin, bias_qk=None, bias_v=None):
    h = rms_norm(x, nw, EPS)
    qk = qmatmul(h, wqk, impl="xla")
    v = qmatmul(h, wv, impl="xla")
    if bias_qk is not None:
        qk = qk + bias_qk
    if bias_v is not None:
        v = v + bias_v
    B, T, _ = x.shape
    nh = qk.shape[-1] // HD
    qk4 = qk.reshape(B, T, nh, HD)
    roped = apply_rope(qk4, cos[:, :, None, :], sin[:, :, None, :], "neox")
    return roped.reshape(B, T, nh * HD), v


def _tols(ref):
    return dict(rtol=3e-2,
                atol=3e-2 * float(np.abs(np.asarray(ref, np.float32)).max()))


@pytest.mark.parametrize("pack_pairs", [False, True])
def test_fused_attn_in_q4_q6w(pack_pairs):
    wqk = _mk(GGMLType.Q4_K, (H + HKV) * HD, D, pack_pairs=pack_pairs)
    wv = _mk(GGMLType.Q6_K, HKV * HD, D, widen=True)
    assert wqk.kind == "q4" and wv.kind == "q6w"
    assert attn_in_supported([wqk, wv], rows=1, D=D)
    nw = jnp.asarray(1.0 + 0.1 * RNG.standard_normal(D), jnp.float32)
    x = jnp.asarray(RNG.standard_normal((1, 1, D)), jnp.bfloat16)
    pos = jnp.asarray([[5]], jnp.int32)
    cos, sin = rope_cos_sin(pos, RopeParams(head_dim=HD, n_rot=HD, mode="neox"))
    ref_qk, ref_v = _reference(x, nw, wqk, wv, cos, sin)
    cf, sf = rope_tables_full(cos, sin, H + HKV, HD)
    got_qk, got_v = fused_attn_in(x, nw, EPS, [wqk, wv], cf, sf, HD // 2,
                                  interpret=True)
    assert got_qk.shape == ref_qk.shape and got_v.shape == ref_v.shape
    np.testing.assert_allclose(np.asarray(got_qk, np.float32),
                               np.asarray(ref_qk, np.float32), **_tols(ref_qk))
    np.testing.assert_allclose(np.asarray(got_v, np.float32),
                               np.asarray(ref_v, np.float32), **_tols(ref_v))


def test_fused_attn_in_batch_rows_and_positions():
    wqk = _mk(GGMLType.Q4_K, (H + HKV) * HD, D, pack_pairs=True)
    wv = _mk(GGMLType.Q8_0, HKV * HD, D)
    nw = jnp.asarray(1.0 + 0.1 * RNG.standard_normal(D), jnp.float32)
    x = jnp.asarray(RNG.standard_normal((4, 1, D)), jnp.bfloat16)
    pos = jnp.asarray([[3], [17], [0], [255]], jnp.int32)
    cos, sin = rope_cos_sin(pos, RopeParams(head_dim=HD, n_rot=HD, mode="neox"))
    ref_qk, ref_v = _reference(x, nw, wqk, wv, cos, sin)
    cf, sf = rope_tables_full(cos, sin, H + HKV, HD)
    got_qk, got_v = fused_attn_in(x, nw, EPS, [wqk, wv], cf, sf, HD // 2,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got_qk, np.float32),
                               np.asarray(ref_qk, np.float32), **_tols(ref_qk))
    np.testing.assert_allclose(np.asarray(got_v, np.float32),
                               np.asarray(ref_v, np.float32), **_tols(ref_v))


def test_fused_attn_in_single_qkv_tensor_with_bias():
    """phi3-style single fused QKV tensor: v section rides cos=1/sin=0 table
    padding; qwen2-style biases added before rope."""
    nqk, nv = (H + HKV) * HD, HKV * HD
    wqkv = _mk(GGMLType.Q4_K, nqk + nv, D, pack_pairs=True)
    nw = jnp.asarray(1.0 + 0.1 * RNG.standard_normal(D), jnp.float32)
    x = jnp.asarray(RNG.standard_normal((2, 1, D)), jnp.bfloat16)
    pos = jnp.asarray([[9], [2]], jnp.int32)
    cos, sin = rope_cos_sin(pos, RopeParams(head_dim=HD, n_rot=HD, mode="neox"))
    bias = jnp.asarray(RNG.standard_normal(nqk + nv), jnp.float32)

    h = rms_norm(x, nw, EPS)
    qkv = qmatmul(h, wqkv, impl="xla") + bias
    qk4 = qkv[..., :nqk].reshape(2, 1, H + HKV, HD)
    roped = apply_rope(qk4, cos[:, :, None, :], sin[:, :, None, :], "neox")
    ref = jnp.concatenate([roped.reshape(2, 1, nqk), qkv[..., nqk:]], -1)

    cf, sf = rope_tables_full(cos, sin, H + HKV, HD, n_pad=nv)
    (got,) = fused_attn_in(x, nw, EPS, [wqkv], cf, sf, HD // 2,
                           biases=[bias], interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), **_tols(ref))


def test_attn_in_supported_gates():
    wqk = _mk(GGMLType.Q4_K, (H + HKV) * HD, D, pack_pairs=True)
    wv = _mk(GGMLType.Q6_K, HKV * HD, D, widen=True)
    assert not attn_in_supported([wqk, wv], rows=64, D=D)  # prefill rows
    assert not attn_in_supported([wqk, wv], rows=1, D=D + 128)  # K mismatch
    wv_folded = _mk(GGMLType.Q6_K, HKV * HD, D)  # narrow q6: unsupported
    assert not attn_in_supported([wqk, wv_folded], rows=1, D=D)
