"""Fused attention-output megakernel (flash attention + o_proj + residual)
vs the unfused composition, in interpret mode."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_kquant.gguf.constants import GGMLType
from tpu_kquant.ops.attention import attention_decode
from tpu_kquant.ops.pallas_attn_out import attn_out_supported, fused_attn_out
from tpu_kquant.ops.qmatmul import qmatmul
from tpu_kquant.quant import quantize
from tpu_kquant.quant.repack import pack_scale_pairs, repack, widen_q6

RNG = np.random.default_rng(11)


def _mk_wo(qtype, dim, K, pack_pairs=False, widen=False):
    w = RNG.standard_normal((dim, K)).astype(np.float32) * 0.1
    qt = repack(quantize(w, qtype), qtype, (dim, K), layout="kmajor")
    if widen:
        qt = widen_q6(qt)
    if pack_pairs:
        qt = pack_scale_pairs(qt)
    return qt


def _setup(B, S, H, Hkv, D, dim, pos, quantized=False):
    q = jnp.asarray(RNG.standard_normal((B, 1, H, D)), jnp.bfloat16)
    x = jnp.asarray(RNG.standard_normal((B, 1, dim)), jnp.bfloat16)
    if quantized:
        k = jnp.asarray(RNG.integers(-127, 127, (B, Hkv, S, D)), jnp.int8)
        v = jnp.asarray(RNG.integers(-127, 127, (B, Hkv, S, D)), jnp.int8)
        ks = jnp.asarray(RNG.random((B, Hkv, S)) * 0.01 + 0.001, jnp.float32)
        vs = jnp.asarray(RNG.random((B, Hkv, S)) * 0.01 + 0.001, jnp.float32)
        scales = (ks, vs)
    else:
        k = jnp.asarray(RNG.standard_normal((B, Hkv, S, D)), jnp.bfloat16)
        v = jnp.asarray(RNG.standard_normal((B, Hkv, S, D)), jnp.bfloat16)
        scales = None
    positions = jnp.asarray(pos, jnp.int32).reshape(B, 1)
    return x, q, k, v, positions, scales


def _reference(x, q, k, v, positions, scales, wo):
    B, T, H, D = q.shape
    attn = attention_decode(q, k, v, positions, scales, impl="xla")
    h = qmatmul(attn.reshape(B, T, H * D), wo, impl="xla")
    return x + h


def _check(got, ref):
    ref = np.asarray(ref, np.float32)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), ref,
        rtol=3e-2, atol=3e-2 * float(np.abs(ref).max()),
    )


@pytest.mark.parametrize("pack_pairs", [False, True])
def test_q4_wo(pack_pairs):
    B, S, H, Hkv, D, dim = 1, 256, 8, 2, 64, 512
    wo = _mk_wo(GGMLType.Q4_K, dim, H * D, pack_pairs=pack_pairs)
    assert wo.kind == "q4"
    assert attn_out_supported(wo, H, Hkv, D, rows=B, S=S)
    x, q, k, v, positions, scales = _setup(B, S, H, Hkv, D, dim, [100])
    ref = _reference(x, q, k, v, positions, scales, wo)
    got = fused_attn_out(x, q, k, v, positions, scales, wo, ts=128,
                         interpret=True)
    assert got.shape == x.shape and got.dtype == x.dtype
    _check(got, ref)


@pytest.mark.parametrize("qtype,widen", [(GGMLType.Q6_K, True),
                                         (GGMLType.Q8_0, False)])
def test_flat_wo_kinds(qtype, widen):
    B, S, H, Hkv, D, dim = 1, 128, 8, 4, 64, 512
    wo = _mk_wo(qtype, dim, H * D, widen=widen)
    assert wo.kind in ("q6w", "q8")
    assert attn_out_supported(wo, H, Hkv, D, rows=B, S=S)
    x, q, k, v, positions, scales = _setup(B, S, H, Hkv, D, dim, [64])
    ref = _reference(x, q, k, v, positions, scales, wo)
    got = fused_attn_out(x, q, k, v, positions, scales, wo, ts=64,
                         interpret=True)
    _check(got, ref)


def test_batch_ragged_positions():
    B, S, H, Hkv, D, dim = 3, 256, 8, 2, 64, 512
    wo = _mk_wo(GGMLType.Q4_K, dim, H * D, pack_pairs=True)
    x, q, k, v, positions, scales = _setup(B, S, H, Hkv, D, dim,
                                           [3, 100, 255])
    ref = _reference(x, q, k, v, positions, scales, wo)
    got = fused_attn_out(x, q, k, v, positions, scales, wo, ts=64,
                         interpret=True)
    _check(got, ref)


def test_int8_kv():
    B, S, H, Hkv, D, dim = 2, 128, 8, 2, 64, 512
    wo = _mk_wo(GGMLType.Q4_K, dim, H * D, pack_pairs=True)
    x, q, k, v, positions, scales = _setup(B, S, H, Hkv, D, dim, [60, 127],
                                           quantized=True)
    ref = _reference(x, q, k, v, positions, scales, wo)
    got = fused_attn_out(x, q, k, v, positions, scales, wo, ts=64,
                         interpret=True)
    _check(got, ref)


def test_gqa_many_pairs():
    # Hkv=4 -> two head pairs; MHA groups G=2
    B, S, H, Hkv, D, dim = 1, 128, 8, 4, 64, 640
    wo = _mk_wo(GGMLType.Q4_K, dim, H * D)
    x, q, k, v, positions, scales = _setup(B, S, H, Hkv, D, dim, [127])
    ref = _reference(x, q, k, v, positions, scales, wo)
    got = fused_attn_out(x, q, k, v, positions, scales, wo, ts=64,
                         interpret=True)
    _check(got, ref)


def test_supported_gates():
    H, Hkv, D, dim = 8, 2, 64, 512
    wo = _mk_wo(GGMLType.Q4_K, dim, H * D)
    assert attn_out_supported(wo, H, Hkv, D, rows=1, S=256)
    # odd kv-head count: no pairing
    assert not attn_out_supported(wo, H, 1, D, rows=1, S=256)
    # prefill row counts fall back
    assert not attn_out_supported(wo, H, Hkv, D, rows=64, S=256)
    # rowmajor layout unsupported
    w = RNG.standard_normal((dim, H * D)).astype(np.float32)
    rm = repack(quantize(w, GGMLType.Q4_K), GGMLType.Q4_K, (dim, H * D),
                layout="rowmajor")
    assert not attn_out_supported(rm, H, Hkv, D, rows=1, S=256)
    # K mismatch with H*D
    assert not attn_out_supported(wo, H, Hkv, D // 2, rows=1, S=256)
