"""Fused FFN-block megakernel vs the unfused composition (rms_norm ->
qmatmul gate/up -> swiglu -> qmatmul down -> residual)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_kquant.gguf.constants import GGMLType
from tpu_kquant.ops.activations import geglu, swiglu
from tpu_kquant.ops.norms import rms_norm
from tpu_kquant.ops.pallas_ffn import ffn_supported, fused_ffn
from tpu_kquant.ops.qmatmul import qmatmul
from tpu_kquant.quant import quantize
from tpu_kquant.quant.repack import pack_scale_pairs, repack, widen_q6

RNG = np.random.default_rng(7)
D, F = 512, 768  # small but multi-chunk-capable shapes (TF=256 -> 3 steps)
EPS = 1e-5


def _mk(qtype, N, K, pack_pairs=False, widen=False):
    w = RNG.standard_normal((N, K)).astype(np.float32) * 0.1
    qt = repack(quantize(w, qtype), qtype, (N, K), layout="kmajor")
    if widen:
        qt = widen_q6(qt)
    if pack_pairs:
        qt = pack_scale_pairs(qt)
    return qt


def _reference(x, nw, gu, dn, act=swiglu):
    h = rms_norm(x, nw, EPS)
    g = qmatmul(h, gu, impl="xla")
    Fh = g.shape[-1] // 2
    h = qmatmul(act(g[..., :Fh], g[..., Fh:]), dn, impl="xla")
    return x + h


@pytest.mark.parametrize("pack_pairs", [False, True])
def test_fused_ffn_q4_q6w(pack_pairs):
    gu = _mk(GGMLType.Q4_K, 2 * F, D, pack_pairs=pack_pairs)
    dn = _mk(GGMLType.Q6_K, D, F, widen=True)
    assert gu.kind == "q4" and dn.kind == "q6w"
    assert ffn_supported(gu, dn, rows=1)
    nw = jnp.asarray(1.0 + 0.1 * RNG.standard_normal(D), jnp.float32)
    x = jnp.asarray(RNG.standard_normal((1, 1, D)), jnp.bfloat16)
    ref = _reference(x, nw, gu, dn)
    got = fused_ffn(x, nw, EPS, gu, dn, interpret=True)
    assert got.shape == x.shape and got.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2 * float(np.abs(np.asarray(ref, np.float32)).max()),
    )


def test_fused_ffn_batch_rows():
    gu = _mk(GGMLType.Q4_K, 2 * F, D, pack_pairs=True)
    dn = _mk(GGMLType.Q6_K, D, F, widen=True)
    x = jnp.asarray(RNG.standard_normal((4, 1, D)), jnp.bfloat16)
    nw = jnp.asarray(1.0 + 0.1 * RNG.standard_normal(D), jnp.float32)
    ref = _reference(x, nw, gu, dn)
    got = fused_ffn(x, nw, EPS, gu, dn, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2 * float(np.abs(np.asarray(ref, np.float32)).max()),
    )


def test_fused_ffn_q8_flat_gu_and_dn():
    gu = _mk(GGMLType.Q8_0, 2 * F, D)
    dn = _mk(GGMLType.Q8_0, D, F)
    assert gu.kind == "q8" and dn.kind == "q8"
    assert ffn_supported(gu, dn, rows=1)
    nw = jnp.asarray(1.0 + 0.1 * RNG.standard_normal(D), jnp.float32)
    x = jnp.asarray(RNG.standard_normal((2, 1, D)), jnp.bfloat16)
    ref = _reference(x, nw, gu, dn)
    got = fused_ffn(x, nw, EPS, gu, dn, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2 * float(np.abs(np.asarray(ref, np.float32)).max()),
    )


def test_fused_ffn_gelu():
    gu = _mk(GGMLType.Q4_K, 2 * F, D, pack_pairs=True)
    dn = _mk(GGMLType.Q6_K, D, F, widen=True)
    nw = jnp.asarray(1.0 + 0.1 * RNG.standard_normal(D), jnp.float32)
    x = jnp.asarray(RNG.standard_normal((1, 1, D)), jnp.bfloat16)
    ref = _reference(x, nw, gu, dn, act=geglu)
    got = fused_ffn(x, nw, EPS, gu, dn, act_fn="gelu", interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2 * float(np.abs(np.asarray(ref, np.float32)).max()),
    )


def test_ffn_supported_gates():
    gu = _mk(GGMLType.Q4_K, 2 * F, D, pack_pairs=True)
    dn_folded = _mk(GGMLType.Q4_K, D, F)  # folded down kind: unsupported
    dn = _mk(GGMLType.Q6_K, D, F, widen=True)
    assert not ffn_supported(gu, dn_folded, rows=1)
    assert not ffn_supported(gu, dn, rows=64)  # prefill rows
    assert not ffn_supported(dn, dn, rows=1)  # shape mismatch


# -- fused o_proj + residual + FFN megakernel ---------------------------------

from tpu_kquant.ops.pallas_ffn import fused_oproj_ffn, oproj_ffn_supported

KO = 1024  # o_proj contraction dim (H * head_dim)


def _oproj_reference(x, attn, wo, nw, gu, dn, act=swiglu):
    h = qmatmul(attn, wo, impl="xla")
    x2 = x + h
    hn = rms_norm(x2, nw, EPS)
    g = qmatmul(hn, gu, impl="xla")
    Fh = g.shape[-1] // 2
    return x2 + qmatmul(act(g[..., :Fh], g[..., Fh:]), dn, impl="xla")


def _oproj_setup(B=1):
    x = jnp.asarray(RNG.standard_normal((B, 1, D)), jnp.bfloat16)
    attn = jnp.asarray(RNG.standard_normal((B, 1, KO)) * 0.2, jnp.bfloat16)
    nw = jnp.asarray(1.0 + 0.1 * RNG.standard_normal(D), jnp.float32)
    return x, attn, nw


@pytest.mark.parametrize("pack_pairs", [False, True])
def test_fused_oproj_ffn_q4(pack_pairs):
    wo = _mk(GGMLType.Q4_K, D, KO, pack_pairs=pack_pairs)
    gu = _mk(GGMLType.Q4_K, 2 * F, D, pack_pairs=pack_pairs)
    dn = _mk(GGMLType.Q6_K, D, F, widen=True)
    assert oproj_ffn_supported(wo, gu, dn, rows=1)
    x, attn, nw = _oproj_setup()
    ref = _oproj_reference(x, attn, wo, nw, gu, dn)
    got = fused_oproj_ffn(x, attn, wo, nw, EPS, gu, dn, interpret=True)
    assert got.shape == x.shape and got.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2 * float(np.abs(np.asarray(ref, np.float32)).max()),
    )


@pytest.mark.parametrize("qtype,widen", [(GGMLType.Q6_K, True),
                                         (GGMLType.Q8_0, False)])
def test_fused_oproj_ffn_flat_wo(qtype, widen):
    wo = _mk(qtype, D, KO, widen=widen)
    gu = _mk(GGMLType.Q4_K, 2 * F, D, pack_pairs=True)
    dn = _mk(GGMLType.Q8_0, D, F)
    assert oproj_ffn_supported(wo, gu, dn, rows=1)
    x, attn, nw = _oproj_setup()
    ref = _oproj_reference(x, attn, wo, nw, gu, dn)
    got = fused_oproj_ffn(x, attn, wo, nw, EPS, gu, dn, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2 * float(np.abs(np.asarray(ref, np.float32)).max()),
    )


def test_fused_oproj_ffn_batch_and_gelu():
    wo = _mk(GGMLType.Q4_K, D, KO, pack_pairs=True)
    gu = _mk(GGMLType.Q4_K, 2 * F, D, pack_pairs=True)
    dn = _mk(GGMLType.Q6_K, D, F, widen=True)
    x, attn, nw = _oproj_setup(B=4)
    ref = _oproj_reference(x, attn, wo, nw, gu, dn, act=geglu)
    got = fused_oproj_ffn(x, attn, wo, nw, EPS, gu, dn, act_fn="gelu",
                          interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2 * float(np.abs(np.asarray(ref, np.float32)).max()),
    )


def test_oproj_supported_gates():
    wo = _mk(GGMLType.Q4_K, D, KO)
    gu = _mk(GGMLType.Q4_K, 2 * F, D)
    dn = _mk(GGMLType.Q6_K, D, F, widen=True)
    assert oproj_ffn_supported(wo, gu, dn, rows=1)
    # folded down kind is still unsupported through the combined gate
    dn_folded = _mk(GGMLType.Q4_K, D, F)
    assert not oproj_ffn_supported(wo, dn_folded, dn_folded, rows=1)
    # wo shape must be [dim, K]
    wo_bad = _mk(GGMLType.Q4_K, 2 * D, KO)
    assert not oproj_ffn_supported(wo_bad, gu, dn, rows=1)
    # prefill rows fall back
    assert not oproj_ffn_supported(wo, gu, dn, rows=64)
