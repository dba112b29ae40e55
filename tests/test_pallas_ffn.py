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
