"""Repacked QTensor layouts must dequantize bit-identically to the numpy
codecs (SURVEY.md section 4 item (b) precondition: one source of truth for
numerics)."""

import numpy as np
import pytest

from tpu_kquant.gguf.constants import GGMLType
from tpu_kquant.quant import dequantize, quantize
from tpu_kquant.quant.jnp_codecs import dequant_kmajor, dequant_logical, dequant_rows
from tpu_kquant.quant.repack import repack

RNG = np.random.default_rng(2)

QTYPES = [
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q4_K,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.Q8_0,
]


@pytest.mark.parametrize("qtype", QTYPES)
def test_kmajor_matches_numpy(qtype):
    N, K = 8, 512
    x = RNG.standard_normal((N, K)).astype(np.float32)
    raw = quantize(x, qtype)
    ref = dequantize(raw, qtype, (N, K))
    qt = repack(raw, qtype, (N, K), layout="kmajor")
    wt = np.asarray(dequant_kmajor(qt))
    assert wt.shape == (K, N)
    np.testing.assert_allclose(wt.T, ref, rtol=1e-5, atol=1e-5)
    wl = np.asarray(dequant_logical(qt))
    np.testing.assert_allclose(wl, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.Q8_0])
def test_rowmajor_gather(qtype):
    N, K = 16, 256
    x = RNG.standard_normal((N, K)).astype(np.float32)
    raw = quantize(x, qtype)
    ref = dequantize(raw, qtype, (N, K))
    qt = repack(raw, qtype, (N, K), layout="rowmajor")
    rows = np.array([3, 0, 15, 7])
    out = np.asarray(dequant_rows(qt, rows))
    np.testing.assert_allclose(out, ref[rows], rtol=1e-5, atol=1e-5)
    full = np.asarray(dequant_rows(qt, None))
    np.testing.assert_allclose(full, ref, rtol=1e-5, atol=1e-5)


def test_dense_fallback():
    x = RNG.standard_normal((4, 64)).astype(np.float32)
    raw = quantize(x, GGMLType.F16)
    qt = repack(raw, GGMLType.F16, (4, 64))
    assert qt.kind == "dense"
    np.testing.assert_allclose(np.asarray(dequant_logical(qt)), x, atol=2e-3, rtol=2e-3)


def test_bits_per_element():
    N, K = 8, 512
    x = RNG.standard_normal((N, K)).astype(np.float32)
    qt = repack(quantize(x, GGMLType.Q4_K), GGMLType.Q4_K, (N, K))
    # 4-bit codes + f32 scales/mins per 32: 4 + 2*32/32... = 6 bits at f32 scales
    assert 4.0 < qt.bits_per_element <= 6.1
    qtb = qt.astype_scales(np.dtype("bfloat16"))
    assert qtb.bits_per_element <= 5.1
