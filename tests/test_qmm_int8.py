"""INT8-MXU quantized matmul vs the bf16-dequant reference path.

Expected agreement is Q8_K-activation-rounding-limited (the reference engine
runs the same numerics: activations are 8-bit rounded before the dot)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_kquant.gguf.constants import GGMLType
from tpu_kquant.ops.pallas_qmm_int8 import qmm_int8
from tpu_kquant.ops.qmatmul import qmatmul
from tpu_kquant.quant import quantize
from tpu_kquant.quant.repack import repack

RNG = np.random.default_rng(6)


def _mk(N, K, qtype=GGMLType.Q4_K):
    w = RNG.standard_normal((N, K)).astype(np.float32) * 0.1
    return repack(quantize(w, qtype), qtype, (N, K), layout="kmajor")


@pytest.mark.parametrize("B,N,K", [(4, 256, 512), (8, 512, 2048), (1, 128, 256)])
def test_int8_matches_reference(B, N, K):
    qt = _mk(N, K)
    x = jnp.asarray(RNG.standard_normal((B, K)), jnp.float32)
    ref = np.asarray(qmatmul(x, qt, impl="xla"))
    got = np.asarray(qmm_int8(x, qt, interpret=True))
    # error budget: int8 activation rounding ~ 0.4% of |x| per element,
    # accumulated over K -> compare relative to the output RMS
    denom = np.sqrt(np.mean(ref**2)) + 1e-9
    rms = np.sqrt(np.mean((got - ref) ** 2)) / denom
    assert rms < 0.02, rms
    corr = float((got * ref).mean() / (denom * np.sqrt(np.mean(got**2)) + 1e-12))
    assert corr > 0.999


@pytest.mark.parametrize("B,N,K", [(4, 256, 512), (8, 256, 2048)])
def test_int8_q6k_matches_reference(B, N, K):
    qt = _mk(N, K, GGMLType.Q6_K)
    assert qt.kind == "q6"
    x = jnp.asarray(RNG.standard_normal((B, K)), jnp.float32)
    ref = np.asarray(qmatmul(x, qt, impl="xla"))
    got = np.asarray(qmm_int8(x, qt, interpret=True))
    denom = np.sqrt(np.mean(ref**2)) + 1e-9
    rms = np.sqrt(np.mean((got - ref) ** 2)) / denom
    assert rms < 0.02, rms


def test_int8_3d_batch():
    qt = _mk(256, 512)
    x = jnp.asarray(RNG.standard_normal((2, 3, 512)), jnp.float32)
    ref = np.asarray(qmatmul(x, qt, impl="xla"))
    got = np.asarray(qmm_int8(x, qt, interpret=True))
    assert got.shape == ref.shape
    rms = np.sqrt(np.mean((got - ref) ** 2)) / (np.sqrt(np.mean(ref**2)) + 1e-9)
    assert rms < 0.02
