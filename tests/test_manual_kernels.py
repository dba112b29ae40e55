"""Manual-pipeline megakernels (r5): numerics parity in interpret mode.

The production dispatch is TPU-only (pallas_attn_in.manual_attn_in_enabled /
pallas_ffn.manual_oproj_enabled); these pin the kernels' math against the
plain dequant reference so the hand-rolled DMA loops can't drift.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tools_kernel_bench import mk_q4, mk_q6w
from tpu_kquant.quant.jnp_codecs import dequant_kmajor


@pytest.mark.parametrize("tk", [128, 256])
def test_manual_attn_in_parity(tk):
    from tpu_kquant.ops.pallas_attn_in import (
        _attn_in_manual_call,
        rope_tables_full,
    )

    rng = np.random.default_rng(1)
    D, hd, H, Hkv = 512, 64, 4, 2
    wqk = mk_q4((H + Hkv) * hd, D, rng)
    wv = mk_q6w(Hkv * hd, D, rng)
    x = jnp.asarray(rng.standard_normal((1, D)) * 0.1, jnp.bfloat16)
    nw = jnp.asarray(rng.random(D) + 0.5, jnp.float32)
    cos = jnp.asarray(rng.random((1, 1, hd // 2)), jnp.float32)
    sin = jnp.asarray(rng.random((1, 1, hd // 2)), jnp.float32)
    cf, sf = rope_tables_full(cos, sin, H + Hkv, hd)
    o0, o1 = _attn_in_manual_call(
        x, nw, wqk.arrays["qs"], wqk.arrays["sm"], wv.arrays["qs"],
        wv.arrays["sp"], cf, sf, (H + Hkv) * hd, Hkv * hd, D, hd // 2,
        1e-5, 0.0, "bfloat16", True, tk)

    xf = np.asarray(x, np.float32)
    xn = xf / np.sqrt((xf * xf).mean(-1, keepdims=True) + 1e-5) \
        * np.asarray(nw)
    wqk_f = np.asarray(dequant_kmajor(wqk))  # [D, N0]
    wv_f = np.asarray(dequant_kmajor(wv))
    qk = xn @ wqk_f
    # NEOX rope on the qk output
    half = hd // 2
    y = qk.reshape(-1, (H + Hkv), hd)
    rot = np.concatenate([-y[..., half:], y[..., :half]], -1)
    c = np.concatenate([np.asarray(cos)[0], np.asarray(cos)[0]], -1)
    s = np.concatenate([np.asarray(sin)[0], np.asarray(sin)[0]], -1)
    ref0 = (y * c + rot * s).reshape(1, -1)
    ref1 = xn @ wv_f
    tol = 3e-2
    np.testing.assert_allclose(np.asarray(o0, np.float32), ref0, rtol=tol,
                               atol=tol * np.abs(ref0).max())
    np.testing.assert_allclose(np.asarray(o1, np.float32), ref1, rtol=tol,
                               atol=tol * np.abs(ref1).max())


@pytest.mark.parametrize("tko_tf", [(128, 256), (256, 512)])
def test_manual_oproj_ffn_parity(tko_tf):
    from tpu_kquant.ops.pallas_ffn import _oproj_ffn_manual_call

    tko, tf = tko_tf
    rng = np.random.default_rng(2)
    D, K, F = 512, 512, 1024
    wo = mk_q4(D, K, rng)
    gu = mk_q4(2 * F, D, rng)
    dn = mk_q6w(D, F, rng)
    x = jnp.asarray(rng.standard_normal((1, D)) * 0.1, jnp.bfloat16)
    attn = jnp.asarray(rng.standard_normal((1, K)) * 0.1, jnp.bfloat16)
    nw = jnp.asarray(rng.random(D) + 0.5, jnp.float32)
    y = _oproj_ffn_manual_call(
        x, attn, nw, wo.arrays["qs"], wo.arrays["sm"], gu.arrays["qs"],
        gu.arrays["sm"], dn.arrays["qs"], dn.arrays["sp"], D, K, F, 1e-5,
        "silu", "bfloat16", True, tko, tf)

    wo_f = np.asarray(dequant_kmajor(wo))   # [K, D]
    gu_f = np.asarray(dequant_kmajor(gu))   # [D, 2F]
    dn_f = np.asarray(dequant_kmajor(dn))   # [F, D]
    x2 = np.asarray(x, np.float32) + np.asarray(attn, np.float32) @ wo_f
    xn = x2 / np.sqrt((x2 * x2).mean(-1, keepdims=True) + 1e-5) \
        * np.asarray(nw)
    g = xn @ gu_f[:, :F]
    u = xn @ gu_f[:, F:]
    act = g / (1 + np.exp(-g)) * u
    ref = x2 + act @ dn_f
    tol = 3e-2
    np.testing.assert_allclose(np.asarray(y, np.float32), ref, rtol=tol,
                               atol=tol * np.abs(ref).max())
