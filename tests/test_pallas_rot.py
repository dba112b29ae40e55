"""Parity: the rotated-boundary kernel (oproj+FFN+next-layer attn_in in one
launch, ops.attic.pallas_rot.fused_oproj_ffn_attn_in) vs the composed pair
(fused_oproj_ffn then fused_attn_in) in interpret mode."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tpu_kquant.gguf.constants import GGMLType  # noqa: E402
from tpu_kquant.ops.pallas_attn_in import fused_attn_in, rope_tables_full  # noqa: E402
from tpu_kquant.ops.attic.pallas_rot import (  # noqa: E402
    fused_oproj_ffn_attn_in,
    rot_supported,
)
from tpu_kquant.ops.pallas_ffn import fused_oproj_ffn  # noqa: E402
from tpu_kquant.quant import quantize  # noqa: E402
from tpu_kquant.quant.repack import (  # noqa: E402
    pack_scale_pairs,
    repack,
    widen_q6,
)


def mk_q4_sm(N, K, rng):
    w = rng.standard_normal((N, K)).astype(np.float32) * 0.1
    qt = repack(quantize(w, GGMLType.Q4_K), GGMLType.Q4_K, (N, K),
                layout="kmajor")
    return pack_scale_pairs(qt)


def mk_q6w(N, K, rng):
    w = rng.standard_normal((N, K)).astype(np.float32) * 0.1
    qt = repack(quantize(w, GGMLType.Q6_K), GGMLType.Q6_K, (N, K),
                layout="kmajor")
    return widen_q6(qt)


def _setup(R=1, D=512, F=768, Hhd=1024, Nqk=1152, Nv=128, seed=0):
    rng = np.random.default_rng(seed)
    wo = mk_q4_sm(D, Hhd, rng)
    gu = mk_q4_sm(2 * F, D, rng)
    dn = mk_q6w(D, F, rng)
    wqk2 = mk_q4_sm(Nqk, D, rng)
    wv2 = mk_q6w(Nv, D, rng)
    x = jnp.asarray(rng.standard_normal((R, 1, D)) * 0.5, jnp.bfloat16)
    attn = jnp.asarray(rng.standard_normal((R, 1, Hhd)) * 0.5, jnp.bfloat16)
    nw = jnp.asarray(rng.standard_normal((D,)) * 0.1 + 1.0, jnp.float32)
    nw2 = jnp.asarray(rng.standard_normal((D,)) * 0.1 + 1.0, jnp.float32)
    hd = 64
    pos = rng.integers(0, 100, (R, 1))
    ang = pos[..., None] / (10000.0 ** (np.arange(hd // 2) * 2 / hd))
    cos = jnp.asarray(np.cos(ang), jnp.float32)
    sin = jnp.asarray(np.sin(ang), jnp.float32)
    n_heads_roped = Nqk // hd
    cf, sf = rope_tables_full(cos, sin, n_heads_roped, hd, n_pad=0)
    return wo, gu, dn, wqk2, wv2, x, attn, nw, nw2, cf, sf, hd


@pytest.mark.parametrize("R", [1, 4])
def test_rot_matches_composed(R):
    wo, gu, dn, wqk2, wv2, x, attn, nw, nw2, cf, sf, hd = _setup(R=R)
    assert rot_supported(wo, gu, dn, [wqk2, wv2], R, x.shape[-1])

    y0 = fused_oproj_ffn(x, attn, wo, nw, 1e-5, gu, dn, interpret=True)
    qk0, v0 = fused_attn_in(y0, nw2, 1e-5, [wqk2, wv2], cf, sf, hd // 2,
                            interpret=True)

    y1, qk1, v1 = fused_oproj_ffn_attn_in(
        x, attn, wo, nw, 1e-5, gu, dn, nw2, [wqk2, wv2], cf, sf, hd // 2,
        interpret=True)

    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    for a, b, name in ((qk0, qk1, "qk"), (v0, v1, "v")):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        tol = 2e-2 * max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, atol=tol, err_msg=name)


def test_rot_flat_wo_and_sp():
    from tpu_kquant.quant.repack import pack_scale_kpairs

    wo, gu, dn, wqk2, wv2, x, attn, nw, nw2, cf, sf, hd = _setup()
    rng = np.random.default_rng(3)
    wo6 = mk_q6w(x.shape[-1], attn.shape[-1], rng)
    dn_sp = pack_scale_kpairs(dn)
    wv2_sp = pack_scale_kpairs(wv2)

    y0 = fused_oproj_ffn(x, attn, wo6, nw, 1e-5, gu, dn_sp, interpret=True)
    qk0, v0 = fused_attn_in(y0, nw2, 1e-5, [wqk2, wv2_sp], cf, sf, hd // 2,
                            interpret=True)
    y1, qk1, v1 = fused_oproj_ffn_attn_in(
        x, attn, wo6, nw, 1e-5, gu, dn_sp, nw2, [wqk2, wv2_sp], cf, sf,
        hd // 2, interpret=True)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    for a, b in ((qk0, qk1), (v0, v1)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        np.testing.assert_allclose(b, a, atol=2e-2 * max(1.0, np.abs(a).max()))
