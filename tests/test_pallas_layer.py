"""Whole-layer single-launch kernel (ops/pallas_layer.py) parity vs the
composed reference path (norm->qkv->rope->append->attention->oproj->ffn built
from the repo's own ops + exact dequant). Run in interpret mode on CPU.

The attention phase uses an online softmax whose accumulation order differs
from the XLA softmax, and matmuls run in bf16 — parity is tolerance-based
(the engine-level greedy-token test on TPU pins end-to-end behavior)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_kquant.ops.pallas_layer import fused_layer, layer_supported
from tpu_kquant.quant.jnp_codecs import dequant_kmajor
from tpu_kquant.quant.qtensor import QTensor

D, H, Hkv, HD_ = 512, 16, 4, 64
F = 512
S = 96  # not a multiple of the 256 tile: exercises the partial-tile path
B = 1


def mk_q4(N, K, rng, sm=True):
    import ml_dtypes

    qs = rng.integers(0, 256, (K // 2, N), dtype=np.uint8)
    arrays = {"qs": jnp.asarray(qs)}
    s = (rng.random((K // 32, N), dtype=np.float32) * 0.02 + 0.001)
    m = (rng.random((K // 32, N), dtype=np.float32) * 0.02)
    if sm:
        sb = s.astype(ml_dtypes.bfloat16).view(np.uint16).astype(np.uint32)
        mb = m.astype(ml_dtypes.bfloat16).view(np.uint16).astype(np.uint32)
        arrays["sm"] = jnp.asarray((sb | (mb << 16)).view(np.float32))
    else:
        arrays["scales"] = jnp.asarray(s)
        arrays["mins"] = jnp.asarray(m)
    return QTensor("q4", "kmajor", (N, K), arrays)


def mk_q6w(N, K, rng):
    qs = rng.integers(-32, 32, (K, N)).astype(np.int8)
    s = (rng.random((K // 16, N), dtype=np.float32) * 0.02 + 0.001)
    return QTensor("q6w", "kmajor", (N, K),
                   {"qs": jnp.asarray(qs), "scales": jnp.asarray(s)})


def neox_rope(x, cos, sin):
    # x: [B, T, H, hd]; cos/sin: [B, T, hd/2]
    h2 = x.shape[-1] // 2
    x1, x2 = x[..., :h2], x[..., h2:]
    c, s = cos[:, :, None, :], sin[:, :, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)


def ref_layer(x, pos, anw, fnw, eps, wqk, wv, wo, gu, dn, cos, sin,
              k_cache, v_cache):
    hd = wqk.shape[0] // (H + Hkv)
    xf = x.astype(jnp.float32)
    hn = (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
          * anw).astype(jnp.bfloat16)
    qk = (hn @ dequant_kmajor(wqk, jnp.bfloat16)).astype(jnp.float32)
    v_new = (hn @ dequant_kmajor(wv, jnp.bfloat16)).astype(jnp.bfloat16)
    qk = qk.astype(jnp.bfloat16).astype(jnp.float32)
    q = qk[..., : H * hd].reshape(B, 1, H, hd)
    k = qk[..., H * hd:].reshape(B, 1, Hkv, hd)
    q = neox_rope(q, cos, sin).astype(jnp.bfloat16)
    k = neox_rope(k, cos, sin).astype(jnp.bfloat16)
    v_new = v_new.reshape(B, 1, Hkv, hd)

    # append at pos then full attention (slots >= pos+1 masked)
    kc = k_cache
    vc = v_cache
    for b in range(B):
        kc = kc.at[b, :, pos[b, 0]].set(k[b, 0].astype(kc.dtype))
        vc = vc.at[b, :, pos[b, 0]].set(v_new[b, 0].astype(vc.dtype))
    G = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, 1, Hkv, G, hd)
    logits = jnp.einsum("bthgd,bhsd->bthgs", qf, kc.astype(jnp.float32))
    logits = logits * (hd ** -0.5)
    kv_pos = jnp.arange(S)[None, None, :]
    mask = kv_pos <= pos[:, :, None]
    logits = jnp.where(mask[:, :, None, None, :], logits, -jnp.inf)
    p = jax.nn.softmax(logits, -1)
    attn = jnp.einsum("bthgs,bhsd->bthgd", p, vc.astype(jnp.float32))
    attn = attn.reshape(B, 1, H * hd).astype(jnp.bfloat16)

    h = (attn @ dequant_kmajor(wo, jnp.bfloat16)).astype(jnp.float32)
    x2 = (x.astype(jnp.float32)
          + h.astype(jnp.bfloat16).astype(jnp.float32)).astype(jnp.bfloat16)

    xf2 = x2.astype(jnp.float32)
    xn = (xf2 * jax.lax.rsqrt(jnp.mean(xf2 * xf2, -1, keepdims=True) + eps)
          * fnw).astype(jnp.bfloat16)
    guo = (xn @ dequant_kmajor(gu, jnp.bfloat16)).astype(jnp.float32)
    gate, up = guo[..., :F], guo[..., F:]
    a = (jax.nn.silu(gate.astype(jnp.bfloat16).astype(jnp.float32))
         * up.astype(jnp.bfloat16).astype(jnp.float32)).astype(jnp.bfloat16)
    dno = (a @ dequant_kmajor(dn, jnp.bfloat16)).astype(jnp.float32)
    y = (x2.astype(jnp.float32) + dno).astype(jnp.bfloat16)
    return y, k, v_new


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    hd = 64
    wqk = mk_q4((H + Hkv) * hd, D, rng)
    wv = mk_q6w(Hkv * hd, D, rng)
    wo = mk_q4(D, H * hd, rng, sm=False)
    gu = mk_q4(2 * F, D, rng)
    dn = mk_q6w(D, F, rng)
    assert layer_supported(wqk, wv, wo, gu, dn, B, D, H, Hkv, hd)
    x = jnp.asarray(rng.standard_normal((B, 1, D)) * 0.5, jnp.bfloat16)
    anw = jnp.asarray(rng.random(D) + 0.5, jnp.float32)
    fnw = jnp.asarray(rng.random(D) + 0.5, jnp.float32)
    k_cache = jnp.asarray(rng.standard_normal((B, Hkv, S, hd)) * 0.3,
                          jnp.bfloat16)
    v_cache = jnp.asarray(rng.standard_normal((B, Hkv, S, hd)) * 0.3,
                          jnp.bfloat16)
    return dict(wqk=wqk, wv=wv, wo=wo, gu=gu, dn=dn, x=x, anw=anw, fnw=fnw,
                k_cache=k_cache, v_cache=v_cache, rng=rng, hd=hd)


@pytest.mark.parametrize("pos_val", [1, 40, S - 1])
def test_layer_parity(setup, pos_val):
    s = setup
    hd = s["hd"]
    pos = jnp.full((B, 1), pos_val, jnp.int32)
    from tpu_kquant.ops.rope import RopeParams, rope_cos_sin

    cos, sin = rope_cos_sin(pos, RopeParams(head_dim=hd, n_rot=hd,
                                            mode="neox"))
    cos, sin = cos.astype(jnp.float32), sin.astype(jnp.float32)

    y, k_new, v_new = fused_layer(
        s["x"], pos, s["anw"], s["fnw"], 1e-5, s["wqk"], s["wv"], s["wo"],
        s["gu"], s["dn"], cos, sin, s["k_cache"], s["v_cache"], H, Hkv,
        interpret=True)
    y_ref, k_ref, v_ref = ref_layer(
        s["x"], pos, s["anw"], s["fnw"], 1e-5, s["wqk"], s["wv"], s["wo"],
        s["gu"], s["dn"], cos, sin, s["k_cache"], s["v_cache"])

    np.testing.assert_allclose(
        np.asarray(k_new, np.float32), np.asarray(k_ref, np.float32),
        rtol=0.05, atol=0.02)
    np.testing.assert_allclose(
        np.asarray(v_new, np.float32), np.asarray(v_ref, np.float32),
        rtol=0.05, atol=0.02)
    a = np.asarray(y, np.float32).ravel()
    b = np.asarray(y_ref, np.float32).ravel()
    corr = float(np.corrcoef(a, b)[0, 1])
    assert corr > 0.999, corr
    # near-zero elements of a huge-magnitude output blow up rtol under bf16
    # accumulation; bound the error relative to the output's own RMS instead
    rms = float(np.sqrt((b ** 2).mean()))
    np.testing.assert_allclose(a, b, rtol=0.12, atol=0.01 * rms)


def test_engine_dispatch_gate(setup):
    """layer_supported rejects unsupported configs."""
    s = setup
    hd = s["hd"]
    assert not layer_supported(s["wqk"], s["wv"], s["wo"], s["gu"], s["dn"],
                               8, D, H, Hkv, hd)  # rows > 4
    bad = QTensor("q4", "rowmajor", s["wqk"].shape, s["wqk"].arrays)
    assert not layer_supported(bad, s["wv"], s["wo"], s["gu"], s["dn"],
                               1, D, H, Hkv, hd)
