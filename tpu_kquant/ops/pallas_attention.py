"""Blockwise (flash-style) decode attention Pallas kernel.

Replaces the reference's attention vec-dots + materialized kq_mask
(SURVEY.md 3.3: ggml_vec_dot_f16 over an f16 KV cache, soft_max_f32,
llama_kv_cache::set_input_kq_mask). TPU-native differences:

  - online softmax over S-tiles (running max / denominator in VMEM scratch)
    so no [S] logits row ever materializes in HBM;
  - the causal mask is COMPUTED from positions (iota <= q_pos), never stored;
  - INT8 KV support: K-scales fold into the logits columns after the QK^T
    matmul (one VPU multiply per logit, not per K element); V tiles are
    dequantized on cast;
  - GQA: the G=H/Hkv query heads of one KV head form the rows of a single
    MXU matmul per tile.

Decode-shape kernel: T=1 (one query token per sequence). Prefill uses the
fused XLA path in ops.attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _attn_kernel(TS, nS, scale, quantized, *refs):
    if quantized:
        (qpos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
         acc, m_scr, l_scr) = refs
    else:
        qpos_ref, q_ref, k_ref, v_ref, o_ref, acc, m_scr, l_scr = refs
        ks_ref = vs_ref = None

    s_idx = pl.program_id(2)

    @pl.when(s_idx == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    q_pos = qpos_ref[pl.program_id(0)]
    tile_start = s_idx * TS

    @pl.when(tile_start <= q_pos)
    def _():
        q = q_ref[0, 0]  # [G, D]
        kf = k_ref[0, 0].astype(jnp.bfloat16)  # [TS, D]
        vf = v_ref[0, 0].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16), kf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [G, TS]
        if ks_ref is not None:
            # int8 K: scale logits per column (token)
            s = s * ks_ref[0, 0]
        kv_idx = tile_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_idx <= q_pos, s, _NEG_INF)

        m_prev = m_scr[:, 0:1]  # [G, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [G, TS] f32
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if vs_ref is not None:
            # int8 V: fold the per-token scale into p AFTER the softmax
            # denominator is accumulated (vs must not normalize the weights)
            p = p * vs_ref[0, 0]
        acc[:] = acc[:] * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), vf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(s_idx == nS - 1)
    def _():
        o_ref[0, 0] = (acc[:] / l_scr[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "ts", "interpret"))
def _attn_call(q, k, v, q_pos, k_scale, v_scale, scale, ts, interpret):
    """q: [B, Hkv, G, D]; k/v: [B, Hkv, S, D] heads-major; q_pos: [B]."""
    B, Hkv, G, D = q.shape
    S = k.shape[2]
    TS = ts
    while S % TS != 0:
        TS //= 2
    nS = S // TS
    quantized = k_scale is not None

    # heads-major cache: a head's tokens are contiguous, so the (1,1,TS,D)
    # tiles below stream straight from HBM — no cache transpose
    kt = k
    vt = v

    # DMA-skipping for dead KV tiles: q_pos rides scalar prefetch so the
    # tile index map can clamp s to the last live tile (tiles past q_pos
    # re-request the SAME block index; Mosaic elides the repeat DMA). The
    # compute for those steps is already skipped by the tile_start <= q_pos
    # guard in the kernel, so dead cache slots now cost neither HBM
    # bandwidth nor MXU work — only empty grid steps.
    def live(b, s, qp):
        return jnp.minimum(s, qp[b] // TS)

    q_spec = pl.BlockSpec((1, 1, G, D), lambda b, h, s, qp: (b, h, 0, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, TS, D), lambda b, h, s, qp: (b, h, live(b, s, qp), 0), memory_space=pltpu.VMEM)
    in_specs = [q_spec, kv_spec, kv_spec]
    inputs = [q, kt, vt]
    if quantized:
        # scale tiles are (1, 1, 1, TS) on the LANE axis: Mosaic requires the
        # trailing block dim be 128-divisible, so the int8 path needs
        # S % 256 == 0 (the dispatch gate in ops.attention enforces it; the
        # XLA path covers other shapes). Caught by tools_kernel_smoke at
        # S=704, where the TS-shrink loop would land on an illegal TS=64.
        assert interpret or TS % 128 == 0, (
            f"int8-KV flash decode needs TS % 128 == 0 on hardware "
            f"(S % (2*ts) == 0), got S={S}, TS={TS}")
        kst = k_scale[:, :, None, :]  # [B, Hkv, 1, S]
        vst = v_scale[:, :, None, :]
        kspec = pl.BlockSpec((1, 1, 1, TS), lambda b, h, s, qp: (b, h, 0, live(b, s, qp)), memory_space=pltpu.VMEM)
        in_specs += [kspec, kspec]
        inputs += [kst, vst]

    kernel = functools.partial(_attn_kernel, TS, nS, scale, quantized)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, nS),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, G, D), lambda b, h, s, qp: (b, h, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G, D), jnp.float32),
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((G, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=interpret,
    )(q_pos.astype(jnp.int32), *inputs)
    return out


def attention_decode_pallas(
    q: jnp.ndarray,  # [B, 1, H, D]
    k_cache: jnp.ndarray,  # [B, Hkv, S, D] heads-major
    v_cache: jnp.ndarray,
    q_positions: jnp.ndarray,  # [B, 1]
    kv_scales=None,
    scale: float | None = None,
    ts: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash decode attention; returns [B, 1, H, D]."""
    B, T, H, D = q.shape
    assert T == 1, "pallas decode kernel handles one query token per row"
    Hkv = k_cache.shape[1]
    G = H // Hkv
    if scale is None:
        scale = D**-0.5
    qg = q[:, 0].reshape(B, Hkv, G, D)
    ks, vs = (kv_scales if kv_scales is not None else (None, None))
    out = _attn_call(qg, k_cache, v_cache, q_positions[:, 0], ks, vs,
                     float(scale), ts, interpret)
    return out.reshape(B, 1, H, D)
