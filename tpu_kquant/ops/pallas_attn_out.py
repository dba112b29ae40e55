"""Fused attention-output Pallas megakernel: flash decode attention ->
quantized o_proj matmul -> residual add, in ONE kernel launch.

Why: after the attention-input and FFN megakernels, the remaining per-layer
fixed costs on the decode path were the attention region itself — the XLA
attention sub-graph (QK^T, mask, softmax, PV) plus the o_proj qmatmul and the
residual add, ~6 dispatches per layer. The reference pays the analogous cost
as per-node ggml dispatch of exactly these ops (SURVEY.md 3.3:
ggml_vec_dot_f16 KQ, soft_max_f32, V-gather, mul_mat(Ow·attn),
add_non_quantized). Here they collapse into one pallas_call whose grid
pipelines the Wo weight stream with the flash-attention compute:

  grid (hp, hi, b, s):   hp = kv-head PAIR, hi = which head of the pair,
                         b = batch row, s = KV tile
    online-softmax flash update for head (hi*Hkv/2 + hp), row b, tile s
    at s == nS-1: normalized head output parked in VMEM scratch
    at pair end (hi==1, b==B-1, s==nS-1): o_proj chunk — the pair's G*D-row
      slice of Wo is dequantized in-register and contracted with the parked
      attention outputs, accumulating into the [B, dim] output accumulator
    at grid end: residual add, single [B, dim] store

Head PAIRING is what lets folded-q4 Wo stream exactly once: packed byte
(k, n) of a folded q4 tensor holds element k (lo nibble) and k + K/2 (hi
nibble), so the Wo rows of kv head hp and of kv head hp + Hkv/2 live in the
SAME packed-row range [hp*C, (hp+1)*C), C = G*D. One fetch serves both
halves of the pair. Flat kinds (q6w/q8) fetch two disjoint row ranges
instead — also exactly once.

The KV cache is read in its native heads-major layout [B, Hkv, S, D]
(runtime.kv_cache.KVCache): (1, 1, TS, D) tiles stream straight from HBM
with no transpose. INT8 KV: K scales fold into logit columns post-matmul,
V scales into the softmax weights post-denominator (ops.pallas_attention
semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_kquant.quant.qtensor import QTensor
from tpu_kquant.quant.repack import GROUP_SIZE

_NEG_INF = -1e30
_FLAT_KINDS = ("q6w", "q8")
_KINDS = ("q4",) + _FLAT_KINDS


def attn_out_supported(wo: QTensor, H: int, Hkv: int, D: int, rows: int,
                       S: int) -> bool:
    if wo.layout != "kmajor" or wo.kind not in _KINDS:
        return False
    dim, K = int(wo.shape[0]), int(wo.shape[-1])
    if K != H * D or Hkv % 2 or H % Hkv:
        return False
    if rows > 16 or D % 64 or S % 64 or dim % 128:
        return False
    C = (H // Hkv) * D
    if C % GROUP_SIZE[wo.kind] or C % 8:
        return False
    # VMEM: the resident Wo chunk(s), double-buffered by Mosaic
    chunk_bytes = C * dim * (1 if wo.kind == "q4" else 2)
    return chunk_bytes <= 6 * 1024 * 1024


def attn_out_enabled(impl: str, wo: QTensor, H: int, Hkv: int, D: int,
                     rows: int, S: int) -> bool:
    """Dispatch gate for models.llama (decode shapes on TPU only)."""
    import os

    # OPT-IN (default off): at decode-shape S the kernel's KV-tile grid steps
    # are too small to amortize per-step fixed cost, and the pair-end Wo
    # dequant bursts unpipelined — measured 715 -> 514 t/s tg128 on
    # TinyLlama vs the XLA attention + fused_oproj_ffn composition, which is
    # the default path. Kept for long-context / large-batch experiments.
    if os.environ.get("TKQ_FUSE_ATTN_OUT", "0") != "1":
        return False
    if impl not in ("auto", "pallas", "int8"):
        return False
    if not attn_out_supported(wo, H, Hkv, D, rows, S):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _decode_sm(sm_block):
    """Packed bf16 (scale, min) pairs in an f32 container -> (s, m) f32."""
    bits = jax.lax.bitcast_convert_type(sm_block, jnp.int32)
    s = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
    m = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
    return s, m


def _attn_out_kernel(kind, has_sm, has_mins, quantized, B, G, D, TS, nS, HP,
                     scale, *refs):
    it = iter(refs)
    qpos_ref = next(it)
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    ks_ref = next(it) if quantized else None
    vs_ref = next(it) if quantized else None
    x_ref = next(it)
    if kind == "q4":
        w_qs = (next(it),)
        w_s = (next(it), next(it))
        w_m = (next(it), next(it)) if has_mins else None
    else:
        w_qs = (next(it), next(it))
        w_s = (next(it), next(it))
        w_m = None
    o_ref = next(it)
    att_scr = next(it)  # [2*B*SG, D] bf16 parked head outputs (SG-row slabs)
    acc = next(it)      # [G, D] f32 flash accumulator
    m_scr = next(it)    # [G, 1]
    l_scr = next(it)    # [G, 1]
    acc_o = next(it)    # [B, dim] f32 o_proj accumulator

    # slab stride: G rounded up to the 8-sublane store alignment Mosaic
    # requires of dynamic scratch indices ((hi*B + b) * SG is provably
    # a multiple of 8 because SG is)
    SG = max(8, -(-G // 8) * 8)

    hp = pl.program_id(0)
    hi = pl.program_id(1)
    b = pl.program_id(2)
    s_idx = pl.program_id(3)

    @pl.when((hp == 0) & (hi == 0) & (b == 0) & (s_idx == 0))
    def _():
        acc_o[:] = jnp.zeros_like(acc_o)

    @pl.when(s_idx == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    q_pos = qpos_ref[0, 0]
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
            s = s * ks_ref[0, 0]  # int8 K: per-token scale on logit columns
        kv_idx = tile_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_idx <= q_pos, s, _NEG_INF)

        m_prev = m_scr[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if vs_ref is not None:
            # int8 V: fold per-token scales in AFTER the denominator update
            p = p * vs_ref[0, 0]
        acc[:] = acc[:] * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), vf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(s_idx == nS - 1)
    def _():
        # normalized head output -> parked slab (hi*B + b) of att_scr
        # (bf16: bit-matches the unfused path, where attention_decode returns
        # the q dtype before the o_proj matmul)
        o = (acc[:] / l_scr[:]).astype(jnp.bfloat16)  # [G, D]
        if SG > G:
            o = jnp.concatenate(
                [o, jnp.zeros((SG - G, D), jnp.bfloat16)], axis=0)
        att_scr[pl.ds((hi * B + b) * SG, SG)] = o

    @pl.when((hi == 1) & (b == B - 1) & (s_idx == nS - 1))
    def _():
        # o_proj chunk for the completed pair: heads hp (lo) and hp+HP (hi).
        # All indices here are static (b_, g are Python ints), so the reads
        # from att_scr need no alignment proof.
        gsz = GROUP_SIZE[kind]
        contrib = None
        for half in (0, 1):
            if kind == "q4":
                q_all = w_qs[0][:].astype(jnp.int32)
                q = ((q_all >> 4) if half else (q_all & 0xF)).astype(jnp.float32)
                if has_sm:
                    sc, mn = _decode_sm(w_s[half][:])
                else:
                    sc = w_s[half][:].astype(jnp.float32)
                    mn = w_m[half][:].astype(jnp.float32) if w_m else None
                w = q * jnp.repeat(sc, gsz, axis=0)
                if mn is not None:
                    w = w - jnp.repeat(mn, gsz, axis=0)
            else:
                w = (w_qs[half][:].astype(jnp.float32)
                     * jnp.repeat(w_s[half][:].astype(jnp.float32), gsz,
                                  axis=0))
            wb = w.astype(jnp.bfloat16)  # [C, dim]
            rows = []
            for b_ in range(B):
                slab = att_scr[(half * B + b_) * SG : (half * B + b_) * SG + G]
                row = None
                for g in range(G):
                    d = jax.lax.dot_general(
                        slab[g : g + 1], wb[g * D : (g + 1) * D],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    row = d if row is None else row + d
                rows.append(row)
            half_contrib = rows[0] if B == 1 else jnp.concatenate(rows, axis=0)
            contrib = half_contrib if contrib is None else contrib + half_contrib
        acc_o[:] = acc_o[:] + contrib

    @pl.when((hp == HP - 1) & (hi == 1) & (b == B - 1) & (s_idx == nS - 1))
    def _():
        # residual: round the o_proj result to bf16 first (matches the
        # unfused qmatmul output dtype), add in f32, round once
        h = acc_o[:].astype(jnp.bfloat16).astype(jnp.float32)
        o_ref[:] = (x_ref[:].astype(jnp.float32) + h).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kind", "keys", "scale", "ts", "interpret"),
)
def _attn_out_call(x2d, q, k, v, q_pos, k_scale, v_scale, wo_arrays, kind,
                   keys, scale, ts, interpret):
    """x2d: [B, dim]; q: [B, Hkv, G, D]; k/v: [B, Hkv, S, D] heads-major."""
    B, Hkv, G, D = q.shape
    S = k.shape[2]
    dim = x2d.shape[-1]
    C = G * D
    HP = Hkv // 2
    TS = ts
    while S % TS != 0:
        TS //= 2
    nS = S // TS
    quantized = k_scale is not None
    wo = dict(zip(keys, wo_arrays))
    has_sm = "sm" in wo
    has_mins = "mins" in wo
    gsz = GROUP_SIZE[kind]
    sg = C // gsz  # scale rows per chunk

    def h_of(hp, hi):
        return hi * HP + hp

    qpos_spec = pl.BlockSpec((1, 1), lambda hp, hi, b, s: (b, 0),
                             memory_space=pltpu.SMEM)
    q_spec = pl.BlockSpec((1, 1, G, D),
                          lambda hp, hi, b, s: (b, h_of(hp, hi), 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, TS, D),
                           lambda hp, hi, b, s: (b, h_of(hp, hi), s, 0),
                           memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((B, dim), lambda hp, hi, b, s: (0, 0),
                          memory_space=pltpu.VMEM)

    in_specs = [qpos_spec, q_spec, kv_spec, kv_spec]
    inputs = [q_pos[:, None].astype(jnp.int32), q, k, v]
    if quantized:
        sspec = pl.BlockSpec((1, 1, 1, TS),
                             lambda hp, hi, b, s: (b, h_of(hp, hi), 0, s),
                             memory_space=pltpu.VMEM)
        in_specs += [sspec, sspec]
        inputs += [k_scale[:, :, None, :], v_scale[:, :, None, :]]
    in_specs.append(x_spec)
    inputs.append(x2d)

    # Wo chunk blocks: pair hp covers elements of kv heads hp (lo) and
    # hp + HP (hi). Folded q4: ONE packed-row block serves both nibbles;
    # flat kinds: two disjoint row blocks.
    lo_s = pl.BlockSpec((sg, dim), lambda hp, hi, b, s: (hp, 0),
                        memory_space=pltpu.VMEM)
    hi_s = pl.BlockSpec((sg, dim), lambda hp, hi, b, s: (HP + hp, 0),
                        memory_space=pltpu.VMEM)
    s_key = "sm" if has_sm else "scales"
    if kind == "q4":
        in_specs.append(pl.BlockSpec((C, dim), lambda hp, hi, b, s: (hp, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(wo["qs"])
        in_specs += [lo_s, hi_s]
        inputs += [wo[s_key], wo[s_key]]
        if has_mins:
            in_specs += [lo_s, hi_s]
            inputs += [wo["mins"], wo["mins"]]
    else:
        lo_q = pl.BlockSpec((C, dim), lambda hp, hi, b, s: (hp, 0),
                            memory_space=pltpu.VMEM)
        hi_q = pl.BlockSpec((C, dim), lambda hp, hi, b, s: (HP + hp, 0),
                            memory_space=pltpu.VMEM)
        in_specs += [lo_q, hi_q, lo_s, hi_s]
        inputs += [wo["qs"], wo["qs"], wo[s_key], wo[s_key]]

    kernel = functools.partial(_attn_out_kernel, kind, has_sm, has_mins,
                               quantized, B, G, D, TS, nS, HP, scale)
    kv_bytes = 2 * B * Hkv * S * D * k.dtype.itemsize
    wo_bytes = sum(v.size * v.dtype.itemsize for v in wo.values())
    out = pl.pallas_call(
        kernel,
        grid=(HP, 2, B, nS),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, dim), lambda hp, hi, b, s: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, dim), x2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * B * max(8, -(-G // 8) * 8), D), jnp.bfloat16),
            pltpu.VMEM((G, D), jnp.float32),
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((B, dim), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * G * D * S + 2 * B * Hkv * C * dim,
            bytes_accessed=kv_bytes + wo_bytes + 4 * B * dim,
            transcendentals=B * Hkv * G * S,
        ),
        interpret=interpret,
    )(*inputs)
    return out


def fused_attn_out(
    x: jnp.ndarray,  # [B, 1, dim] residual stream
    q: jnp.ndarray,  # [B, 1, H, D] roped queries
    k_cache: jnp.ndarray,  # [B, Hkv, S, D] heads-major (bf16 or int8)
    v_cache: jnp.ndarray,
    q_positions: jnp.ndarray,  # [B, 1]
    kv_scales,  # (ks, vs) [B, Hkv, S] or None
    wo: QTensor,  # [dim, H*D] kmajor
    scale: float | None = None,
    ts: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + o_proj(flash_attention(q, KV)); returns [B, 1, dim]."""
    B, T, H, D = q.shape
    assert T == 1, "fused attention-out kernel handles decode (T=1) only"
    Hkv = k_cache.shape[1]
    G = H // Hkv
    if scale is None:
        scale = D**-0.5
    qg = q[:, 0].reshape(B, Hkv, G, D)
    ks, vs = kv_scales if kv_scales is not None else (None, None)
    keys = tuple(sorted(wo.arrays))
    out = _attn_out_call(
        x.reshape(B, -1), qg, k_cache, v_cache, q_positions[:, 0], ks, vs,
        tuple(wo.arrays[k] for k in keys), wo.kind, keys, float(scale),
        ts, interpret,
    )
    return out.reshape(B, 1, -1)
