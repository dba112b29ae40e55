"""KV cache: contiguous per-sequence slots, bf16 or INT8 with per-token scales.

Replaces the reference's llama_kv_cache (SURVEY.md 2.1: slot allocation,
set_rows K/V append, mask construction; evidence out.folded:52-55,250). The
ggml ``set_rows`` append becomes a vmapped dynamic-update-slice; the kq_mask
is never materialized — attention computes it from positions (ops.attention).

INT8 mode is the north-star KV compression (BASELINE.json): values are stored
as int8 with one f32 scale per (token, kv-head), chosen as amax/127 at append
time; attention dequantizes on the fly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    k: jnp.ndarray  # [L, B, S, Hkv, D] bf16, or int8 when quantized
    v: jnp.ndarray
    k_scale: jnp.ndarray | None  # [L, B, S, Hkv] f32 (int8 mode only)
    v_scale: jnp.ndarray | None

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- construction ----------------------------------------------------------
    @staticmethod
    def create(
        n_layers: int,
        batch: int,
        max_seq: int,
        n_kv_heads: int,
        head_dim: int,
        dtype=jnp.bfloat16,
        quantized: bool = False,
    ) -> "KVCache":
        shape = (n_layers, batch, max_seq, n_kv_heads, head_dim)
        if quantized:
            return KVCache(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                k_scale=jnp.zeros(shape[:-1], jnp.float32),
                v_scale=jnp.zeros(shape[:-1], jnp.float32),
            )
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), None, None)

    @property
    def quantized(self) -> bool:
        return self.k.dtype == jnp.int8

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]

    # -- update ----------------------------------------------------------------
    def append(
        self,
        layer_idx: int,
        k_new: jnp.ndarray,  # [B, T, Hkv, D]
        v_new: jnp.ndarray,
        positions: jnp.ndarray,  # [B, T] absolute, contiguous per row
    ) -> "KVCache":
        start = positions[:, 0]

        def upd(cache_l, val):  # vmap over batch
            return jax.vmap(
                lambda c, u, s: jax.lax.dynamic_update_slice(c, u, (s, 0, 0))
            )(cache_l, val, start)

        if self.quantized:
            def quant(x):
                scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
                safe = jnp.where(scale > 0, scale, 1.0)
                q = jnp.round(x.astype(jnp.float32) / safe[..., None])
                return q.astype(jnp.int8), scale.astype(jnp.float32)

            kq, ks = quant(k_new)
            vq, vs = quant(v_new)
            def upd_s(cache_l, val):
                return jax.vmap(
                    lambda c, u, s: jax.lax.dynamic_update_slice(c, u, (s, 0))
                )(cache_l, val, start)
            return KVCache(
                k=self.k.at[layer_idx].set(upd(self.k[layer_idx], kq)),
                v=self.v.at[layer_idx].set(upd(self.v[layer_idx], vq)),
                k_scale=self.k_scale.at[layer_idx].set(upd_s(self.k_scale[layer_idx], ks)),
                v_scale=self.v_scale.at[layer_idx].set(upd_s(self.v_scale[layer_idx], vs)),
            )
        dt = self.k.dtype
        return KVCache(
            k=self.k.at[layer_idx].set(upd(self.k[layer_idx], k_new.astype(dt))),
            v=self.v.at[layer_idx].set(upd(self.v[layer_idx], v_new.astype(dt))),
            k_scale=None,
            v_scale=None,
        )

    def layer_view(self, layer_idx: int):
        """(k [B,S,Hkv,D], v, scales-tuple-or-None) for attention."""
        if self.quantized:
            return (
                self.k[layer_idx],
                self.v[layer_idx],
                (self.k_scale[layer_idx], self.v_scale[layer_idx]),
            )
        return self.k[layer_idx], self.v[layer_idx], None


def slice_batch_row(cache: KVCache, slot) -> KVCache:
    """View of one batch row (slot may be traced): [L, 1, S, Hkv, D]."""
    import jax

    def sl(x):
        return None if x is None else jax.lax.dynamic_slice_in_dim(x, slot, 1, axis=1)

    return KVCache(sl(cache.k), sl(cache.v), sl(cache.k_scale), sl(cache.v_scale))


def set_batch_row(cache: KVCache, row: KVCache, slot) -> KVCache:
    """Write a [L, 1, ...] row cache back into batch position ``slot``."""
    import jax

    def st(x, u):
        return None if x is None else jax.lax.dynamic_update_slice_in_dim(x, u, slot, axis=1)

    return KVCache(
        st(cache.k, row.k),
        st(cache.v, row.v),
        st(cache.k_scale, row.k_scale),
        st(cache.v_scale, row.v_scale),
    )
