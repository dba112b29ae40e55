"""Mixture-of-experts FFN (Mixtral-style), top-k softmax routing.

The reference never runs MoE (SURVEY.md 2.2: expert parallelism absent) but
llama.cpp supports the arch; this provides the capability TPU-natively. The
round-1 implementation computes every expert and masks by routing weight —
dead-simple, jit-static shapes, correct; expert-parallel ragged dispatch over
a mesh axis replaces it for large E (parallel.sharding EP specs).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from tpu_kquant.models.config import ModelConfig
from tpu_kquant.ops.activations import swiglu
from tpu_kquant.ops.qmatmul import qmatmul


def moe_ffn(layer: dict[str, Any], cfg: ModelConfig, h: jnp.ndarray, impl: str = "auto") -> jnp.ndarray:
    """h: [B, T, dim] (already ffn-normed) -> [B, T, dim]."""
    router_logits = qmatmul(h, layer["gate_inp"], impl, out_dtype=jnp.float32)  # [B,T,E]
    E = router_logits.shape[-1]
    top_w, top_idx = jax.lax.top_k(router_logits, cfg.n_experts_used)
    top_w = jax.nn.softmax(top_w, axis=-1)  # normalize over selected experts

    # dense-all-experts with routing-weight mask (weight 0 for unselected)
    gate_w = jnp.zeros_like(router_logits).at[
        jnp.arange(router_logits.shape[0])[:, None, None],
        jnp.arange(router_logits.shape[1])[None, :, None],
        top_idx,
    ].set(top_w)  # [B, T, E]

    out = jnp.zeros(h.shape, jnp.float32)
    for e, exp in enumerate(layer["experts"]):
        g = qmatmul(h, exp["w_gate"], impl)
        u = qmatmul(h, exp["w_up"], impl)
        y = qmatmul(swiglu(g, u), exp["w_down"], impl, out_dtype=jnp.float32)
        out = out + y * gate_w[..., e : e + 1]
    return out.astype(h.dtype)
