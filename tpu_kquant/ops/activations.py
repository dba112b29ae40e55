"""Gated activations (reference: ggml_vec_swiglu_f32 / ggml_v_silu, SURVEY.md 3.3)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swiglu(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """silu(gate) * up, silu computed in f32 for parity with the f32 CPU op."""
    g = gate.astype(jnp.float32)
    return (jax.nn.silu(g) * up.astype(jnp.float32)).astype(gate.dtype)


def geglu(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    g = gate.astype(jnp.float32)
    return (jax.nn.gelu(g, approximate=False) * up.astype(jnp.float32)).astype(gate.dtype)
