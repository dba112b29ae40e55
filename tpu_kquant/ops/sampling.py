"""Token samplers (greedy / temperature / top-k / top-p), jit-friendly.

The reference's llama-bench path is greedy single-stream (SURVEY.md 3.5);
serving needs the standard sampler stack, implemented with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy(logits: jnp.ndarray) -> jnp.ndarray:
    """logits [B, V] -> tokens [B]."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def apply_penalties(
    logits: jnp.ndarray,  # [B, V] f32
    token_counts: jnp.ndarray,  # [B, V] int32: occurrences in the context
    repeat_penalty: float = 1.0,
    presence_penalty: float = 0.0,
    frequency_penalty: float = 0.0,
) -> jnp.ndarray:
    """llama.cpp's penalties sampler: seen tokens' logits are divided by
    repeat_penalty when positive / multiplied when negative, then shifted by
    presence and count-proportional frequency penalties."""
    seen = token_counts > 0
    if repeat_penalty != 1.0:
        penalized = jnp.where(
            logits > 0, logits / repeat_penalty, logits * repeat_penalty
        )
        logits = jnp.where(seen, penalized, logits)
    if presence_penalty != 0.0 or frequency_penalty != 0.0:
        logits = logits - presence_penalty * seen.astype(logits.dtype)
        logits = logits - frequency_penalty * token_counts.astype(logits.dtype)
    return logits


def sample(
    logits: jnp.ndarray,  # [B, V] f32
    key: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
) -> jnp.ndarray:
    """Temperature -> top-k -> top-p (nucleus) -> min-p -> categorical."""
    if temperature <= 0.0:
        return greedy(logits)
    logits = logits / temperature
    if min_p > 0.0:
        # drop tokens whose prob < min_p * max prob (llama.cpp min_p sampler;
        # in logit space: logit < max_logit + log(min_p))
        cutoff = jnp.max(logits, axis=-1, keepdims=True) + jnp.log(min_p)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative mass >= top_p
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)  # [B]
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
