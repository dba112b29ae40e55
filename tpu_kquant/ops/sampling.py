"""Token samplers (greedy / temperature / top-k / top-p), jit-friendly.

The reference's llama-bench path is greedy single-stream (SURVEY.md 3.5);
serving needs the standard sampler stack, implemented with static shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Hashable sampler settings — static under jit, so the fused decode loop
    compiles once per sampler configuration (llama.cpp's sampler-chain params:
    temp -> penalties -> min_p -> top_k -> top_p -> dist)."""

    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    min_p: float = 0.0
    repeat_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    penalty_last_n: int = 64

    @property
    def uses_penalties(self) -> bool:
        return (
            self.repeat_penalty != 1.0
            or self.presence_penalty != 0.0
            or self.frequency_penalty != 0.0
        ) and self.penalty_last_n != 0

    @property
    def is_greedy(self) -> bool:
        return self.temperature <= 0.0


def init_penalty_state(
    prompts: list[list[int]], vocab_size: int, last_n: int
):
    """Build on-device penalty state from prompt tails: occurrence counts
    [B, V] over each row's last ``last_n`` tokens, the window ring [B, last_n]
    itself, per-row ring write index [B] and fill count [B]."""
    import numpy as np

    B = len(prompts)
    counts = np.zeros((B, vocab_size), np.int32)
    window = np.zeros((B, last_n), np.int32)
    widx = np.zeros(B, np.int32)
    nfill = np.zeros(B, np.int32)
    for b, p in enumerate(prompts):
        tail = p[-last_n:]
        for t in tail:
            counts[b, t] += 1
        window[b, : len(tail)] = tail
        widx[b] = len(tail) % last_n
        nfill[b] = len(tail)
    return (jnp.asarray(counts), jnp.asarray(window), jnp.asarray(widx),
            jnp.asarray(nfill))


def update_penalty_state(state, tok: jnp.ndarray):
    """Admit newly sampled tokens [B] into the sliding window (jit-safe):
    evict the overwritten slot's token from the counts when the window is
    full, then count + record the new token."""
    counts, window, widx, nfill = state
    B = tok.shape[0]
    last_n = window.shape[1]
    rows = jnp.arange(B)
    old = window[rows, widx]
    evict = (nfill >= last_n).astype(jnp.int32)
    counts = counts.at[rows, old].add(-evict)
    counts = counts.at[rows, tok].add(1)
    window = window.at[rows, widx].set(tok)
    widx = (widx + 1) % last_n
    nfill = jnp.minimum(nfill + 1, last_n)
    return counts, window, widx, nfill


def apply_penalties_rows(
    logits: jnp.ndarray,  # [B, V] f32
    token_counts: jnp.ndarray,  # [B, V] int32
    repeat_penalty: jnp.ndarray,  # [B] f32 (1.0 = off)
    presence_penalty: jnp.ndarray,  # [B] f32
    frequency_penalty: jnp.ndarray,  # [B] f32
) -> jnp.ndarray:
    """apply_penalties with PER-ROW traced penalty values (serving: each
    request carries its own sampler settings). rp=1, pp=fp=0 rows are exact
    no-ops, so heterogeneous batches need no masking."""
    seen = token_counts > 0
    rp = repeat_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(seen, penalized, logits)
    logits = logits - presence_penalty[:, None] * seen.astype(logits.dtype)
    logits = logits - frequency_penalty[:, None] * token_counts.astype(logits.dtype)
    return logits


def sample_rows(
    logits: jnp.ndarray,  # [B, V] f32
    keys: jnp.ndarray,  # [B] stacked PRNG keys (vmap axis)
    temperature: jnp.ndarray,  # [B] f32; <=0 -> greedy for that row
    top_k: jnp.ndarray,  # [B] int32; 0 = off
    top_p: jnp.ndarray,  # [B] f32; 1.0 = off
    min_p: jnp.ndarray,  # [B] f32; 0.0 = off
) -> jnp.ndarray:
    """The full sampler chain with PER-ROW traced parameters and PER-ROW
    keys, one fused dispatch for a heterogeneous serving batch. Mirrors
    ``sample``'s order (temp -> min_p -> top_k -> top_p -> categorical);
    rows with temperature <= 0 take the greedy argmax."""
    V = logits.shape[-1]
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    l = logits / jnp.maximum(temperature, 1e-6)[:, None]
    # min_p
    cutoff = jnp.max(l, axis=-1, keepdims=True) + jnp.log(
        jnp.maximum(min_p, 1e-38)
    )[:, None]
    l = jnp.where((min_p[:, None] > 0.0) & (l < cutoff), -jnp.inf, l)
    # top_k
    desc = jnp.sort(l, axis=-1)[:, ::-1]
    kth = jnp.take_along_axis(
        desc, jnp.clip(top_k[:, None] - 1, 0, V - 1), axis=-1
    )
    l = jnp.where((top_k[:, None] > 0) & (l < kth), -jnp.inf, l)
    # top_p
    desc = jnp.sort(l, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_p[:, None], axis=-1)
    cutp = jnp.take_along_axis(desc, cutoff_idx[:, None], axis=-1)
    l = jnp.where((top_p[:, None] < 1.0) & (l < cutp), -jnp.inf, l)
    sampled = jax.vmap(
        lambda k, lg: jax.random.categorical(k, lg, axis=-1)
    )(keys, l).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy_tok, sampled)


def update_penalty_state_rows(state, tok: jnp.ndarray, last_n: jnp.ndarray):
    """update_penalty_state with PER-ROW traced window lengths [B]
    (serving: each request has its own penalty_last_n; 0 disables — that
    row's counts never admit tokens, so penalties are no-ops)."""
    counts, window, widx, nfill = state
    B = tok.shape[0]
    rows = jnp.arange(B)
    ln = jnp.maximum(last_n, 1)
    on = (last_n > 0).astype(jnp.int32)
    old = window[rows, widx]
    evict = (nfill >= ln).astype(jnp.int32) * on
    counts = counts.at[rows, old].add(-evict)
    counts = counts.at[rows, tok].add(on)
    window = window.at[rows, widx].set(jnp.where(on > 0, tok, old))
    widx = (widx + 1) % ln
    nfill = jnp.minimum(nfill + on, ln)
    return counts, window, widx, nfill


def sample_step(
    logits: jnp.ndarray,  # [B, V] f32
    key: jax.Array,
    sc: SamplerConfig,
    penalty_state=None,
):
    """One full sampler-chain step (jit-safe; sc static). Returns
    (tokens [B], new_key, new_penalty_state)."""
    logits = logits.astype(jnp.float32)
    if sc.uses_penalties:
        logits = apply_penalties(
            logits, penalty_state[0], sc.repeat_penalty,
            sc.presence_penalty, sc.frequency_penalty,
        )
    if sc.is_greedy:
        tok = greedy(logits)
    else:
        key, sub = jax.random.split(key)
        tok = sample(logits, sub, sc.temperature, sc.top_k, sc.top_p, sc.min_p)
    if sc.uses_penalties:
        penalty_state = update_penalty_state(penalty_state, tok)
    return tok, key, penalty_state


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
