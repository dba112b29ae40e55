"""Speculative decoding: a small draft model proposes n_draft tokens, the
target model verifies them in ONE batched forward (the llama.cpp
tools/speculative equivalent, built on the same engine primitives).

Greedy verification semantics: a draft token is accepted only while it equals
the target's own argmax, and the first mismatch is replaced by the target's
argmax — so the output sequence is IDENTICAL to plain greedy decoding of the
target model, regardless of draft quality. Draft quality only changes speed:
each round emits between 1 and n_draft + 1 tokens for one target forward.

TPU shape discipline: every round is two fixed-shape dispatches (a fused
lax.scan draft loop of n_draft steps + one (n_draft + 1)-token verify step),
so both executables compile once. Rejected positions leave garbage K/V in
both caches, which is safe under the engine's slot invariant: the next
round's feed always starts at the first unverified position and re-writes
every rejected slot before any query can attend it (engine.py prefill note).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpu_kquant.runtime.engine import InferenceEngine


def generate_speculative(
    target: InferenceEngine,
    draft: InferenceEngine,
    prompts: list[list[int]],
    max_new_tokens: int = 32,
    n_draft: int = 6,
    eos_id: int | None = None,
) -> tuple[list[list[int]], dict]:
    """Greedy speculative generation. Returns (tokens per row, stats).

    stats: {'rounds': N, 'drafted': N, 'accepted': N} — accepted/drafted is
    the draft acceptance rate; tokens/round = emitted / rounds.
    """
    B = len(prompts)
    t_cache = target.new_cache(B)
    d_cache = draft.new_cache(B)

    t_logits, t_cache, lens = target.prefill(prompts, t_cache)
    _, d_cache, _ = draft.prefill(prompts, d_cache)

    # first token comes from the target's prefill logits (greedy)
    cur = jnp.argmax(t_logits, axis=-1).astype(jnp.int32)  # [B]
    pos = jnp.asarray(lens, jnp.int32)  # position of `cur` per row

    out: list[list[int]] = [[int(c)] for c in np.asarray(cur)]
    done = np.zeros(B, bool)
    if eos_id is not None:
        done |= np.asarray(cur) == eos_id
    stats = {"rounds": 0, "drafted": 0, "accepted": 0}

    cap = min(target.max_seq, draft.max_seq)
    while (
        not done.all()
        and min(len(o) for o in out) < max_new_tokens
        and int(pos.max()) + n_draft + 1 < cap
    ):
        stats["rounds"] += 1
        # 1) draft proposes n_draft greedy tokens from (cur, pos)
        d_toks, d_cache = draft.decode_greedy_jit(cur, pos, d_cache, n_draft)
        # 2) target verifies [cur, d_1..d_n] in one forward; logits[i]
        #    predicts the token at pos + 1 + i
        feed = jnp.concatenate([cur[:, None], d_toks], axis=1)  # [B, n+1]
        positions = pos[:, None] + jnp.arange(n_draft + 1, dtype=jnp.int32)
        v_logits, t_cache = target._step(
            target.params, feed, positions, t_cache, False
        )
        t_pred = np.asarray(jnp.argmax(v_logits, axis=-1))  # [B, n+1]
        d_np = np.asarray(d_toks)

        # 3) per-row longest accepted prefix + target correction/bonus token
        accepted = np.zeros(B, np.int32)
        next_tok = np.zeros(B, np.int32)
        for b in range(B):
            k = 0
            while k < n_draft and t_pred[b, k] == d_np[b, k]:
                k += 1
            accepted[b] = k
            next_tok[b] = t_pred[b, k]
            if not done[b]:
                emitted = [int(x) for x in d_np[b, :k]] + [int(t_pred[b, k])]
                for tok in emitted:
                    out[b].append(tok)
                    if eos_id is not None and tok == eos_id:
                        done[b] = True
                        break
        stats["drafted"] += int(n_draft * B)
        stats["accepted"] += int(accepted.sum())

        # 4) advance: next round decodes from the correction token. Rows
        #    advance by different amounts; garbage K/V beyond each row's new
        #    position is overwritten next round before it is attended.
        pos = pos + jnp.asarray(accepted + 1)
        cur = jnp.asarray(next_tok)

    return [o[:max_new_tokens] for o in out], stats
