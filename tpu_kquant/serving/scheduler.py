"""Continuous-batching scheduler — the serving loop that replaces the
reference's single-stream llama-bench decode (SURVEY.md 2.2 "speculative /
multi-stream decode: NO" row; the north-star requires continuous batching).

Design: a fixed pool of B batch slots over one shared KV cache. Each tick:
  1. admit queued requests into free slots via the engine's slot-prefill
     primitive; their last-position logits land in a device-side pending
     buffer (no host fetch — admission does not block the stream on a
     logits round-trip),
  2. ONE fused tick dispatch: batched decode step for every slot + the full
     sampler chain, on device. Freshly admitted rows sample from their
     pending prefill logits instead of the decode output (their decode this
     tick is a dummy whose K/V write is overwritten by the real decode at
     the same position next tick — the same argument that makes padded
     prefill safe, see runtime.engine; inactive slots idle at pos 0
     likewise). Sampling uses PER-ROW params (temp/top-k/top-p/min-p,
     repeat/presence/frequency penalties over per-row sliding windows) and
     PER-REQUEST RNG keys (request.seed; outputs don't depend on batch
     composition),
  3. fetch the [B] sampled ints (the tick's only host sync), emit, retire.

Static shapes throughout: the tick executable never recompiles as requests
come and go.
"""

from __future__ import annotations

import dataclasses
import itertools
from collections import deque
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tpu_kquant.ops.sampling import (
    apply_penalties_rows,
    sample_rows,
    update_penalty_state_rows,
)
from tpu_kquant.runtime.engine import InferenceEngine


@dataclasses.dataclass
class Request:
    prompt: list[int]
    max_new_tokens: int = 64
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    min_p: float = 0.0
    repeat_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    penalty_last_n: int = 64
    eos_id: int | None = None
    seed: int | None = None  # per-request RNG; None -> scheduler seed + rid
    # filled by the scheduler
    rid: int = -1
    output: list[int] = dataclasses.field(default_factory=list)
    done: bool = False


@dataclasses.dataclass
class _Slot:
    req: Request | None = None
    pos: int = 0  # next decode position
    next_token: int = 0
    steps: int = 0  # sampler-step counter (drives per-request key fold_in)


class ContinuousBatcher:
    PENALTY_WINDOW_CAP = 128  # static ring size; per-row last_n <= cap

    def __init__(self, engine: InferenceEngine, seed: int = 0):
        self.engine = engine
        self.B = B = engine.max_batch
        self.cache = engine.new_cache(B)
        self.slots = [_Slot() for _ in range(B)]
        self.queue: deque[Request] = deque()
        self.finished: list[Request] = []
        self._rid = itertools.count()
        self._seed = seed
        V = engine.cfg.vocab_size
        W = self.PENALTY_WINDOW_CAP
        # host-side per-slot sampler params (tiny [B] arrays, re-sent per tick)
        self._temps = np.zeros(B, np.float32)
        self._top_ks = np.zeros(B, np.int32)
        self._top_ps = np.ones(B, np.float32)
        self._min_ps = np.zeros(B, np.float32)
        self._rps = np.ones(B, np.float32)
        self._pps = np.zeros(B, np.float32)
        self._fps = np.zeros(B, np.float32)
        self._last_ns = np.zeros(B, np.int32)
        self._base_keys = np.zeros((B, 2), np.uint32)
        # device-side penalty state (counts/window/widx/nfill), reset per-row
        # at admission
        self._pstate = (
            jnp.zeros((B, V), jnp.int32),
            jnp.zeros((B, W), jnp.int32),
            jnp.zeros(B, jnp.int32),
            jnp.zeros(B, jnp.int32),
        )

        self._pending_logits = jnp.zeros((B, V), jnp.float32)

        from functools import partial as _partial

        @_partial(jax.jit, donate_argnums=(3,))
        def _tick_fn(params, toks, poss, cache, pending, fresh, base_keys,
                     steps, temps, top_ks, top_ps, min_ps, rps, pps, fps,
                     last_ns, pstate):
            """Fused serving tick: decode + logits merge + sampler chain in
            ONE dispatch (host loop pays a single round-trip per tick)."""
            logits, cache = engine._step(
                params, toks[:, None], poss[:, None], cache, True
            )
            l = jnp.where(fresh[:, None], pending,
                          logits[:, 0, :].astype(jnp.float32))
            l = apply_penalties_rows(l, pstate[0], rps, pps, fps)
            keys = jax.vmap(jax.random.fold_in)(base_keys, steps)
            tok = sample_rows(l, keys, temps, top_ks, top_ps, min_ps)
            pstate = update_penalty_state_rows(pstate, tok, last_ns)
            return tok, cache, pstate

        self._tick_fn = _tick_fn

        @jax.jit
        def _reset_pstate_row(pstate, b, counts, window, widx, nfill):
            c, w, i, n = pstate
            return (c.at[b].set(counts), w.at[b].set(window),
                    i.at[b].set(widx), n.at[b].set(nfill))

        self._reset_pstate_row = _reset_pstate_row

        # observability (reference analog: llama-bench t/s tables + timers)
        self.stats = {
            "steps": 0, "prefills": 0, "tokens_out": 0, "tokens_in": 0,
            "wall_s": 0.0, "batch_occupancy_sum": 0,
        }

    def report(self) -> dict:
        s = dict(self.stats)
        s["decode_tok_s"] = s["tokens_out"] / s["wall_s"] if s["wall_s"] else 0.0
        s["avg_batch_occupancy"] = (
            s["batch_occupancy_sum"] / s["steps"] if s["steps"] else 0.0
        )
        return s

    # -- public API ------------------------------------------------------------
    def submit(self, req: Request) -> int:
        req.rid = next(self._rid)
        if req.penalty_last_n > self.PENALTY_WINDOW_CAP:
            req.penalty_last_n = self.PENALTY_WINDOW_CAP
        self.queue.append(req)
        return req.rid

    @property
    def active(self) -> int:
        return sum(s.req is not None for s in self.slots)

    def has_work(self) -> bool:
        return self.active > 0 or len(self.queue) > 0

    def run(self, on_token: Callable[[Request, int], None] | None = None) -> list[Request]:
        """Drain all submitted requests; returns them in completion order."""
        while self.has_work():
            self.step(on_token)
        out, self.finished = self.finished, []
        return out

    # -- one scheduler tick ----------------------------------------------------
    def step(self, on_token=None) -> None:
        import time as _time

        t_start = _time.time()
        # 1. admit queued requests into free slots (device-side pending
        # logits; no host round-trip per admission)
        fresh = np.zeros(self.B, bool)
        for b, slot in enumerate(self.slots):
            if slot.req is None and self.queue:
                req = self.queue.popleft()
                row_logits, self.cache = self.engine.prefill_slot(
                    req.prompt, self.cache, b
                )
                self._pending_logits = self._pending_logits.at[b].set(
                    row_logits.astype(jnp.float32)
                )
                self.stats["prefills"] += 1
                self.stats["tokens_in"] += len(req.prompt)
                slot.req = req
                slot.pos = len(req.prompt)
                slot.steps = 0
                self._set_slot_params(b, req)
                fresh[b] = True
        if self.active == 0:
            return

        # 2. ONE fused decode+sample dispatch; fresh rows' dummy decode at
        # slot.pos is overwritten by the real decode there next tick
        toks = np.zeros(self.B, np.int32)
        poss = np.zeros(self.B, np.int32)
        for b, slot in enumerate(self.slots):
            if slot.req is not None:
                toks[b] = slot.next_token
                poss[b] = slot.pos
        steps = np.array([s.steps for s in self.slots], np.uint32)
        tok_dev, self.cache, self._pstate = self._tick_fn(
            self.engine.params, jnp.asarray(toks), jnp.asarray(poss),
            self.cache, self._pending_logits, jnp.asarray(fresh),
            jnp.asarray(self._base_keys), jnp.asarray(steps),
            jnp.asarray(self._temps), jnp.asarray(self._top_ks),
            jnp.asarray(self._top_ps), jnp.asarray(self._min_ps),
            jnp.asarray(self._rps), jnp.asarray(self._pps),
            jnp.asarray(self._fps), jnp.asarray(self._last_ns), self._pstate,
        )
        sampled = np.asarray(tok_dev)  # the tick's only host sync

        # 3. emit / retire
        for b, slot in enumerate(self.slots):
            req = slot.req
            if req is None:
                continue
            if not fresh[b]:
                slot.pos += 1  # fresh rows' first real decode is next tick
            slot.steps += 1
            tok = int(sampled[b])
            slot.next_token = tok
            self._emit(req, tok, on_token)
            if req.done or slot.pos + 1 >= self.engine.max_seq:
                req.done = True
                self._retire(b)
        self.stats["steps"] += 1
        self.stats["batch_occupancy_sum"] += sum(
            s.req is not None for s in self.slots
        )
        self.stats["wall_s"] += _time.time() - t_start

    # -- helpers ---------------------------------------------------------------
    def _set_slot_params(self, b: int, req: Request) -> None:
        self._temps[b] = req.temperature
        self._top_ks[b] = req.top_k
        self._top_ps[b] = req.top_p
        self._min_ps[b] = req.min_p
        self._rps[b] = req.repeat_penalty
        self._pps[b] = req.presence_penalty
        self._fps[b] = req.frequency_penalty
        uses_pen = (
            req.repeat_penalty != 1.0
            or req.presence_penalty != 0.0
            or req.frequency_penalty != 0.0
        ) and req.penalty_last_n > 0
        last_n = req.penalty_last_n if uses_pen else 0
        self._last_ns[b] = last_n
        seed = req.seed if req.seed is not None else self._seed + 7919 * req.rid
        self._base_keys[b] = np.asarray(jax.random.PRNGKey(seed))
        # penalty window primed from the prompt tail (llama.cpp semantics)
        W = self.PENALTY_WINDOW_CAP
        counts = np.zeros(self.engine.cfg.vocab_size, np.int32)
        window = np.zeros(W, np.int32)
        widx = nfill = 0
        if last_n > 0:
            tail = req.prompt[-last_n:]
            for t in tail:
                counts[t] += 1
            window[: len(tail)] = tail
            widx = len(tail) % last_n
            nfill = len(tail)
        self._pstate = self._reset_pstate_row(
            self._pstate, jnp.int32(b), jnp.asarray(counts),
            jnp.asarray(window), jnp.int32(widx), jnp.int32(nfill),
        )

    def _emit(self, req: Request, tok: int, on_token):
        self.stats["tokens_out"] += 1
        req.output.append(tok)
        if on_token:
            on_token(req, tok)
        if (req.eos_id is not None and tok == req.eos_id) or len(req.output) >= req.max_new_tokens:
            req.done = True

    def _retire(self, b: int):
        req = self.slots[b].req
        self.slots[b] = _Slot()
        if req is not None:
            self.finished.append(req)
