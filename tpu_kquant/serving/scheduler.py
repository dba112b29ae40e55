"""Continuous-batching scheduler — the serving loop that replaces the
reference's single-stream llama-bench decode (SURVEY.md 2.2 "speculative /
multi-stream decode: NO" row; the north-star requires continuous batching).

Design: a fixed pool of B batch slots over one shared KV cache. Each step:
  1. admit queued requests into free slots via the engine's slot-prefill
     primitive (other slots' cache state untouched),
  2. one batched decode step for ALL slots (inactive slots run a dummy token;
     their cache rows are dead and any garbage they write is overwritten
     before it can ever be attended — the same argument that makes padded
     prefill safe, see runtime.engine),
  3. sample, detect eos / length stop, retire finished requests.

Static shapes throughout: the decode executable never recompiles as requests
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

from tpu_kquant.ops.sampling import greedy, sample
from tpu_kquant.runtime.engine import InferenceEngine


@dataclasses.dataclass
class Request:
    prompt: list[int]
    max_new_tokens: int = 64
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    eos_id: int | None = None
    # filled by the scheduler
    rid: int = -1
    output: list[int] = dataclasses.field(default_factory=list)
    done: bool = False


@dataclasses.dataclass
class _Slot:
    req: Request | None = None
    pos: int = 0  # next decode position
    next_token: int = 0


class ContinuousBatcher:
    def __init__(self, engine: InferenceEngine, seed: int = 0):
        self.engine = engine
        self.B = engine.max_batch
        self.cache = engine.new_cache(self.B)
        self.slots = [_Slot() for _ in range(self.B)]
        self.queue: deque[Request] = deque()
        self.finished: list[Request] = []
        self._rid = itertools.count()
        self._key = jax.random.PRNGKey(seed)
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
        # 1. admit new requests into free slots
        for b, slot in enumerate(self.slots):
            if slot.req is None and self.queue:
                req = self.queue.popleft()
                logits, self.cache = self.engine.prefill_slot(
                    req.prompt, self.cache, b
                )
                self.stats["prefills"] += 1
                self.stats["tokens_in"] += len(req.prompt)
                tok = int(np.asarray(self._sample(logits[None, :], req)[0]))
                slot.req = req
                slot.pos = len(req.prompt)
                slot.next_token = tok
                self._emit(req, tok, on_token)
                if req.done:
                    self._retire(b)
        if self.active == 0:
            return

        # 2. batched decode step (dummy token/pos 0 for inactive slots)
        toks = np.zeros(self.B, np.int32)
        poss = np.zeros(self.B, np.int32)
        for b, slot in enumerate(self.slots):
            if slot.req is not None:
                toks[b] = slot.next_token
                poss[b] = slot.pos
        logits, self.cache = self.engine.decode_step(
            jnp.asarray(toks), jnp.asarray(poss), self.cache
        )

        # 3. sample / retire
        sampled = {}
        by_cfg: dict[tuple, list[int]] = {}
        for b, slot in enumerate(self.slots):
            if slot.req is not None:
                cfgk = (slot.req.temperature, slot.req.top_k, slot.req.top_p)
                by_cfg.setdefault(cfgk, []).append(b)
        for (_t, _k, _p), rows in by_cfg.items():
            sub = logits[np.asarray(rows)]
            if _t <= 0.0:
                out = greedy(sub)
            else:
                self._key, sk = jax.random.split(self._key)
                out = sample(sub, sk, _t, _k, _p)
            for r, t in zip(rows, np.asarray(out)):
                sampled[r] = int(t)

        for b, slot in enumerate(self.slots):
            req = slot.req
            if req is None:
                continue
            slot.pos += 1
            tok = sampled[b]
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
    def _sample(self, logits, req: Request):
        if req.temperature <= 0.0:
            return greedy(logits)
        self._key, sk = jax.random.split(self._key)
        return sample(logits, sk, req.temperature, req.top_k, req.top_p)

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
