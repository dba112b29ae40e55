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
     prefill safe, see runtime.engine; inactive slots idle likewise).
     Sampling uses PER-ROW params (temp/top-k/top-p/min-p,
     repeat/presence/frequency penalties over per-row sliding windows) and
     PER-REQUEST RNG keys (request.seed; outputs don't depend on batch
     composition),
  3. fetch the [B] sampled ints (the tick's only host sync), emit, retire.

Static shapes throughout: the tick executable never recompiles as requests
come and go.

ALL per-slot state (next tokens, positions, sampler params, RNG keys,
penalty rings, pending logits, active/fresh masks) is DEVICE-RESIDENT and
donated through the tick: a steady-state tick transfers ZERO bytes host to
device and fetches 4B bytes back. Measured motivation (r3, tunneled v5e):
the previous host-side design re-sent ~12 small arrays per tick, costing
~220 ms/tick against a ~35 ms ideal (RTT + compute) — B=16 serving
throughput was 70 t/s wall where the decode kernel alone sustains hundreds.
Host-side admission/retirement bookkeeping touches the device only through
small jitted row-setters when a request actually enters or leaves.
"""

from __future__ import annotations

import dataclasses
import itertools
from collections import deque
from functools import partial
from typing import Callable, NamedTuple

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
    pos: int = 0  # next decode position (host shadow for retirement checks)


class _DevState(NamedTuple):
    """Device-resident per-slot serving state (donated through the tick)."""

    toks: jnp.ndarray       # [B] i32 next token per slot
    poss: jnp.ndarray       # [B] i32 next decode position
    fresh: jnp.ndarray      # [B] bool: sample from pending logits this tick
    active: jnp.ndarray     # [B] bool
    steps: jnp.ndarray      # [B] u32 sampler-step counter (key fold_in)
    base_keys: jnp.ndarray  # [B, 2] u32
    temps: jnp.ndarray      # [B] f32
    top_ks: jnp.ndarray     # [B] i32
    top_ps: jnp.ndarray     # [B] f32
    min_ps: jnp.ndarray     # [B] f32
    rps: jnp.ndarray        # [B] f32
    pps: jnp.ndarray        # [B] f32
    fps: jnp.ndarray        # [B] f32
    last_ns: jnp.ndarray    # [B] i32
    pending: jnp.ndarray    # [B, V] f32 pending prefill logits
    counts: jnp.ndarray     # [B, V] i32 penalty counts
    window: jnp.ndarray     # [B, W] i32 penalty token ring
    widx: jnp.ndarray       # [B] i32
    nfill: jnp.ndarray      # [B] i32


class ContinuousBatcher:
    PENALTY_WINDOW_CAP = 128  # static ring size; per-row last_n <= cap
    MAX_CHUNK = 32  # static bound on fused ticks per dispatch (buffer size)

    def __init__(self, engine: InferenceEngine, seed: int = 0, mesh=None):
        """mesh: serve over a jax.sharding.Mesh (BASELINE config #3): the KV
        cache shards batch over 'data' and kv-heads over 'model'
        (parallel.shard_cache), the per-slot device state shards its batch
        axis over 'data', and the engine's params are expected to already
        carry TP shardings (runtime.loader with parallel.make_param_put).
        The tick executable is the same code — GSPMD partitions it."""
        self.engine = engine
        self.B = B = engine.max_batch
        self.cache = engine.new_cache(B)
        if mesh is not None:
            from tpu_kquant.parallel import shard_cache

            self.cache = shard_cache(self.cache, mesh)
        self.slots = [_Slot() for _ in range(B)]
        self.queue: deque[Request] = deque()
        self.finished: list[Request] = []
        self._rid = itertools.count()
        self._seed = seed
        V = engine.cfg.vocab_size
        W = self.PENALTY_WINDOW_CAP
        self.state = _DevState(
            toks=jnp.zeros(B, jnp.int32),
            poss=jnp.zeros(B, jnp.int32),
            fresh=jnp.zeros(B, bool),
            active=jnp.zeros(B, bool),
            steps=jnp.zeros(B, jnp.uint32),
            base_keys=jnp.zeros((B, 2), jnp.uint32),
            temps=jnp.zeros(B, jnp.float32),
            top_ks=jnp.zeros(B, jnp.int32),
            top_ps=jnp.ones(B, jnp.float32),
            min_ps=jnp.zeros(B, jnp.float32),
            rps=jnp.ones(B, jnp.float32),
            pps=jnp.zeros(B, jnp.float32),
            fps=jnp.zeros(B, jnp.float32),
            last_ns=jnp.zeros(B, jnp.int32),
            pending=jnp.zeros((B, V), jnp.float32),
            counts=jnp.zeros((B, V), jnp.int32),
            window=jnp.zeros((B, W), jnp.int32),
            widx=jnp.zeros(B, jnp.int32),
            nfill=jnp.zeros(B, jnp.int32),
        )
        if (mesh is not None and mesh.shape.get("data", 1) > 1
                and B % mesh.shape["data"] == 0):
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            self.state = self.state._replace(**{
                f: jax.device_put(
                    v, NamedSharding(mesh, P("data", *[None] * (v.ndim - 1))))
                for f, v in self.state._asdict().items()})

        recurrent = engine.cfg.is_recurrent

        def _tick_body(params, cache, st: _DevState, sampling: bool):
            """One serving tick: decode + logits merge + sampler chain.

            sampling=False is the all-greedy fast path: the r4 serving-tick
            trace (artifacts/perf/trace_decode_r4_serving_ops.json) measured
            sample_rows' two full-vocab sorts at ~470 us/tick at B=8 even
            when every row is greedy — ~17%% of the tick. The host passes
            sampling=True whenever any live request needs temperature or
            penalties (one extra executable, not per-request recompiles)."""
            pre = cache
            logits, cache = engine._step(
                params, st.toks[:, None], st.poss[:, None], cache, True
            )
            if recurrent:
                # a fresh or INACTIVE row's decode this tick is a dummy; for
                # a KV cache its write is overwritten at the same slot next
                # tick, but a RECURRENT state update is forever — restore
                # those rows' pre-tick state (the state is
                # O(layers*d_inner), tiny). Without the ~active term, a slot
                # that idles between requests accumulates dummy-decode drift
                # that the next admission would prefill on top of.
                frozen = st.fresh | ~st.active
                cache = jax.tree.map(
                    lambda old, new: jnp.where(
                        frozen.reshape((1, -1) + (1,) * (new.ndim - 2)),
                        old, new),
                    pre, cache)
            l = jnp.where(st.fresh[:, None], st.pending,
                          logits[:, 0, :].astype(jnp.float32))
            if sampling:
                l = apply_penalties_rows(l, st.counts, st.rps, st.pps, st.fps)
                keys = jax.vmap(jax.random.fold_in)(st.base_keys, st.steps)
                tok = sample_rows(l, keys, st.temps, st.top_ks, st.top_ps,
                                  st.min_ps)
                pstate = update_penalty_state_rows(
                    (st.counts, st.window, st.widx, st.nfill), tok,
                    st.last_ns)
            else:
                tok = jnp.argmax(l, axis=-1).astype(jnp.int32)
                pstate = (st.counts, st.window, st.widx, st.nfill)
            st = st._replace(
                toks=jnp.where(st.active, tok, st.toks),
                poss=jnp.where(st.active & ~st.fresh, st.poss + 1, st.poss),
                fresh=jnp.zeros_like(st.fresh),
                steps=st.steps + 1,
                counts=pstate[0], window=pstate[1], widx=pstate[2],
                nfill=pstate[3],
            )
            return tok, cache, st

        @partial(jax.jit, donate_argnums=(1, 2), static_argnums=(3,))
        def _tick_fn(params, cache, st: _DevState, sampling: bool = True):
            """Fused serving tick: ONE dispatch, one [B] fetch back."""
            return _tick_body(params, cache, st, sampling)

        self._tick_fn = _tick_fn

        MAX_CHUNK = self.MAX_CHUNK

        @partial(jax.jit, donate_argnums=(1, 2), static_argnums=(5,))
        def _tick_n_fn(params, cache, st: _DevState, n, eos_ids,
                       sampling: bool):
            """Up-to-n serving ticks fused into ONE on-device dispatch — the
            serving analog of the single-stream _decode_loop_sampled. Used
            between admissions (queue empty, every slot's budget covers n
            more ticks): the tunneled host pays ONE dispatch RTT per n*B
            tokens instead of per B.

            n is a TRACED scalar (one executable serves every chunk length —
            r4 compiled one per power-of-two) and the loop is EOS-AWARE on
            device: a row whose sampled token equals its eos_id goes
            inactive (token/position/KV frozen — no wasted writes), and the
            loop exits early once every row is inactive, so an eos-heavy
            workload no longer needs the host to cap chunks at 4 ticks
            (VERDICT r4 weak #3). Returns (toks [MAX_CHUNK, B], count) —
            rows past count (and finished rows' later columns) are garbage
            the host skips."""
            buf = jnp.zeros((MAX_CHUNK, B), jnp.int32)

            def cond(c):
                _cache, st, _buf, j = c
                return (j < n) & jnp.any(st.active)

            def body(c):
                cache, st, buf, j = c
                tok, cache, st = _tick_body(params, cache, st, sampling)
                hit = st.active & (eos_ids >= 0) & (tok == eos_ids)
                st = st._replace(active=st.active & ~hit)
                buf = jax.lax.dynamic_update_slice(buf, tok[None, :], (j, 0))
                return cache, st, buf, j + 1

            cache, st, buf, j = jax.lax.while_loop(
                cond, body, (cache, st, buf, jnp.int32(0)))
            return buf, j, cache, st

        self._tick_n_fn = _tick_n_fn

        @partial(jax.jit, donate_argnums=(0,))
        def _admit_row(st: _DevState, b, row_logits, pos, base_key, temp,
                       top_k, top_p, min_p, rp, pp, fp, last_n, counts,
                       window, widx, nfill):
            """Admission: set every per-slot field of row b in ONE dispatch."""
            return st._replace(
                toks=st.toks.at[b].set(0),
                poss=st.poss.at[b].set(pos),
                fresh=st.fresh.at[b].set(True),
                active=st.active.at[b].set(True),
                steps=st.steps.at[b].set(0),
                base_keys=st.base_keys.at[b].set(base_key),
                temps=st.temps.at[b].set(temp),
                top_ks=st.top_ks.at[b].set(top_k),
                top_ps=st.top_ps.at[b].set(top_p),
                min_ps=st.min_ps.at[b].set(min_p),
                rps=st.rps.at[b].set(rp),
                pps=st.pps.at[b].set(pp),
                fps=st.fps.at[b].set(fp),
                last_ns=st.last_ns.at[b].set(last_n),
                pending=st.pending.at[b].set(row_logits),
                counts=st.counts.at[b].set(counts),
                window=st.window.at[b].set(window),
                widx=st.widx.at[b].set(widx),
                nfill=st.nfill.at[b].set(nfill),
            )

        self._admit_row = _admit_row

        @partial(jax.jit, donate_argnums=(0,))
        def _retire_row(st: _DevState, b):
            return st._replace(
                active=st.active.at[b].set(False),
                temps=st.temps.at[b].set(0.0),
                rps=st.rps.at[b].set(1.0),
                pps=st.pps.at[b].set(0.0),
                fps=st.fps.at[b].set(0.0),
                last_ns=st.last_ns.at[b].set(0),
                # park the slot at position 0: its dummy decodes keep
                # rewriting slot 0, which the next admission's prefill
                # overwrites anyway
                poss=st.poss.at[b].set(0),
                toks=st.toks.at[b].set(0),
            )

        self._retire_row = _retire_row

        @partial(jax.jit, donate_argnums=(3, 6))
        def _prefill_admit(params, tokens, positions, cache, slot, kv_valid,
                           st: _DevState, last_idx, pos, base_key, temp,
                           top_k, top_p, min_p, rp, pp, fp, last_n, counts,
                           window, widx, nfill):
            """Admission fused to ONE dispatch: slot prefill + every per-slot
            state field set, pending logits staying on device. Replaces the
            prefill_slot + _admit_row dispatch pair (2 tunnel RTTs -> 1)."""
            logits_row, cache = engine._prefill_slot(
                params, tokens, positions, cache, slot, kv_valid)
            st = _admit_row(st, slot, logits_row[last_idx].astype(jnp.float32),
                            pos, base_key, temp, top_k, top_p, min_p, rp, pp,
                            fp, last_n, counts, window, widx, nfill)
            return cache, st

        self._prefill_admit = _prefill_admit

        @partial(jax.jit, donate_argnums=(3, 6))
        def _prefill_admit_batch(params, tokens, positions, cache, slots,
                                 kv_valid, st: _DevState, last_idx, pos,
                                 base_key, temp, top_k, top_p, min_p, rp, pp,
                                 fp, last_n, counts, window, widx, nfill):
            """ADMISSION BURST in ONE dispatch: k queued requests prefill as
            one [k, T] batched forward over a fresh temp cache, each row is
            scattered into its slot, and every state field is set — one
            tunnel RTT total where the per-request path paid k. Padded
            entries (k is always padded up to B — one executable total)
            duplicate a real row: the duplicate scatter/state writes are
            idempotent.

            Why it matters: with multi-tick chunks the decode side costs
            ~1 RTT per 32·B tokens, which left the 48 serial admission
            dispatches (~1.1 s of a 1.6 s B=16 run) as the serving wall's
            dominant term."""
            from tpu_kquant.runtime.kv_cache import (
                set_batch_row,
                slice_batch_row,
            )

            k = tokens.shape[0]
            tmp = engine.new_cache(k)
            logits, tmp = engine._step_valid(params, tokens, positions, tmp,
                                             kv_valid)
            for j in range(k):
                cache = set_batch_row(cache, slice_batch_row(tmp, j),
                                      slots[j])
                st = _admit_row(
                    st, slots[j], logits[j, last_idx[j]].astype(jnp.float32),
                    pos[j], base_key[j], temp[j], top_k[j], top_p[j],
                    min_p[j], rp[j], pp[j], fp[j], last_n[j], counts[j],
                    window[j], widx[j], nfill[j])
            return cache, st

        self._prefill_admit_batch = _prefill_admit_batch

        @partial(jax.jit, donate_argnums=(0,))
        def _retire_rows(st: _DevState, mask):
            """Batched retirement: every done slot cleared in ONE dispatch
            (slots complete in waves under uniform loads — per-slot retire
            dispatches were ~1/4 of the serving run's tunnel RTTs)."""
            return st._replace(
                active=jnp.where(mask, False, st.active),
                temps=jnp.where(mask, 0.0, st.temps),
                rps=jnp.where(mask, 1.0, st.rps),
                pps=jnp.where(mask, 0.0, st.pps),
                fps=jnp.where(mask, 0.0, st.fps),
                last_ns=jnp.where(mask, 0, st.last_ns),
                poss=jnp.where(mask, 0, st.poss),
                toks=jnp.where(mask, 0, st.toks),
            )

        self._retire_rows = _retire_rows

        # observability (reference analog: llama-bench t/s tables + timers)
        self.stats = {
            "steps": 0, "prefills": 0, "tokens_out": 0, "tokens_in": 0,
            "wall_s": 0.0, "batch_occupancy_sum": 0,
            # actual device dispatches (tick/chunk/prefill/admit/retire):
            # the tunnel-RTT correction in tools_serve_bench needs the real
            # count, which multi-tick chunks decouple from "steps"
            "dispatches": 0,
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
        # validate HERE, before any slot/queue state exists for the request:
        # raising mid-admission (the r4 path) left a slot claiming a request
        # that was never admitted on device (ADVICE r4)
        if len(req.prompt) > self.engine.max_seq:
            raise ValueError(
                f"prompt length {len(req.prompt)} exceeds max_seq "
                f"{self.engine.max_seq}")
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

    def run(self, on_token: Callable[[Request, int], None] | None = None,
            max_chunk: int | None = None) -> list[Request]:
        """Drain all submitted requests; returns them in completion order.

        Between admissions, runs multi-tick fused chunks (step_chunk) so the
        host dispatches once per up-to-``max_chunk`` ticks; token streams are
        bit-identical to per-tick stepping (the chunk is the same tick body
        chained on device). max_chunk defaults to 1 (pure per-tick) when
        on_token is given — chunks deliver streaming callbacks in bursts of
        up to MAX_CHUNK ticks, which a latency-sensitive streaming consumer
        must opt into explicitly — and to MAX_CHUNK otherwise."""
        if max_chunk is None:
            max_chunk = 1 if on_token is not None else self.MAX_CHUNK
        while self.has_work():
            self.step(on_token)
            n = self._safe_chunk(max_chunk)
            if n >= 2:
                self.step_chunk(n, on_token)
        out, self.finished = self.finished, []
        return out

    def _sampling_live(self) -> bool:
        """True if any active request needs the sampler chain (temperature
        or penalties); all-greedy ticks then skip sample_rows' sorts."""
        reqs = [s.req for s in self.slots if s.req is not None]
        return any(
            r.temperature > 0.0 or r.repeat_penalty != 1.0
            or r.presence_penalty != 0.0 or r.frequency_penalty != 0.0
            for r in reqs)

    def _safe_chunk(self, max_chunk: int) -> int:
        """Largest tick count that cannot overrun any slot's budget or KV
        room (any length — the chunk executable takes n as a traced scalar).
        Bounded by the EARLIEST possible completion across active slots, so
        a chunk ends exactly when a slot could free — queued requests are
        admitted then, never later than under per-tick stepping, and
        occupancy never idles inside a chunk. eos needs no host-side cap:
        the device loop freezes a row when it samples its eos_id and exits
        once every row has (step_chunk's early-exit count)."""
        if self.active == 0:
            return 0
        lim = min(max_chunk, self.MAX_CHUNK)
        for slot in self.slots:
            req = slot.req
            if req is None:
                continue
            lim = min(lim,
                      req.max_new_tokens - len(req.output),
                      self.engine.max_seq - 1 - slot.pos)
        return max(lim, 0)

    def step_chunk(self, n: int, on_token=None) -> None:
        """Run up to n fused ticks in ONE dispatch (no admissions between).

        The device loop may exit early (every row sampled its eos); `count`
        is how many ticks actually ran. A row frozen at eos mid-chunk stops
        advancing on device; the host mirrors that by skipping done rows."""
        import time as _time

        t_start = _time.time()
        occupancy = self.active
        eos_ids = np.full(self.B, -1, np.int32)
        for b, slot in enumerate(self.slots):
            if slot.req is not None and slot.req.eos_id is not None:
                eos_ids[b] = slot.req.eos_id
        tok_dev, cnt_dev, self.cache, self.state = self._tick_n_fn(
            self.engine.params, self.cache, self.state, jnp.int32(n),
            jnp.asarray(eos_ids), self._sampling_live())
        self.stats["dispatches"] += 1
        sampled = np.asarray(tok_dev)  # [MAX_CHUNK, B]; the only host sync
        count = int(cnt_dev)
        for j in range(count):
            for b, slot in enumerate(self.slots):
                req = slot.req
                if req is None or req.done:
                    continue
                slot.pos += 1
                self._emit(req, int(sampled[j, b]), on_token)
        to_retire = []
        for b, slot in enumerate(self.slots):
            req = slot.req
            if req is None:
                continue
            if req.done or slot.pos + 1 >= self.engine.max_seq:
                req.done = True
                to_retire.append(b)
        self._do_retire_batch(to_retire)
        self.stats["steps"] += count
        self.stats["batch_occupancy_sum"] += occupancy * count
        self.stats["wall_s"] += _time.time() - t_start

    # -- one scheduler tick ----------------------------------------------------
    def step(self, on_token=None) -> None:
        import time as _time

        t_start = _time.time()
        # 1. admit queued requests into free slots (device-side pending
        # logits; no host round-trip per admission; a multi-request burst
        # prefills as ONE batched dispatch)
        fresh = np.zeros(self.B, bool)
        pairs = []
        for b, slot in enumerate(self.slots):
            if slot.req is None and self.queue:
                req = self.queue.popleft()
                self.stats["prefills"] += 1
                self.stats["tokens_in"] += len(req.prompt)
                slot.req = req
                slot.pos = len(req.prompt)
                pairs.append((b, req))
                fresh[b] = True
        if len(pairs) == 1:
            self._admit(*pairs[0])
        elif pairs:
            self._admit_burst(pairs)
        if self.active == 0:
            return

        # 2. ONE fused decode+sample dispatch; fresh rows' dummy decode at
        # slot.pos is overwritten by the real decode there next tick
        tok_dev, self.cache, self.state = self._tick_fn(
            self.engine.params, self.cache, self.state, self._sampling_live()
        )
        self.stats["dispatches"] += 1
        sampled = np.asarray(tok_dev)  # the tick's only host sync

        # 3. emit / retire
        to_retire = []
        for b, slot in enumerate(self.slots):
            req = slot.req
            if req is None:
                continue
            if not fresh[b]:
                slot.pos += 1  # fresh rows' first real decode is next tick
            tok = int(sampled[b])
            self._emit(req, tok, on_token)
            if req.done or slot.pos + 1 >= self.engine.max_seq:
                req.done = True
                to_retire.append(b)
        self._do_retire_batch(to_retire)
        self.stats["steps"] += 1
        self.stats["batch_occupancy_sum"] += sum(
            s.req is not None for s in self.slots
        )
        self.stats["wall_s"] += _time.time() - t_start

    # -- helpers ---------------------------------------------------------------
    def _req_args(self, req: Request) -> dict:
        """Host-side per-request admission fields (numpy, no device calls)."""
        uses_pen = (
            req.repeat_penalty != 1.0
            or req.presence_penalty != 0.0
            or req.frequency_penalty != 0.0
        ) and req.penalty_last_n > 0
        last_n = req.penalty_last_n if uses_pen else 0
        seed = req.seed if req.seed is not None else self._seed + 7919 * req.rid
        # threefry2x32 key layout [seed>>32, seed&0xffffffff] built on HOST:
        # jax.random.PRNGKey dispatches on device, and fetching it back for
        # re-upload cost a full tunnel RTT per admission (measured ~26 ms)
        base_key = np.array([(seed >> 32) & 0xFFFFFFFF, seed & 0xFFFFFFFF],
                            np.uint32)
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
        return dict(last_n=last_n, base_key=base_key, counts=counts,
                    window=window, widx=widx, nfill=nfill)

    def _admit(self, b: int, req: Request) -> None:
        a = self._req_args(req)
        last_n, base_key = a["last_n"], a["base_key"]
        counts, window = a["counts"], a["window"]
        widx, nfill = a["widx"], a["nfill"]
        from tpu_kquant.runtime.engine import _bucket

        eng = self.engine
        if eng.kv_layout != "unified":
            raise NotImplementedError(
                "slot prefill requires the unified KV layout")
        T = min(_bucket(len(req.prompt)), eng.max_seq)
        toks = np.zeros((1, T), np.int32)
        toks[0, : len(req.prompt)] = req.prompt
        positions = np.arange(T, dtype=np.int32)[None, :]
        valid = positions < len(req.prompt)
        self.stats["dispatches"] += 1
        self.cache, self.state = self._prefill_admit(
            eng.params, jnp.asarray(toks), jnp.asarray(positions),
            self.cache, jnp.int32(b), jnp.asarray(valid), self.state,
            jnp.int32(len(req.prompt) - 1), jnp.int32(len(req.prompt)),
            jnp.asarray(base_key),
            jnp.float32(req.temperature), jnp.int32(req.top_k),
            jnp.float32(req.top_p), jnp.float32(req.min_p),
            jnp.float32(req.repeat_penalty), jnp.float32(req.presence_penalty),
            jnp.float32(req.frequency_penalty), jnp.int32(last_n),
            jnp.asarray(counts), jnp.asarray(window), jnp.int32(widx),
            jnp.int32(nfill),
        )

    def _admit_burst(self, pairs: list) -> None:
        """k>=2 admissions in ONE dispatch (_prefill_admit_batch): the
        prompts prefill as a [k, T] batch over a temp cache whose rows
        scatter into their slots. k always pads up to B by duplicating the
        first pair (idempotent writes) — ONE executable per prompt bucket.
        Prompt lengths were validated at submit()."""
        from tpu_kquant.runtime.engine import _bucket

        eng = self.engine
        if eng.kv_layout != "unified":
            raise NotImplementedError(
                "slot prefill requires the unified KV layout")
        k = self.B
        padded = pairs + [pairs[0]] * (k - len(pairs))
        T = min(_bucket(max(len(r.prompt) for _b, r in padded)), eng.max_seq)
        toks = np.zeros((k, T), np.int32)
        args = []
        for j, (_b, req) in enumerate(padded):
            toks[j, : len(req.prompt)] = req.prompt
            args.append(self._req_args(req))
        positions = np.broadcast_to(np.arange(T, dtype=np.int32), (k, T))
        lens = np.array([len(r.prompt) for _b, r in padded], np.int32)
        valid = positions < lens[:, None]
        self.stats["dispatches"] += 1
        self.cache, self.state = self._prefill_admit_batch(
            eng.params, jnp.asarray(toks),
            jnp.asarray(np.ascontiguousarray(positions)), self.cache,
            jnp.asarray(np.array([b for b, _r in padded], np.int32)),
            jnp.asarray(valid), self.state,
            jnp.asarray(lens - 1), jnp.asarray(lens),
            jnp.asarray(np.stack([a["base_key"] for a in args])),
            jnp.asarray(np.array([r.temperature for _b, r in padded],
                                 np.float32)),
            jnp.asarray(np.array([r.top_k for _b, r in padded], np.int32)),
            jnp.asarray(np.array([r.top_p for _b, r in padded], np.float32)),
            jnp.asarray(np.array([r.min_p for _b, r in padded], np.float32)),
            jnp.asarray(np.array([r.repeat_penalty for _b, r in padded],
                                 np.float32)),
            jnp.asarray(np.array([r.presence_penalty for _b, r in padded],
                                 np.float32)),
            jnp.asarray(np.array([r.frequency_penalty for _b, r in padded],
                                 np.float32)),
            jnp.asarray(np.array([a["last_n"] for a in args], np.int32)),
            jnp.asarray(np.stack([a["counts"] for a in args])),
            jnp.asarray(np.stack([a["window"] for a in args])),
            jnp.asarray(np.array([a["widx"] for a in args], np.int32)),
            jnp.asarray(np.array([a["nfill"] for a in args], np.int32)),
        )

    def _emit(self, req: Request, tok: int, on_token):
        self.stats["tokens_out"] += 1
        req.output.append(tok)
        if on_token:
            on_token(req, tok)
        if (req.eos_id is not None and tok == req.eos_id) or len(req.output) >= req.max_new_tokens:
            req.done = True

    def _do_retire(self, b: int):
        self._do_retire_batch([b])

    def _do_retire_batch(self, bs: list[int]):
        if not bs:
            return
        mask = np.zeros(self.B, bool)
        for b in bs:
            req = self.slots[b].req
            self.slots[b] = _Slot()
            mask[b] = True
            if req is not None:
                self.finished.append(req)
        self.stats["dispatches"] += 1
        self.state = self._retire_rows(self.state, jnp.asarray(mask))
