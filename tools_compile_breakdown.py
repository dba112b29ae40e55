#!/usr/bin/env python
"""Cold-compile breakdown (VERDICT r4 weak #5): where do the cold-start
seconds actually go?

The r2 target was <20 s cold; r3 measured 44.2 s, r4 got to ~33 s by
merging executables 5 -> 3, and the axon remote-compile service swings
14-52 s for the same program session-to-session — so the open question is
whether the remaining floor is the repo's (tracing + StableHLO lowering,
which we control) or the compile service's (which we do not). This tool
splits each of bench.py's three executables into:

  trace_lower_s   jax.jit(...).lower(...)  — all repo-side work: python
                  tracing of the forward, jaxpr -> StableHLO
  backend_compile_s  lowered.compile()     — XLA/Mosaic compilation,
                  executed by the remote compile service over the tunnel

against a FRESH compilation-cache dir (a tempdir; the persistent cache is
untouched). Artifact: artifacts/perf/compile_breakdown_r5.json.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import jax

# fresh cache: cold numbers, persistent cache untouched
_TMP = tempfile.mkdtemp(prefix="tkq_cc_")
jax.config.update("jax_compilation_cache_dir", _TMP)

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from bench import get_fixture
    from tpu_kquant.models.fixtures import tinyllama_1b_config
    from tpu_kquant.runtime import InferenceEngine, load_model

    model_path = get_fixture("tinyllama-1.1b-q4_k_m", tinyllama_1b_config())
    cfg, params, _ = load_model(model_path, scale_dtype="bf16")
    eng = InferenceEngine(cfg, params, max_batch=1, max_seq=1024)
    log(f"devices: {jax.devices()}")

    T = 512
    toks = jnp.zeros((1, T), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (1, T))
    cache = eng.new_cache(1)

    rows = []

    def split(name, jit_fn, *args, **kw):
        t0 = time.time()
        lowered = jit_fn.lower(*args, **kw)
        t_lower = time.time() - t0
        t0 = time.time()
        lowered.compile()
        t_compile = time.time() - t0
        log(f"{name:18s} trace+lower {t_lower:6.2f}s   "
            f"backend compile {t_compile:6.2f}s")
        rows.append({"executable": name, "trace_lower_s": round(t_lower, 2),
                     "backend_compile_s": round(t_compile, 2)})

    # 1. prefill forward (the bucketed T=512 shape bench.py warms first)
    split("prefill fwd", eng._step, eng.params, toks, pos, cache, False)

    # 2. pp marginal chain — bench.py's exact body (llama_forward called
    # directly; routing through the engine's jitted _step inlines a traced
    # jaxpr and was measured to balloon the TRACE to 33.8 s — a tool bug,
    # not a repo cost)
    from tpu_kquant.models.llama import llama_forward as _fwd

    @jax.jit
    def _pp_chain(params, toks0, n):
        positions = jnp.broadcast_to(
            jnp.arange(toks0.shape[1], dtype=jnp.int32), toks0.shape)

        def body(_i, c):
            t = toks0 - (c.astype(jnp.int32) & 1)
            cache = eng.new_cache(1)
            logits, _ = _fwd(params, cfg, t, positions, cache,
                             logits_last_only=True)
            return jnp.sum(logits[:, -1, :100])

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    split("pp chain", _pp_chain, eng.params, toks, jnp.int32(2))

    # 3. tg decode chain (traced-length greedy decode — bench.py)
    @partial(jax.jit, donate_argnums=(3,))
    def _tg_chain(params, tok, p0, cache, n):
        def body(i, carry):
            tok, p, cache = carry
            logits, cache = eng._step(params, tok[:, None], p[:, None],
                                      cache, True)
            return (jnp.argmax(logits[:, 0, :], axis=-1).astype(jnp.int32),
                    p + 1, cache)

        return jax.lax.fori_loop(0, n, body, (tok, p0, cache))

    split("tg chain", _tg_chain, eng.params, jnp.zeros((1,), jnp.int32),
          jnp.full((1,), T, jnp.int32), eng.new_cache(1), jnp.int32(4))

    total_lower = sum(r["trace_lower_s"] for r in rows)
    total_compile = sum(r["backend_compile_s"] for r in rows)
    out = {
        "rows": rows,
        "total_trace_lower_s": round(total_lower, 2),
        "total_backend_compile_s": round(total_compile, 2),
        "note": "trace_lower is the repo-side share (python tracing + "
                "StableHLO lowering); backend_compile runs on the axon "
                "remote compile service, whose per-program latency was "
                "measured to swing 14-52 s session-to-session (r4)",
    }
    Path("artifacts/perf/compile_breakdown_r5.json").write_text(
        json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
