#!/usr/bin/env python
"""Headline benchmark: single-stream decode tokens/sec/chip on TinyLlama-1.1B
Q4_K_M — the reference's exact workload (BASELINE.md: llama-bench tg128 =
9.65 t/s after its NEON optimization on a Raspberry Pi 5).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N/9.65}

The model is a synthesized GGUF with TinyLlama-1.1B's exact architecture and
Q4_K_M type recipe (zero-egress environment: no weights download; identical
tensor inventory, bytes and compute graph as the real checkpoint). Cached
under .cache/ after first build.
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BASELINE_TG128 = 9.65  # reference README.md:1488 (post-optimization tg128)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def get_fixture(name: str, cfg, seed: int = 0) -> str:
    cache = REPO / ".cache"
    cache.mkdir(exist_ok=True)
    path = cache / f"{name}.gguf"
    if not path.exists():
        log(f"building fixture {path} ...")
        from tpu_kquant.models.fixtures import write_fixture_gguf

        t0 = time.time()
        write_fixture_gguf(path, cfg, seed=seed, quant="q4_k_m")
        log(f"fixture built in {time.time() - t0:.0f}s")
    return str(path)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="path to a GGUF model (default: TinyLlama-1.1B fixture)")
    ap.add_argument("--preset", default="tinyllama-1.1b",
                    choices=["tinyllama-1.1b", "llama3-8b"],
                    help="fixture model to synthesize when --model is not given")
    ap.add_argument("--pp", type=int, default=512, help="prefill tokens")
    ap.add_argument("--tg", type=int, default=128, help="decode tokens")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--impl", default="auto", choices=["auto", "xla", "pallas", "int8"])
    ap.add_argument("--scale-dtype", default="bf16", choices=["bf16", "f32", "f16"],
                    help="per-group scale/min storage (bf16 = fewer bytes/weight)")
    ap.add_argument("--reps", type=int, default=5,
                    help="timed repetitions (compile warmup excluded; "
                         "mean±σ + median reported, reference README style)")
    ap.add_argument("--scan-layers", action="store_true",
                    help="lax.scan over stacked layers (one compiled layer "
                         "instead of L inlined copies; the 70B-class config)")
    ap.add_argument("--no-smoke", action="store_true",
                    help="skip the pre-bench kernel compile smoke")
    args = ap.parse_args()

    import jax

    # persistent compile cache: first run pays ~10 min of XLA/Mosaic AOT
    # compiles (512-token prefill over 22 layers); reruns skip it
    cc_dir = Path(os.environ.get("TKQ_JAX_CC", REPO / ".cache" / "jax_cc"))
    cc_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cc_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    log(f"devices: {jax.devices()}")

    # Pre-bench kernel compile smoke (VERDICT r2 item 4): every Pallas kernel
    # this preset dispatches must Mosaic-compile on the real backend BEFORE
    # any number is produced — an aa8e852-class verification failure fails
    # here loudly instead of inside the bench. Compiles land in the shared
    # persistent cache, so reruns cost seconds.
    if not args.no_smoke:
        import tools_kernel_smoke as _smoke

        preset_key = "8b" if args.preset == "llama3-8b" else "tiny"
        _results: list = []
        t0 = time.time()
        _smoke.smoke_model(preset_key, _results)
        n_fail = sum(1 for r in _results if not r["ok"])
        log(f"kernel smoke ({preset_key}): {len(_results) - n_fail}/"
            f"{len(_results)} compiled in {time.time() - t0:.0f}s")
        if n_fail:
            for r in _results:
                if not r["ok"]:
                    log(f"  FAILED: {r['case']}: {r.get('error', '')[:200]}")
            sys.exit(1)

    from tpu_kquant.models.fixtures import llama3_8b_config, tinyllama_1b_config
    from tpu_kquant.runtime import InferenceEngine, load_model

    preset_cfg = {
        "tinyllama-1.1b": ("tinyllama-1.1b-q4_k_m", tinyllama_1b_config),
        "llama3-8b": ("llama3-8b-q4_k_m", llama3_8b_config),
    }[args.preset]
    model_path = args.model or get_fixture(preset_cfg[0], preset_cfg[1]())
    t0 = time.time()
    cfg, params, reader = load_model(model_path, scale_dtype=args.scale_dtype)
    log(f"model loaded+repacked in {time.time() - t0:.0f}s  arch={cfg.arch} "
        f"L={cfg.n_layers} dim={cfg.dim} vocab={cfg.vocab_size}")

    B = args.batch
    max_seq = min(cfg.max_seq_len, args.pp + args.tg + 64)
    eng = InferenceEngine(cfg, params, max_batch=B, max_seq=max_seq,
                          impl=args.impl, scan_layers=args.scan_layers)
    if args.scan_layers:
        params = eng.params  # stacked by the engine; _pp_chain shares them

    rng = np.random.default_rng(0)

    def _sync(x):
        """Force REAL completion: device-reduce to a scalar and fetch 4 bytes.
        (block_until_ready over the tunneled device can return early, and a
        full-array fetch would bill the slow host link to the kernel.)"""
        return float(jnp.sum(x.astype(jnp.float32)))

    half = args.tg // 2

    # --- pp marginal-rate chain: n full prefill forwards inside ONE jitted
    # lax.scan. A single prefill dispatch pays the tunneled dev setup's ~22 ms
    # RTT (a real TPU VM does not) — over half of a 512-token step at tiny
    # scale — so, like the tg marginal rate, pp is measured as the DIFFERENCE
    # of chains of n and 2n prefills. Each iteration perturbs the tokens from
    # the carry so XLA cannot hoist the forward out of the scan.
    from functools import partial as _partial

    from tpu_kquant.models.llama import llama_forward as _fwd

    @jax.jit
    def _pp_chain(params, toks, n):
        """n is TRACED (fori_loop): chains of every length share ONE
        executable — the r3 bench compiled the scan body twice (n and 2n).
        (Carrying the last cache/logits out to also replace the prefill
        executable was measured WORSE cold: the cache-carrying fori compiled
        in 35.2 s vs 12.9 + 14.1 for chain + prefill separately.)"""
        positions = jnp.broadcast_to(
            jnp.arange(toks.shape[1], dtype=jnp.int32), toks.shape)

        def body(_i, c):
            t = toks - (c.astype(jnp.int32) & 1)
            cache = eng.new_cache(B)
            logits, _ = _fwd(params, cfg, t, positions, cache, impl=args.impl,
                             logits_last_only=True,
                             kv_attend_len=toks.shape[1])
            return jnp.sum(logits[:, -1, :100])

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    @_partial(jax.jit, donate_argnums=(3,))
    def _tg_chain(params, tok, pos, cache, n):
        """Traced-length greedy decode chain (fori_loop): both marginal
        lengths (tg/2, tg) share ONE executable, vs two lax.scan compiles
        of engine.decode_greedy_jit in the r3 bench (~15 s cold)."""

        def body(_i, carry):
            tok, pos, cache = carry
            logits, cache = eng._step(params, tok[:, None], pos[:, None],
                                      cache, True)
            ntok = jnp.argmax(logits[:, 0, :], axis=-1).astype(jnp.int32)
            return ntok, pos + 1, cache

        tok, pos, cache = jax.lax.fori_loop(0, n, body, (tok, pos, cache))
        return tok, pos, cache

    PP_N = 6

    def pp_marginal(toks) -> float:
        """Seconds per prefill, dispatch overhead cancelled.

        r4 estimator hardening (r3 verdict: "the pp estimator is the least
        trustworthy number in the bench" — rep-collapse at PP_N=2, where the
        chain difference ~2 prefills was the same order as the tunnel's
        per-dispatch jitter): chains of 6 vs 12 prefills, each timed 3x with
        the MIN taken (positive-jitter robust, same policy as
        utils.attribution.time_chained), differenced once."""
        t1s, t2s = [], []
        for _ in range(3):
            t0 = time.time()
            float(_pp_chain(eng.params, toks, PP_N))
            t1s.append(time.time() - t0)
            t0 = time.time()
            float(_pp_chain(eng.params, toks, 2 * PP_N))
            t2s.append(time.time() - t0)
        return max(min(t2s) - min(t1s), 1e-9) / PP_N

    # --- compile warmup, EXCLUDED from stats (reference README.md:190-196
    # reports mean±σ over timed reps only; rep 0 with compile would be junk).
    # Compiles: prefill bucket, both decode-loop lengths.
    # the three big executables (prefill forward, pp chain, tg chain)
    # compile CONCURRENTLY — the remote AOT compiler overlaps requests
    # (measured r4: 2 threaded compiles in 1.5x one serial) and the tg
    # chain warms on a throwaway cache so it needs nothing from prefill
    warm_prompt = rng.integers(10, cfg.vocab_size, args.pp).tolist()
    box: dict = {}
    warm_toks = jnp.asarray(
        rng.integers(10, cfg.vocab_size, (B, args.pp)), jnp.int32)

    # Three executables, traced-length chains (r3 compiled five: prefill,
    # chain n, chain 2n, two decode scans -> 44.2 s cold). Order matters:
    # compiling the plain prefill FIRST warms in-process compiler state
    # that makes the pp chain ~3x cheaper (measured: pp chain alone cold
    # 40.7-47.5 s; after the prefill compile, 12.9 s).
    t0 = time.time()
    cache = eng.new_cache(B)
    logits, cache, lens = eng.prefill([warm_prompt] * B, cache)
    _sync(logits)
    log(f"warmup prefill (incl. compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    float(_pp_chain(eng.params, warm_toks, PP_N))
    log(f"warmup pp chain (incl. compile): {time.time() - t0:.1f}s")
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    pos = jnp.asarray(lens)
    t0 = time.time()
    tok, pos, cache = _tg_chain(eng.params, tok, pos, cache, half)
    _sync(tok)
    log(f"warmup decode chain (incl. compile): {time.time() - t0:.1f}s")

    results = {}
    for rep in range(args.reps):
        # fresh random prompt every rep (the tunneled device memoizes
        # value-identical dispatches, which would fake the numbers)
        prompt = rng.integers(10, cfg.vocab_size, args.pp).tolist()
        rows = [prompt] * B

        # --- pp: marginal rate over chained prefills (llama-bench
        # test_prompt equivalent; dispatch RTT cancelled like tg below) ---
        toks_dev = jnp.asarray(np.array(rows, np.int32))
        pp_dt = pp_marginal(toks_dev)
        pp_tps = args.pp * B / pp_dt
        # the tg prefix still needs a real prefill into the decode cache
        cache = eng.new_cache(B)
        jax.block_until_ready(cache)
        t0 = time.time()
        logits, cache, lens = eng.prefill(rows, cache)
        _sync(logits)
        pp_wall = args.pp * B / (time.time() - t0)

        # --- tg: fused on-device decode loop (test_gen equivalent; one
        # dispatch for all tg tokens, lax.scan inside jit). The per-token rate
        # is the MARGINAL rate over loop lengths tg/2 and tg: a fixed
        # per-dispatch cost (the tunneled dev setup adds ~22 ms RTT that a
        # real TPU VM does not have) cancels in the difference. The wall-clock
        # rate of the full tg loop is logged alongside. ---
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pos = jnp.asarray(lens)
        t0 = time.time()
        tok, pos, cache = _tg_chain(eng.params, tok, pos, cache, half)
        _sync(tok)
        t1 = time.time() - t0
        t0 = time.time()
        tok, pos, cache = _tg_chain(eng.params, tok, pos, cache, args.tg)
        _sync(tok)
        t2 = time.time() - t0
        tg_wall = args.tg * B / t2
        tg_tps = (args.tg - half) * B / max(t2 - t1, 1e-9)
        log(f"rep {rep}: pp{args.pp} {pp_tps:8.1f} t/s marginal "
            f"({pp_wall:.0f} wall)   tg{args.tg} "
            f"{tg_tps:8.1f} t/s marginal ({tg_wall:.1f} wall incl. dispatch)")
        results.setdefault("pp", []).append(pp_tps)
        results.setdefault("tg", []).append(tg_tps)

    # median headline: the marginal rate is a difference of two timings, so
    # its spread is wider than a plain wall rate; mean±σ logged alongside
    # (the reference's llama-bench format, README.md:190-196)
    tg = float(np.median(results["tg"]))
    tg_mean, tg_std = float(np.mean(results["tg"])), float(np.std(results["tg"]))
    pp_mean, pp_std = float(np.mean(results["pp"])), float(np.std(results["pp"]))
    # the pp marginal is a difference of two chain timings; tunnel jitter
    # occasionally collapses a rep — the median/max are the robust stats
    pp_median = float(np.median(results["pp"]))
    pp = max(results["pp"])
    log(f"pp{args.pp}: {pp_mean:.1f} ± {pp_std:.1f} t/s   "
        f"tg{args.tg}: {tg_mean:.1f} ± {tg_std:.1f} t/s marginal "
        f"(median {tg:.1f}) over {args.reps} reps")
    try:
        from tpu_kquant.utils.roofline import (
            prefill_roofline_report,
            roofline_report,
        )

        rep = roofline_report(params, cfg, tg, chip="v5e", batch=B,
                              seq_len=args.pp + args.tg)
        log(f"decode roofline: {rep['bytes_per_step']/1e6:.0f} MB/step -> "
            f"{rep['roofline_tok_s']:.0f} tok/s ceiling; measured "
            f"{tg:.0f} = {rep['fraction_of_roofline']*100:.0f}% of v5e roofline")
        prep = prefill_roofline_report(params, cfg, pp, T=args.pp, chip="v5e",
                                       batch=B)
        log(f"prefill roofline ({prep['bound']}-bound): "
            f"{prep['flops_per_token']/1e9:.2f} GFLOP/tok -> "
            f"{prep['roofline_tok_s']:.0f} tok/s ceiling; measured "
            f"{pp:.0f} = {prep['fraction_of_roofline']*100:.0f}% of v5e roofline")
    except Exception as e:  # pragma: no cover
        log("roofline report failed:", e)
    name = args.preset if args.model is None else os.path.basename(args.model)
    print(json.dumps({
        "metric": f"tg128 decode tok/s/chip, {name} Q4_K_M single-stream",
        "value": round(tg, 2),
        "unit": "tok/s",
        "vs_baseline": round(tg / BASELINE_TG128, 2),
        "mean": round(tg_mean, 2), "stddev": round(tg_std, 2),
        "pp_mean": round(pp_mean, 2), "pp_stddev": round(pp_std, 2),
        "pp_median": round(pp_median, 2), "pp_best": round(pp, 2),
        "reps": args.reps,
    }))


if __name__ == "__main__":
    main()
