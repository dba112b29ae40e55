"""Scale-readiness evidence for BASELINE configs #4/#5 (VERDICT r4 missing #2).

Real multi-host slices are not reachable from this environment, so the
evidence is what CAN be produced without them, in three parts:

  1. AOT build proof, config #5: the Llama-3-70B-geometry decode step
     (llama3_70b_config: 80 layers, dim 8192, ffn 28672, vocab 128256),
     TPxPP-sharded over a virtual 8-device mesh, lowered AND compiled
     (jit(...).lower().compile()) from pure ShapeDtypeStruct avals — the
     ~35 GB of packed weights never materialize anywhere. The optimized
     HLO's collectives are inventoried (op kind, dtype, shape, bytes) so
     the communication the executable will actually issue is recorded,
     not estimated.
  2. Same for config #4: Mixtral-8x7B geometry, expert+tensor sharded,
     with the ragged all_to_all dispatch (models.moe_a2a) — the a2a pair
     shows up in the collective inventory with its real buffer shapes.
  3. An analytic scaling model (tools_scale_ready.scaling_model): decode
     bytes per token split into HBM / ICI / DCN terms with every hardware
     constant named, projecting multi-host scaling efficiency for both
     configs (the >=85%-at-2-hosts north star) with no-overlap and
     full-overlap bounds.

Run (virtual mesh):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools_scale_ready.py --out artifacts/perf/scale_ready_r5.json

Reference parity note: the reference has no multi-device story at all
(SURVEY.md 2.2/2.3 — thread-level only); these configs come from
BASELINE.json's north star, not from reference behavior.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import re
import time

import jax

# the ambient axon PJRT plugin ignores JAX_PLATFORMS=cpu; only a config
# update after import forces the virtual CPU mesh (same as tests/conftest.py)
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

# -- collective inventory ----------------------------------------------------

_DT_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
             "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
             "s8": 1, "u8": 1, "pred": 1}
_COLL = ("all-reduce", "all-gather", "all-to-all", "collective-permute",
         "reduce-scatter")
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DT_BYTES.get(dtype, 4)


def collective_inventory(hlo_text: str) -> list[dict]:
    """Per-collective (op, result dtype/shape, bytes) from optimized HLO.

    Async pairs count once (the -start op carries the shapes; -done is
    skipped). While-loop bodies appear once in HLO, so a collective inside
    the layer scan is ONE entry — multiply by trip count when budgeting."""
    out = []
    for line in hlo_text.splitlines():
        for op in _COLL:
            tok = f" {op}("
            tok_start = f" {op}-start("
            if tok in line or tok_start in line:
                lhs = line.split(f"{op}-start(" if tok_start in line
                                 else f"{op}(")[0]
                shapes = _SHAPE_RE.findall(lhs)
                if not shapes:
                    continue
                # result may be a tuple (async); sum its element shapes
                total = sum(_shape_bytes(dt, dims) for dt, dims in shapes)
                out.append({"op": op,
                            "result": [f"{dt}[{dims}]" for dt, dims in shapes],
                            "bytes": total})
                break
    return out


def _summarize(inv: list[dict]) -> dict:
    by_op: dict = {}
    for e in inv:
        d = by_op.setdefault(e["op"], {"count": 0, "bytes": 0})
        d["count"] += 1
        d["bytes"] += e["bytes"]
    return by_op


# -- aval param helpers ------------------------------------------------------

def _stack_layer_avals(params: dict, mesh, lead_axis: str | None) -> dict:
    """Stack per-layer aval pytrees along a new leading layer axis, sharded
    over ``lead_axis`` ('pipe' for PP, None for plain scan_layers), keeping
    each leaf's TP/EP spec shifted right — the aval analog of
    models.llama.stack_layer_params / parallel.pipeline.stack_pp_params."""
    layers = params["layers"]
    L = len(layers)

    def stk(*xs):
        x0 = xs[0]
        spec = tuple(x0.sharding.spec) if x0.sharding is not None else ()
        spec = spec + (None,) * (x0.ndim - len(spec))
        return jax.ShapeDtypeStruct(
            (L,) + x0.shape, x0.dtype,
            sharding=NamedSharding(mesh, P(lead_axis, *spec)))

    stacked = jax.tree.map(stk, *layers)
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers_stacked"] = stacked
    return out


def _kv_avals(mesh, L, B, Hkv, S, D, pipe: bool):
    from tpu_kquant.runtime.kv_cache import KVCache

    spec = P("pipe" if pipe else None, None,
             "model" if Hkv % mesh.shape["model"] == 0
             and mesh.shape["model"] > 1 else None, None, None)
    kv = jax.ShapeDtypeStruct((L, B, Hkv, S, D), jnp.bfloat16,
                              sharding=NamedSharding(mesh, spec))
    return KVCache(kv, kv, None, None)


def _rep(mesh, shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype,
                                sharding=NamedSharding(mesh, P()))


# -- config #5: 70B TPxPP ----------------------------------------------------

def aot_70b(pipe: int = 2, model: int = 4, S: int = 8192) -> dict:
    """Lower + compile the 70B-geometry decode step, TP(model) x PP(pipe)."""
    from tpu_kquant.models.fixtures import llama3_70b_config, random_qparams
    from tpu_kquant.parallel import make_mesh, make_pp_forward, shard_random_params

    mesh = make_mesh(pipe=pipe, model=model)
    cfg = llama3_70b_config()
    params = shard_random_params(random_qparams(cfg, avals=True), mesh)
    params = _stack_layer_avals(params, mesh, "pipe")
    cache = _kv_avals(mesh, cfg.n_layers, 1, cfg.n_kv_heads, S,
                      cfg.head_dim, pipe=True)
    fwd = make_pp_forward(mesh, n_micro=1)

    def fn(params, tokens, positions, cache):
        return fwd(params, cfg, tokens, positions, cache, impl="xla",
                   logits_last_only=True)

    tok = _rep(mesh, (1, 1), jnp.int32)
    t0 = time.time()
    lowered = jax.jit(fn).lower(params, tok, tok, cache)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    inv = collective_inventory(compiled.as_text())
    mem = compiled.memory_analysis()
    return {
        "config": "llama3-70B geometry, decode [1,1], "
                  f"TP={model} x PP={pipe}, S={S}",
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        "collectives": _summarize(inv),
        "collectives_detail": inv,
        "argument_bytes": getattr(mem, "argument_size_in_bytes", None),
        "ok": True,
    }


# -- config #4: Mixtral EP(a2a) x TP ----------------------------------------

def aot_mixtral(expert: int = 4, model: int = 2, S: int = 4096) -> dict:
    """Lower + compile the Mixtral-8x7B-geometry decode step with the
    ragged all_to_all expert dispatch sharded over 'expert' and TP over
    'model' (scan over the 32 stacked layers; the a2a pair sits inside the
    scan body, so its HLO entry is per-layer)."""
    from tpu_kquant.models.fixtures import mixtral_8x7b_config, random_qparams
    from tpu_kquant.models.llama import llama_forward
    from tpu_kquant.parallel import make_mesh, shard_random_params

    mesh = make_mesh(expert=expert, model=model)
    cfg = dataclasses.replace(mixtral_8x7b_config(), moe_impl="a2a")
    params = shard_random_params(random_qparams(cfg, avals=True), mesh)
    params = _stack_layer_avals(params, mesh, None)
    cache = _kv_avals(mesh, cfg.n_layers, 1, cfg.n_kv_heads, S,
                      cfg.head_dim, pipe=False)

    def fn(params, tokens, positions, cache):
        return llama_forward(params, cfg, tokens, positions, cache,
                             impl="xla", logits_last_only=True, mesh=mesh)

    tok = _rep(mesh, (1, 1), jnp.int32)
    t0 = time.time()
    lowered = jax.jit(fn).lower(params, tok, tok, cache)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    inv = collective_inventory(compiled.as_text())
    return {
        "config": f"mixtral-8x7B geometry, decode [1,1], EP={expert}(a2a) x "
                  f"TP={model}, S={S}, scan_layers",
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        "collectives": _summarize(inv),
        "collectives_detail": inv,
        "ok": True,
    }


# -- analytic scaling model --------------------------------------------------

# Hardware constants (v5e; all assumptions named so the projection can be
# re-derived when any of them moves):
HBM_BW = 750e9        # B/s achievable stream peak (MEASURED, kernel lab r4;
#                       sheet value is 819e9)
ICI_BW = 45e9         # B/s one-way per link (v5e 2D torus, public figure)
ICI_LAT = 1e-6        # s per collective hop on ICI
DCN_BW = 25e9         # B/s per host cross-host (sensitivity swept below)
DCN_LAT = 10e-6       # s per cross-host collective step
Q4KM_BYTES_PER_PARAM = 0.5625  # 4.5 bits/weight avg (Q4_K_M mix incl. q6 tensors)


def _ring_allreduce_time(bytes_, n, bw, lat):
    """Ring all-reduce: 2(n-1)/n of the buffer over the slowest link +
    2(n-1) latency hops."""
    if n <= 1:
        return 0.0
    return 2 * (n - 1) / n * bytes_ / bw + 2 * (n - 1) * lat


def scaling_model() -> dict:
    """Decode-step time budgets -> projected multi-host scaling efficiency.

    Definitions: a 'host' is a v5e-8 (8 chips, ICI inside, DCN between).
    Scaling efficiency at N hosts = throughput(N) / (N * throughput(1)),
    computed from per-chip step-time budgets. Two bounds per config:
    'no_overlap' serializes communication after compute; 'full_overlap'
    hides communication under the HBM weight stream up to its duration
    (XLA's latency-hiding scheduler + async collectives; the truth lies
    between, historically nearer full_overlap for decode whose per-layer
    all-reduce is tiny)."""
    from tpu_kquant.models.fixtures import llama3_70b_config, mixtral_8x7b_config

    out = {"constants": {
        "HBM_BW": HBM_BW, "ICI_BW": ICI_BW, "ICI_LAT": ICI_LAT,
        "DCN_BW": DCN_BW, "DCN_LAT": DCN_LAT,
        "q4km_bytes_per_param": Q4KM_BYTES_PER_PARAM,
    }}

    # ---- config #5: 70B, TP=8 inside each host, PP=N across hosts --------
    cfg = llama3_70b_config()
    D, F, L, V = cfg.dim, cfg.ffn_dim, cfg.n_layers, cfg.vocab_size
    params = L * (D * D * (1 + 1 / 4 + 1 / 4 + 1) + 3 * D * F) + 2 * V * D
    w_bytes = params * Q4KM_BYTES_PER_PARAM
    kv_bytes = L * 2 * cfg.n_kv_heads * cfg.head_dim * 8192 * 2  # S=8k bf16

    def host_step_time(n_hosts):
        tp = 8
        chips = tp * n_hosts
        # each host owns L/n_hosts layers (PP); inside, TP=8 shards weights
        t_hbm = (w_bytes / chips + kv_bytes / chips) / HBM_BW
        # 2 TP all-reduces per layer of [1, D] bf16, on this host's layers
        n_ar = 2 * (L // n_hosts)
        t_ici = n_ar * _ring_allreduce_time(D * 2, tp, ICI_BW, ICI_LAT)
        # PP boundary: one [1, D] bf16 activation hop per host boundary,
        # amortized over the microbatches in flight (throughput view)
        t_dcn = (D * 2 / DCN_BW + DCN_LAT) if n_hosts > 1 else 0.0
        return t_hbm, t_ici, t_dcn

    h1 = host_step_time(1)
    rows = {}
    M = 8  # microbatches in flight for the batch-wave bubble bound
    for n in (2, 4):
        hn = host_step_time(n)
        # PP throughput: stages work concurrently on different microbatches,
        # so per-token time is the max stage time (balanced stages here).
        # Under CONTINUOUS serving the pipeline never drains — steady state
        # has no bubble; a batch-wave workload pays the GPipe bubble
        # (n_stages-1)/(M+n_stages-1) instead. Both bounds recorded.
        bubble = (n - 1) / (M + n - 1)
        t1_no = sum(h1)
        tn_no = sum(hn)
        t1_ov = max(h1[0], h1[1]) + h1[2]
        tn_ov = max(hn[0], hn[1]) + hn[2]
        rows[f"{n}_hosts"] = {
            "per_chip_hbm_ms": round(hn[0] * 1e3, 3),
            "ici_ms": round(hn[1] * 1e3, 3),
            "dcn_ms": round(hn[2] * 1e3, 4),
            "eff_no_overlap_steady": round(t1_no / (n * tn_no), 4),
            "eff_full_overlap_steady": round(t1_ov / n / tn_ov, 4),
            f"eff_full_overlap_wave_M{M}": round(
                t1_ov / n / tn_ov * (1 - bubble), 4),
        }
    out["llama70b_tp8_ppN"] = {
        "total_weight_gb": round(w_bytes / 1e9, 1),
        "one_host": {"per_chip_hbm_ms": round(h1[0] * 1e3, 3),
                     "ici_ms": round(h1[1] * 1e3, 3)},
        "hosts": rows,
        "note": "PP splits layers across hosts: per-host HBM and the "
                "per-host share of TP all-reduces both halve at 2 hosts, "
                "DCN carries one activation hop per stage boundary — "
                "steady-state continuous serving projects >=99%; a drained "
                "batch wave with M=8 microbatches still clears 85%.",
    }

    # ---- config #4: Mixtral, EP=2 across hosts, TP=8 inside --------------
    m = mixtral_8x7b_config()
    D, F, L, E, K = m.dim, m.ffn_dim, m.n_layers, m.n_experts, m.n_experts_used
    attn_params = L * D * D * (1 + 1 / 4 + 1 / 4 + 1)
    exp_params = L * E * 3 * D * F
    head = 2 * m.vocab_size * D
    # decode reads only the K routed experts' FFN weights per token
    active_bytes = (attn_params + L * K * 3 * D * F + head) * Q4KM_BYTES_PER_PARAM

    # one host, EP x TP on ICI (the a2a pair stays on-chip-interconnect)
    t_hbm1 = active_bytes / 8 / HBM_BW
    t_ici1 = (2 * L * _ring_allreduce_time(D * 2, 2, ICI_BW, ICI_LAT)
              + L * 2 * (2 * K * D * 2 * 0.75 / ICI_BW + 2 * ICI_LAT))

    # placement A (naive): EP axis ACROSS the two hosts — every layer's
    # dispatch+combine a2a pays DCN latency twice. Recorded because it is
    # the placement config #4's wording suggests, and the model shows WHY
    # it must not be built that way.
    t_hbm2 = active_bytes / 16 / HBM_BW
    a2a_dcn = L * (2 * K * D * 2 * 0.5 / DCN_BW + 2 * DCN_LAT)
    effA_no = (t_hbm1 + t_ici1) / (2 * (t_hbm2 + t_ici1 + a2a_dcn))
    effA_ov = max(t_hbm1, t_ici1) / 2 / (max(t_hbm2, t_ici1) + a2a_dcn)

    # placement B (the design this repo ships): EP x TP INSIDE each host
    # (all expert/TP collectives on ICI), DP across hosts — the
    # continuous-batching scheduler splits requests over hosts and DCN
    # carries only request/token routing (amortized ~0 per token).
    # Throughput doubles; single-request latency is unchanged (that is
    # what DP means), which tokens/s scaling efficiency measures.
    effB_no = 1.0  # per-host step time identical, hosts independent
    effB_ov = 1.0

    out["mixtral_2hosts"] = {
        "active_weight_gb_per_tok": round(active_bytes / 1e9, 2),
        "one_host_ms": {"hbm": round(t_hbm1 * 1e3, 3),
                        "ici": round(t_ici1 * 1e3, 3)},
        "placement_A_ep_across_dcn": {
            "dcn_ms_per_tok": round(a2a_dcn * 1e3, 3),
            "eff_no_overlap": round(effA_no, 4),
            "eff_full_overlap": round(effA_ov, 4),
            "verdict": "REJECTED: 2x DCN latency per layer (64 x ~10us) "
                       "dominates the decode step — cross-host per-layer "
                       "a2a is latency-bound regardless of bandwidth",
            "dcn_sensitivity": {
                f"{bw/1e9:.1f}GBps": round(
                    max(t_hbm1, t_ici1) / 2
                    / (max(t_hbm2, t_ici1)
                       + L * (2 * K * D * 2 * 0.5 / bw + 2 * DCN_LAT)), 4)
                for bw in (12.5e9, 25e9, 50e9)
            },
        },
        "placement_B_ep_tp_in_host_dp_across": {
            "eff_no_overlap": effB_no,
            "eff_full_overlap": effB_ov,
            "verdict": "SHIPPED design: expert+tensor collectives ride ICI "
                       "(the overlapped-ICI-collectives requirement), hosts "
                       "serve disjoint batch rows (parallel.shard_cache "
                       "'data' axis + the mesh-aware ContinuousBatcher); "
                       "DCN per-token traffic is zero, so tokens/s scaling "
                       "efficiency at 2 hosts is bounded by load balance, "
                       "not interconnect — >=85% holds with any reasonable "
                       "admission spread",
        },
    }
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/perf/scale_ready_r5.json")
    ap.add_argument("--skip-aot", action="store_true")
    args = ap.parse_args(argv)

    res = {"devices": len(jax.devices()), "backend": jax.default_backend()}
    res["finding_global_fold_vs_row_tp"] = (
        "First lowering of the 70B TP x PP decode step showed XLA's SPMD "
        "partitioner implementing the packed-code unpack as SIX per-layer "
        "all_to_alls (75 MB/layer): the global bit fold pairs code k with "
        "k + K/2, so a row(K)-parallel shard cannot unpack locally. Fixed "
        "by quant.repack.refold_kmajor (shard-local fold, bit-exact, "
        "tests/test_refold.py); the inventories below are the post-fix "
        "HLO: 70B = 2 Megatron all-reduces per layer + 1 PP "
        "collective-permute, Mixtral = the dispatch/combine all_to_all "
        "pair only. Collectives inside the layer scan appear once in HLO; "
        "multiply by trip count when budgeting bytes.")
    res["scaling_model"] = scaling_model()
    if not args.skip_aot:
        print("AOT-lowering 70B TPxPP ...", flush=True)
        res["aot_70b"] = aot_70b()
        print(json.dumps(res["aot_70b"]["collectives"], indent=1))
        print("AOT-lowering Mixtral EPxTP (a2a) ...", flush=True)
        res["aot_mixtral"] = aot_mixtral()
        print(json.dumps(res["aot_mixtral"]["collectives"], indent=1))
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", args.out)
    return res


if __name__ == "__main__":
    main()
