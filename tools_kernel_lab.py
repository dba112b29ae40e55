#!/usr/bin/env python
"""Kernel-lab CLI: mutation-ladder + grid-sweep attribution for the hot
quantized-matmul kernels at exact model shapes (see
tpu_kquant/utils/kernel_lab.py — the llvm-mca / keep-loads-drop-ALU analog).

  python tools_kernel_lab.py --model tiny --tensor wqk
  python tools_kernel_lab.py --model tiny --tensor all --json-out artifacts/perf/kernel_lab_r4.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".cache" / "jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from tools_kernel_bench import MODELS, mk_q4, mk_q6w


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def tensors_for(model: str, rng):
    m = MODELS[model]
    D, H, Hkv, hd, F, V = m["D"], m["H"], m["Hkv"], m["hd"], m["F"], m["V"]
    return {
        # (QTensor, scale format)
        "wqk": (mk_q4((H + Hkv) * hd, D, rng), "sm"),
        "wv": (mk_q6w(Hkv * hd, D, rng), "sp"),
        "wo": (mk_q4(D, H * hd, rng), "sm"),
        "gu": (mk_q4(2 * F, D, rng), "sm"),
        "dn": (mk_q6w(D, F, rng), "sp"),
        "head": (mk_q6w(V, D, rng), "sp"),
    }


def main():
    from tpu_kquant.utils.kernel_lab import MODES, run_ladder

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny", choices=list(MODELS))
    ap.add_argument("--tensor", default="wqk",
                    help="wqk|wv|wo|gu|dn|head|all (comma-separable)")
    ap.add_argument("--rows", type=int, default=1)
    ap.add_argument("--modes", default=",".join(MODES))
    ap.add_argument("--tks", default="256,512,1024")
    ap.add_argument("--tns", default="256,512")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    zoo = tensors_for(args.model, rng)
    names = list(zoo) if args.tensor == "all" else args.tensor.split(",")
    rows = []
    for name in names:
        qt, s_fmt = zoo[name]
        log(f"=== {args.model} {name}: {qt.kind} {qt.shape} ({s_fmt}) ===")
        rs = run_ladder(
            qt, s_fmt, R=args.rows,
            tks=tuple(int(t) for t in args.tks.split(",")),
            tns=tuple(int(t) for t in args.tns.split(",")),
            modes=tuple(args.modes.split(",")),
            log=log, reps=args.reps)
        for r in rs:
            r["tensor"] = name
            r["model"] = args.model
        rows += rs
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(rows, indent=1))
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
