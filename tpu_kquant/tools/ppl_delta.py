"""Quantization-quality harness: perplexity delta between precisions.

The north-star quality gate (BASELINE.json): Q4_K_M must stay within
llama.cpp's ~+0.05 ppl of fp16 on wikitext-2. Given a high-precision GGUF
and a text file, this requantizes to the target recipe and reports both
perplexities and the delta.

  python -m tpu_kquant.tools.ppl_delta --model f16.gguf --text wiki.txt \
      --type q4_k_m --ctx 512
"""

from __future__ import annotations

import argparse
import tempfile
from pathlib import Path


def ppl_of(model_path: str, ids, ctx: int, max_windows, impl: str) -> float:
    from tpu_kquant.runtime import InferenceEngine, load_model
    from tpu_kquant.tools.perplexity import perplexity

    cfg, params, reader = load_model(model_path)
    eng = InferenceEngine(cfg, params, max_batch=1, max_seq=ctx, impl=impl)
    res = perplexity(eng, ids, ctx=ctx, max_windows=max_windows)
    reader.close()
    return res["ppl"]


def main(argv=None):
    ap = argparse.ArgumentParser(description="ppl delta across quantizations")
    ap.add_argument("--model", required=True, help="high-precision GGUF (f16/f32)")
    ap.add_argument("--text", required=True)
    ap.add_argument("--type", default="q4_k_m")
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--max-windows", type=int, default=None)
    ap.add_argument("--impl", default="auto")
    args = ap.parse_args(argv)

    from tpu_kquant.gguf import GGUFReader
    from tpu_kquant.tokenizer import from_gguf_metadata
    from tpu_kquant.tools.quantize import requantize

    with GGUFReader(args.model) as r:
        tok = from_gguf_metadata(r.metadata)
    ids = tok.encode(open(args.text, encoding="utf-8").read(), add_bos=True)

    base_ppl = ppl_of(args.model, ids, args.ctx, args.max_windows, args.impl)
    with tempfile.TemporaryDirectory() as td:
        qpath = str(Path(td) / "q.gguf")
        requantize(args.model, qpath, args.type, verbose=False)
        q_ppl = ppl_of(qpath, ids, args.ctx, args.max_windows, args.impl)

    print(f"base ppl   : {base_ppl:.4f}")
    print(f"{args.type:10s}: {q_ppl:.4f}")
    print(f"delta      : {q_ppl - base_ppl:+.4f}")
    return q_ppl - base_ppl


if __name__ == "__main__":
    main()
