#!/usr/bin/env python
"""True-scale end-to-end validation against a transformers oracle.

VERDICT r1 missing-item 1: all prior validation ran on synthesized fixtures
or 2-layer toys. This tool builds a TinyLlama-1.1B-architecture HF
LlamaForCausalLM at FULL scale (randomly initialized — zero-egress; the
reference's real checkpoint differs only in the weight values, not in any
convention this chain can get wrong), plus a byte-level BPE tokenizer trained
in-environment, then runs the ENTIRE chain through our stack and checks every
stage against torch/transformers as oracle:

  1. tokenizer: our GGUF-metadata BPE vs the HF fast tokenizer — exact ids
  2. conversion: tools/convert_hf.py HF -> GGUF f16 (incl. embedded tokenizer)
  3. logits: engine prefill vs torch forward — correlation + argmax
  4. generation: greedy engine.generate vs HF model.generate token-for-token
  5. perplexity: our sliding-window ppl vs a torch-computed oracle ppl
  6. quantization: ppl after requantize to Q4_K_M (error-minimizing search)

Writes E2E_ORACLE.md with the measured table. Exit 1 on any gate failure.

  python tools_e2e_oracle.py [--layers 22] [--gen 32] [--ppl-windows 2]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "Hello, world! ¿Cómo estás? 今日はいい天気ですね。",
    "In 2024, the GDP grew by 3.5% — surprising    analysts.",
    "def fib(n):\n    return n if n < 2 else fib(n-1) + fib(n-2)\n",
    "Tabs\tand\nnewlines  and   multiple    spaces.",
    "Ελληνικά русский العربية 한국어",
    "I'm can't won't you'll they've it's o'clock",
    "x==y != z <= w >= v ... !!! ??? #hashtag @mention",
]


def build_hf_checkpoint(out_dir: Path, n_layers: int, seed: int = 0):
    """Random-init TinyLlama-1.1B-architecture HF model + trained tokenizer."""
    import json

    import tokenizers
    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import LlamaConfig, LlamaForCausalLM

    from tpu_kquant.tokenizer.bpe import PRE_PATTERNS

    # --- tokenizer: byte-level BPE w/ the llama-3 pre-tokenizer ---
    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(tokenizers.Regex(PRE_PATTERNS["llama3"]),
                             behavior="isolated"),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    trainer = trainers.BpeTrainer(
        vocab_size=32000, special_tokens=["<s>", "</s>"], show_progress=False,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    train_text = CORPUS * 50 + [
        f"sentence number {i} about {w} and {w2}."
        for i, (w, w2) in enumerate(
            zip(["cats", "dogs", "cars", "ships"] * 250,
                ["red", "blue", "green", "gold"] * 250))
    ]
    tok.train_from_iterator(train_text, trainer)

    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_hidden_layers=n_layers, num_attention_heads=32,
        num_key_value_heads=4, max_position_embeddings=2048,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        bos_token_id=0, eos_token_id=1,
    )
    torch.manual_seed(seed)
    model = LlamaForCausalLM(cfg)
    model.eval()
    out_dir.mkdir(parents=True, exist_ok=True)
    model.save_pretrained(str(out_dir), safe_serialization=True)
    tok.save(str(out_dir / "tokenizer.json"))
    (out_dir / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "PreTrainedTokenizerFast",
         "bos_token": "<s>", "eos_token": "</s>"}))
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=22)
    ap.add_argument("--gen", type=int, default=32)
    ap.add_argument("--ppl-windows", type=int, default=2)
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--skip-q4", action="store_true")
    ap.add_argument("--out", default=str(REPO / "E2E_ORACLE.md"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".cache" / "jax_cc"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import torch
    from transformers import PreTrainedTokenizerFast

    from tpu_kquant.runtime import InferenceEngine, load_model
    from tpu_kquant.tokenizer import from_gguf_metadata
    from tpu_kquant.tools.convert_hf import convert

    hf_dir = REPO / ".cache" / "e2e-hf-tinyllama"
    t0 = time.time()
    if not (hf_dir / "model.safetensors").exists():
        log(f"building random-init {args.layers}-layer TinyLlama HF checkpoint...")
        model = build_hf_checkpoint(hf_dir, args.layers)
    else:
        from transformers import LlamaForCausalLM

        model = LlamaForCausalLM.from_pretrained(str(hf_dir))
        model.eval()
    log(f"HF checkpoint ready in {time.time()-t0:.0f}s "
        f"({sum(p.numel() for p in model.parameters())/1e9:.2f}B params)")

    hf_tok = PreTrainedTokenizerFast(tokenizer_file=str(hf_dir / "tokenizer.json"),
                                     bos_token="<s>", eos_token="</s>")

    gguf_f16 = REPO / ".cache" / "e2e-tinyllama-f16.gguf"
    if not gguf_f16.exists():
        t0 = time.time()
        convert(str(hf_dir), str(gguf_f16), recipe="f16", verbose=False)
        log(f"converted to GGUF f16 in {time.time()-t0:.0f}s")

    results: list[tuple[str, str, bool]] = []

    # --- 1. tokenizer parity --------------------------------------------------
    from tpu_kquant.gguf import GGUFReader

    with GGUFReader(str(gguf_f16)) as r:
        ours_tok = from_gguf_metadata(r.metadata)
    n_match = 0
    for text in CORPUS:
        ours = ours_tok.encode(text, add_bos=False)
        hf = hf_tok.encode(text, add_special_tokens=False)
        if ours == hf:
            n_match += 1
        else:
            log(f"TOKENIZER MISMATCH on {text!r}:\n  ours {ours}\n  hf   {hf}")
    ok = n_match == len(CORPUS)
    results.append(("tokenizer ids (GGUF-embedded vs HF fast)",
                    f"{n_match}/{len(CORPUS)} texts exact", ok))
    log(f"tokenizer: {n_match}/{len(CORPUS)} exact")

    # --- 2+3. logit parity at true scale -------------------------------------
    cfg, params, reader = load_model(str(gguf_f16))
    eng = InferenceEngine(cfg, params, max_batch=1,
                          max_seq=args.ctx + args.gen + 8)
    prompt_text = " ".join(CORPUS[:4])
    ids = ours_tok.encode(prompt_text, add_bos=True)[: args.ctx // 2]
    log(f"prompt: {len(ids)} tokens; engine prefill on {jax.default_backend()}...")
    t0 = time.time()
    logits, cache, lens = eng.prefill([ids], eng.new_cache(1))
    ours_last = np.asarray(logits[0], np.float64)
    log(f"engine prefill {time.time()-t0:.1f}s")
    t0 = time.time()
    with torch.no_grad():
        hf_out = model(torch.tensor([ids])).logits[0].numpy()
    log(f"torch forward {time.time()-t0:.1f}s")
    want_last = hf_out[-1].astype(np.float64)
    corr = float((ours_last * want_last).mean()
                 / np.sqrt((ours_last ** 2).mean() * (want_last ** 2).mean()))
    am = int(np.argmax(ours_last)) == int(np.argmax(want_last))
    ok = corr > 0.999 and am
    results.append(("logit parity (1.1B f16 GGUF vs torch f32)",
                    f"corr {corr:.5f}, argmax {'match' if am else 'MISMATCH'}", ok))
    log(f"logits: corr {corr:.5f} argmax match={am}")

    # --- 4. greedy generation (teacher-forced agreement) ----------------------
    # On a RANDOM-init model the top-2 logit gap is razor thin, and exact
    # greedy-trajectory comparison is ill-conditioned BY CONSTRUCTION: HF's
    # own model.generate (incremental KV path) disagrees with HF's own
    # non-cached forward argmax on the very first token (measured r3:
    # 18520 vs 1885 — and OUR engine matches the forward's 1885). The honest
    # check is therefore teacher-forced: run ONE HF forward over
    # [prompt + our greedy continuation] and count steps where our token is
    # HF's argmax OR within a near-tie logit gap of it.
    t0 = time.time()
    ours_gen = eng.generate([ids], max_new_tokens=args.gen, temperature=0.0)[0]
    log(f"engine generate {time.time()-t0:.1f}s")
    t0 = time.time()
    with torch.no_grad():
        full = ids + ours_gen
        lg = model(torch.tensor([full])).logits[0].float()
    log(f"torch teacher-forced forward {time.time()-t0:.1f}s")
    n_exact = n_tie = 0
    gaps = []
    for i, tok_i in enumerate(ours_gen):
        step_logits = lg[len(ids) - 1 + i]
        top = int(torch.argmax(step_logits))
        gap = float(step_logits.max() - step_logits[tok_i])
        gaps.append(gap)
        if top == tok_i:
            n_exact += 1
        elif gap < 0.15:  # near-tie: the engine computes in bf16 (~2^-8
            # relative), so logits of magnitude ~10 carry ~0.04-0.08 of
            # legitimate numerics noise; a sub-0.15 gap is not a wrong token
            n_tie += 1
    ok = (n_exact + n_tie) == len(ours_gen)
    results.append((
        "greedy generation vs torch (teacher-forced)",
        f"{n_exact}/{args.gen} exact argmax + {n_tie} near-ties "
        f"(max logit gap {max(gaps):.4f})", ok))
    log(f"greedy teacher-forced: {n_exact} exact + {n_tie} near-ties / "
        f"{args.gen}; max gap {max(gaps):.4f}")

    # --- 5. perplexity vs torch oracle ---------------------------------------
    from tpu_kquant.tools.perplexity import perplexity

    eval_text = "\n".join(CORPUS * 8)
    eval_ids = ours_tok.encode(eval_text, add_bos=True)
    need = args.ppl_windows * args.ctx + 1
    eval_ids = (eval_ids * (need // len(eval_ids) + 1))[:need]
    t0 = time.time()
    res = perplexity(eng, eval_ids, ctx=args.ctx, max_windows=args.ppl_windows)
    ours_ppl = res["ppl"]
    log(f"engine ppl {ours_ppl:.4f} in {time.time()-t0:.1f}s")
    t0 = time.time()
    total_nll, total_cnt = 0.0, 0
    with torch.no_grad():
        for wstart in range(0, args.ppl_windows * args.ctx, args.ctx):
            w = eval_ids[wstart: wstart + args.ctx]
            if len(w) < 2:
                break
            lg = model(torch.tensor([w])).logits[0].float()
            lp = torch.log_softmax(lg[:-1], dim=-1)
            tgt = torch.tensor(w[1:])
            total_nll += float(-lp.gather(1, tgt[:, None]).sum())
            total_cnt += len(w) - 1
    torch_ppl = float(np.exp(total_nll / total_cnt))
    log(f"torch ppl {torch_ppl:.4f} in {time.time()-t0:.1f}s")
    rel = abs(ours_ppl - torch_ppl) / torch_ppl
    ok = rel < 0.01
    results.append(("perplexity vs torch oracle",
                    f"ours {ours_ppl:.4f} vs torch {torch_ppl:.4f} "
                    f"({rel*100:.2f}% rel)", ok))

    # --- 6. Q4_K_M quantization quality at true scale ------------------------
    if not args.skip_q4:
        from tpu_kquant.tools.quantize import requantize

        q4path = REPO / ".cache" / "e2e-tinyllama-q4km.gguf"
        if not q4path.exists():
            t0 = time.time()
            requantize(str(gguf_f16), str(q4path), "q4_k_m", verbose=False)
            log(f"requantized to Q4_K_M in {time.time()-t0:.0f}s")
        cfg4, params4, r4 = load_model(str(q4path), scale_dtype="bf16")
        eng4 = InferenceEngine(cfg4, params4, max_batch=1,
                               max_seq=args.ctx + args.gen + 8)
        res4 = perplexity(eng4, eval_ids, ctx=args.ctx,
                          max_windows=args.ppl_windows)
        dppl = res4["ppl"] - ours_ppl
        # random-init weights quantize harder than trained ones (no outlier
        # structure); the gate here is "small relative delta", the trained-
        # model gate lives in the ppl_delta harness
        rel4 = dppl / ours_ppl
        ok = abs(rel4) < 0.05
        results.append(("Q4_K_M ppl delta at 1.1B (random weights)",
                        f"f16 {ours_ppl:.4f} -> q4_k_m {res4['ppl']:.4f} "
                        f"({rel4*100:+.2f}%)", ok))
        log(f"q4_k_m ppl {res4['ppl']:.4f} (delta {dppl:+.4f})")
        r4.close()

    reader.close()

    # --- report ---------------------------------------------------------------
    lines = [
        "# E2E oracle validation — true-scale chain vs transformers",
        "",
        f"Random-init TinyLlama-1.1B architecture ({args.layers} layers), "
        "byte-level BPE tokenizer trained in-environment, converted with "
        "`tools/convert_hf.py` (tokenizer embedded in GGUF). Engine on "
        f"`{jax.default_backend()}`; oracle = torch/transformers f32 on CPU.",
        "",
        "| stage | result | pass |",
        "|---|---|---|",
    ]
    all_ok = True
    for name, detail, ok in results:
        lines.append(f"| {name} | {detail} | {'✅' if ok else '❌'} |")
        all_ok &= ok
    Path(args.out).write_text("\n".join(lines) + "\n")
    log(f"wrote {args.out}")
    for name, detail, ok in results:
        log(f"{'PASS' if ok else 'FAIL'}  {name}: {detail}")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
