"""One-off: attribute decode-step time by ablating components of the fused
128-step loop. Each variant is ONE dispatch (tunnel RTT ~22.5 ms amortizes
over 128 steps); variant deltas vs full = component cost.

Variants:
  full        — the bench path
  no_attn     — attention_decode returns q (no KV reads, no softmax)
  no_kvwrite  — append_layer is a no-op (no cache scatter)
  no_ffn      — FFN block skipped (gateup+down matmuls gone: ~572 MB/step)
  no_attnproj — wqk/wv/wo matmuls replaced by slices of h
  small_head  — lm head replaced by a [256, dim] head
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
jax.config.update("jax_compilation_cache_dir", str(REPO / ".cache" / "jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpu_kquant.runtime import InferenceEngine, load_model

MODEL = REPO / ".cache" / "tinyllama-1.1b-q4_k_m.gguf"
for i, a in enumerate(sys.argv):
    if a == "--model" and i + 1 < len(sys.argv):
        MODEL = Path(sys.argv[i + 1])
cfg, params, _ = load_model(str(MODEL), scale_dtype="bf16")
print(f"loaded {cfg.arch} L={cfg.n_layers}", file=sys.stderr)

import tpu_kquant.models.llama as mllama
import tpu_kquant.runtime.kv_cache as mkv
from tpu_kquant.ops import qmatmul

orig_attn = mllama.attention_decode
orig_append = mkv.append_layer
orig_qmatmul = mllama.qmatmul

N_STEPS = 128
B = 1
MAX_SEQ = 704


def run_variant(name, patch=None, head_vocab=0):
    import tpu_kquant.models.llama as L

    L.attention_decode = orig_attn
    # llama.py imports append_layer inside llama_layer from runtime.kv_cache
    mkv.append_layer = orig_append
    L.qmatmul = orig_qmatmul
    p = dict(params)
    if head_vocab:
        from tpu_kquant.quant.qtensor import QTensor

        qt = params["output"]
        arrs = {}
        for k, v in qt.arrays.items():
            a = np.asarray(v)
            # kmajor arrays are [..., N] with N = vocab; slice the N axis
            arrs[k] = jnp.asarray(a[..., :head_vocab * a.shape[-1] // qt.shape[0]])
        p["output"] = QTensor(qt.kind, qt.layout, (head_vocab, qt.shape[-1]), arrs)
    if patch:
        patch(L)
    eng = InferenceEngine(cfg, p, max_batch=B, max_seq=MAX_SEQ, impl="auto")
    cache = eng.new_cache(B)
    tok = jnp.full((B,), 100, jnp.int32)
    pos = jnp.full((B,), 512, jnp.int32)
    # warm/compile
    toks, cache = eng.decode_greedy_jit(tok, pos, cache, N_STEPS)
    float(jnp.sum(toks))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        toks, cache = eng.decode_greedy_jit(tok, pos + N_STEPS, cache, N_STEPS)
        float(jnp.sum(toks))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name:12s}: {t*1e3:8.1f} ms  ({t/N_STEPS*1e3:6.3f} ms/tok, {N_STEPS/t:6.0f} tok/s)")
    return t


def patch_no_attn(L):
    L.attention_decode = lambda q, k, v, pos, scales=None, **kw: q.astype(q.dtype)


def patch_no_kvwrite(L):
    mkv.append_layer = lambda lkv, k, v, positions: lkv


def patch_no_ffn(L):
    def qm(h, w, impl, **kw):
        # kill only the FFN matmuls (gateup: N=2F; down: K=F)
        N, K = w.shape[-2], w.shape[-1]
        if N == 2 * cfg.ffn_dim or K == cfg.ffn_dim:
            return jnp.zeros(h.shape[:-1] + (N,), kw.get("out_dtype", h.dtype))
        return orig_qmatmul(h, w, impl, **kw)

    L.qmatmul = qm


def patch_no_attnproj(L):
    H, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    def qm(h, w, impl, **kw):
        N, K = w.shape[-2], w.shape[-1]
        if N in ((H + Hkv) * D, Hkv * D, cfg.dim) and K in (cfg.dim, H * D) \
                and N != 2 * cfg.ffn_dim and w.shape[0] != cfg.vocab_size:
            reps = -(-N // h.shape[-1])
            return jnp.tile(h, (1, 1, reps))[..., :N].astype(kw.get("out_dtype", h.dtype))
        return orig_qmatmul(h, w, impl, **kw)

    L.qmatmul = qm


t_full = run_variant("full")
t_na = run_variant("no_attn", patch_no_attn)
t_nw = run_variant("no_kvwrite", patch_no_kvwrite)
t_nf = run_variant("no_ffn", patch_no_ffn)
t_np = run_variant("no_attnproj", patch_no_attnproj)
t_sh = run_variant("small_head", head_vocab=256)

print("\n--- attribution (ms/tok) ---")
for nm, t in (("attention", t_full - t_na), ("kv write", t_full - t_nw),
              ("ffn matmuls", t_full - t_nf), ("attn proj matmuls", t_full - t_np),
              ("lm head", t_full - t_sh)):
    print(f"{nm:18s} {(t)/N_STEPS*1e3:7.3f}")
print(f"{'full step':18s} {t_full/N_STEPS*1e3:7.3f}")


# --- extra variants: XLA-glue attribution (norms / rope / argmax) ---------
def patch_no_norms(L):
    L.rms_norm = lambda x, w, eps: x


def patch_no_rope(L):
    L.apply_rope = lambda x, cos, sin, mode: x


if "--glue" in sys.argv:
    import tpu_kquant.models.llama as L

    orig_norm, orig_rope = L.rms_norm, L.apply_rope
    t_nn = run_variant("no_norms", patch_no_norms)
    L.rms_norm = orig_norm
    t_nr = run_variant("no_rope", patch_no_rope)
    L.apply_rope = orig_rope
    print(f"norms: {(t_full-t_nn)/N_STEPS*1e3:7.3f} ms/tok")
    print(f"rope : {(t_full-t_nr)/N_STEPS*1e3:7.3f} ms/tok")
