"""One-off: decode-step time breakdown on the real TPU.

The axon tunnel adds ~27 ms per dispatch, so per-call timing is useless —
instead each op runs N times inside ONE jitted lax.fori_loop (input perturbed
per iteration so XLA cannot hoist the kernel), and per-iteration time =
(loop_time - dispatch_overhead) / N. Bandwidth = weight bytes / iter time.
"""

import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
jax.config.update("jax_compilation_cache_dir", str(REPO / ".cache" / "jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpu_kquant.ops.qmatmul import qmatmul
from tpu_kquant.runtime import InferenceEngine, load_model
from tpu_kquant.utils.profiling import timed

MODEL = REPO / ".cache" / "tinyllama-1.1b-q4_k_m.gguf"
cfg, params, _ = load_model(str(MODEL), scale_dtype="bf16")
print(f"loaded {cfg.arch} L={cfg.n_layers}", file=sys.stderr)

N = 100
B = 1
layer = params["layers"][0]


def loop_op(op, x0):
    @jax.jit
    def run(x0):
        def body(i, acc):
            x = x0 + (i.astype(jnp.bfloat16) * 1e-8)
            return acc + op(x).astype(jnp.float32).ravel()[:8]

        return jax.lax.fori_loop(0, N, body, jnp.zeros(8, jnp.float32))

    t, _ = timed(run, x0, warmup=2, reps=4)
    return t


# measure dispatch overhead: trivial loop
t_null = loop_op(lambda x: x[..., :8] * 2.0, jnp.ones((B, 1, 64), jnp.bfloat16))
print(f"null loop total: {t_null*1e3:.2f} ms")

rows = []
tot = 0.0
for name in ("wqk", "wv", "wo", "w_gateup", "w_down"):
    qt = layer[name]
    K = qt.shape[-1]
    xin = jnp.ones((B, 1, K), jnp.bfloat16)
    t = loop_op(lambda x, q=qt: qmatmul(x, q, "auto"), xin)
    per = t / N
    gbps = qt.n_bytes / per / 1e9
    print(f"{name:10s} {str(qt.shape):>14s} {qt.n_bytes/1e6:7.1f} MB  {per*1e6:7.1f} us/it  {gbps:6.0f} GB/s")
    rows.append((name, per))
    tot += per

print(f"per-layer matmuls: {tot*1e6:.1f} us -> x22 = {tot*22*1e3:.3f} ms")

qt = params["output"]
t = loop_op(lambda x, q=qt: qmatmul(x, q, "auto", out_dtype=jnp.float32),
            jnp.ones((B, 1, qt.shape[-1]), jnp.bfloat16))
print(f"lm_head    {str(qt.shape):>14s} {qt.n_bytes/1e6:7.1f} MB  {t/N*1e6:7.1f} us/it  {qt.n_bytes/(t/N)/1e9:6.0f} GB/s")
lm = t / N

from tpu_kquant.ops.attention import attention_decode

S = 2048
kc = jnp.ones((B, S, cfg.n_kv_heads, cfg.head_dim), jnp.bfloat16)
vc = jnp.ones((B, S, cfg.n_kv_heads, cfg.head_dim), jnp.bfloat16)
pos = jnp.full((B, 1), S - 1, jnp.int32)


def attn_op(q4):
    q = q4.reshape(B, 1, cfg.n_heads, cfg.head_dim)
    return attention_decode(q, kc, vc, pos)


t = loop_op(attn_op, jnp.ones((B, 1, cfg.n_heads * cfg.head_dim), jnp.bfloat16))
attn = t / N
kvb = 2 * S * cfg.n_kv_heads * cfg.head_dim * 2
print(f"attention S={S}: {attn*1e6:.1f} us/it ({kvb/1e6:.1f} MB KV -> {kvb/attn/1e9:.0f} GB/s) -> x22 = {attn*22*1e3:.3f} ms")

# full fused decode loop (the bench path): 128 steps in one dispatch
eng = InferenceEngine(cfg, params, max_batch=B, max_seq=S, impl="auto")
cache = eng.new_cache(B)
tok = jnp.zeros((B,), jnp.int32)
p1 = jnp.full((B,), 100, jnp.int32)
t, _ = timed(lambda c: eng.decode_greedy_jit(tok, p1, c, 128), cache, warmup=1, reps=2)
print(f"fused 128-step decode: {t*1e3:.1f} ms = {t/128*1e3:.3f} ms/tok ({128/t:.0f} tok/s)")
print(f"sum of parts: matmuls {tot*22*1e3:.3f} + attn {attn*22*1e3:.3f} + lm {lm*1e3:.3f} ms = {(tot*22+attn*22+lm)*1e3:.3f} ms")
