"""One-off: measure lax.fori_loop per-iteration overhead on the real TPU
with a trivial body, varying N — slope = per-iteration cost."""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
jax.config.update("jax_compilation_cache_dir", str(REPO / ".cache" / "jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("devices:", jax.devices(), file=sys.stderr)


def run_n(N):
    @jax.jit
    def f(x):
        def body(i, acc):
            return acc * 1.000001 + x[i % 8]

        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    x = jnp.arange(8, dtype=jnp.float32)
    float(f(x))  # compile+warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


for N in (1, 100, 1000, 10000):
    t = run_n(N)
    print(f"N={N:6d}: {t*1e3:9.3f} ms total")

# same with a small matmul in the body
def run_mm(N, dim):
    @jax.jit
    def f(w, x):
        def body(i, v):
            return jnp.tanh(w @ v)

        return jax.lax.fori_loop(0, N, body, x)

    w = jnp.ones((dim, dim), jnp.bfloat16) * 0.01
    x = jnp.ones((dim,), jnp.bfloat16)
    jax.block_until_ready(f(w, x))
    float(jnp.sum(f(w, x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(f(w, x)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


for N in (10, 100, 1000):
    t = run_mm(N, 512)
    print(f"matmul512 N={N:5d}: {t*1e3:9.3f} ms total ({t/N*1e6:.1f} us/it)")
