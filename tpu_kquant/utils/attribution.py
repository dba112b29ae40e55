"""Per-kernel attribution harness: marginal timing + roofline reporting.

The built-in analog of the reference's perf-annotate / per-instruction
attribution discipline (SURVEY.md §5, §7: the ≥90%-of-roofline north star
"needs this built-in, not bolted-on"). The root-level drivers
(`tools_kernel_bench.py`, `tools_ablate_decode.py`) are thin CLIs over this
module.

Methodology (why marginal timing): over a tunneled dev TPU every dispatch
pays a fixed ~22 ms RTT that a real TPU VM does not; per-call wall timing is
therefore useless for µs-scale kernels. `time_chained` runs n and 2n chained
invocations inside ONE jitted `lax.scan` dispatch and differences them — the
fixed cost cancels exactly, the same estimator the headline bench uses for
its tg/pp marginal rates. A data dependency through the activation defeats
CSE/DCE; weights travel as jit ARGUMENTS because closure constants are
serialized into remote-compile requests (HTTP 413 on GB-scale tensors).
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import jax.numpy as jnp

from tpu_kquant.utils.roofline import CHIP_SPECS


def dep(carry: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Fold ``y`` into the timing carry without measurable cost (un-DCE-able
    scaled sum)."""
    return carry + (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(carry.dtype)


def time_chained(fn: Callable, x0: jnp.ndarray, n_iter: int, reps: int = 3,
                 aux: tuple = ()) -> float:
    """MARGINAL seconds per ``fn`` application (see module docstring).

    fn is called as fn(x) when aux is empty, else fn(x, aux); it must return
    the next carry (use ``dep`` to fold outputs in).
    """
    call = (lambda x: fn(x)) if aux == () else (lambda x: fn(x, aux_ref[0]))
    aux_ref = [aux]

    def make_loop(length):
        @jax.jit
        def loop(x, aux_in):
            def body(x, _):
                aux_ref[0] = aux_in
                return call(x), ()

            x, _ = jax.lax.scan(body, x, None, length=length)
            return jnp.sum(x.astype(jnp.float32))

        return loop

    loop1, loop2 = make_loop(n_iter), make_loop(2 * n_iter)
    float(loop1(x0, aux))  # compile + warm
    float(loop2(x0, aux))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop1(x0, aux))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(loop2(x0, aux))
        t2s.append(time.perf_counter() - t0)
    return max(min(t2s) - min(t1s), 1e-9) / n_iter


def chain_length_for(nbytes: int, target_s: float = 0.03,
                     chip: str = "v5e") -> int:
    """Chain length so the marginal diff is ≥ ~target_s of pure kernel time
    at the HBM roofline — far above the tunnel's rep-to-rep jitter."""
    hbm_gbs = CHIP_SPECS.get(chip, CHIP_SPECS["v5e"])[0]
    t_ideal = nbytes / (hbm_gbs * 1e9)
    return int(min(2048, max(32, target_s / t_ideal)))


def kernel_report(name: str, seconds: float, nbytes: int, flops: float = 0.0,
                  chip: str = "v5e", log: Callable[..., Any] | None = None
                  ) -> dict:
    """One attribution row: achieved GB/s + fraction of the HBM and MXU
    rooflines for the given chip generation."""
    hbm_gbs, tflops = CHIP_SPECS.get(chip, CHIP_SPECS["v5e"])
    gbs = nbytes / seconds / 1e9
    frac = gbs / hbm_gbs
    mxu = flops / seconds / 1e12 / tflops if flops else 0.0
    if log is not None:
        log(f"{name:28s} {seconds*1e6:9.1f} us  {nbytes/1e6:8.1f} MB  "
            f"{gbs:7.1f} GB/s  {frac*100:5.1f}% HBM  {mxu*100:5.1f}% MXU")
    return {"kernel": name, "us": round(seconds * 1e6, 1),
            "mb": round(nbytes / 1e6, 1), "gbs": round(gbs, 1),
            "hbm_frac": round(frac, 3), "mxu_frac": round(mxu, 3)}
