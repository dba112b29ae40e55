"""In-kernel pipeline-analysis instrument: mutation-variant ladder + grid
sweeps for the quantized-matmul Pallas kernels.

The TPU analog of the reference's llvm-mca timeline analysis and its
keep-loads/drop-ALU mutation experiments (/root/reference/README.md:880-1098,
:1108-1420 — where IPC/RThroughput tables and load-only/ALU-only kernel
variants localized the NEON hot loop's bottleneck to a register-domain
crossing). Here the question is the same one level up: a megakernel at 41%%
of the HBM roofline is losing time to (a) DMA/pipeline bubbles, (b) the VPU
dequant chain, or (c) MXU/accumulation — and whole-kernel µs can't say
which.

The instrument is a single parametric kernel that reproduces the production
kernels' exact grid geometry (K-chunked with accumulator carry, the
pallas_attn_in/oproj shape; or N-tiled with direct tile writes) but whose
body is a MUTATION LADDER — each mode adds one stage of the real pipeline:

  dma      raw packed bytes -> int8 MXU dot with a ones vector
           (consumes every byte; ~zero VPU work) = DMA + launch floor
  extract  + nibble extraction (q4_codes_word) -> int8 dot
  convert  + i8 -> bf16 lane convert -> bf16 dot
  full     + f32 group scale/min dequant chain (the production body)
  bf16c    alternative: scale/min chain computed in bf16 (candidate
           replacement — halves dequant temporary width)

Differencing adjacent rungs attributes µs to each stage; sweeping TK/TN and
geometry attributes the rest to the grid pipeline itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_kquant.ops.pallas_dequant import (
    group_scale_dot,
    group_scale_mul_sp,
    group_scale_mulsub,
    q4_codes_word,
)
from tpu_kquant.quant.qtensor import QTensor
from tpu_kquant.quant.repack import GROUP_SIZE

# gdot (r5): the full chain but with the scale applied per GROUP after a
# masked block-diagonal dot (pallas_dequant.group_scale_dot) — candidate
# replacement for the per-element scale-mul, the chain's dominant VPU term
MODES = ("dma", "extract", "convert", "bf16c", "full", "gdot")

_VMEM_LIMIT = 100 * 1024 * 1024


def _decode_sm(sm_block, dtype=jnp.float32):
    bits = jax.lax.bitcast_convert_type(sm_block, jnp.int32)
    s = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
    m = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
    return s.astype(dtype), m.astype(dtype)


def _mm(x, w, out=jnp.float32):
    return jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=out)


def _dequant_fold(kind, s_fmt, qs_ref, s_ref, hi, g, mode):
    """One fold's dequantized [TK, N] weight tile in the given mode's dtype
    ladder. Returns (weight_tile, dtype_tag)."""
    if kind == "q4":
        codes = q4_codes_word(qs_ref[:], bool(hi))
    else:  # flat kinds: codes are the block itself
        codes = qs_ref[:]
    if mode == "extract":
        return codes, "i8"
    if mode == "convert":
        return codes.astype(jnp.bfloat16), "bf16"
    if mode == "bf16c":
        q = codes.astype(jnp.bfloat16)
        if s_fmt == "sm":
            s, m = _decode_sm(s_ref[:], jnp.bfloat16)
            TK, TN = q.shape
            w = (q.reshape(TK // g, g, TN) * s[:, None, :]
                 - m[:, None, :]).reshape(TK, TN)
        elif s_fmt == "sp":
            w = group_scale_mul_sp(q.astype(jnp.float32), s_ref[:], g
                                   ).astype(jnp.bfloat16)
        else:
            TK, TN = q.shape
            w = (q.reshape(TK // g, g, TN)
                 * s_ref[:].astype(jnp.bfloat16)[:, None, :]).reshape(TK, TN)
        return w, "bf16"
    # full: the production f32 chain
    q = codes.astype(jnp.float32)
    if s_fmt == "sm":
        s, m = _decode_sm(s_ref[:])
        w = group_scale_mulsub(q, s, m, g)
    elif s_fmt == "sp":
        w = group_scale_mul_sp(q, s_ref[:], g)
    else:
        w = group_scale_mulsub(q, s_ref[:].astype(jnp.float32), None, g)
    return w.astype(jnp.bfloat16), "bf16"


def _kgrid_kernel(mode, kind, s_fmt, TK2, nk, g, *refs):
    """K-chunked grid with accumulator carry — pallas_attn_in geometry."""
    it = iter(refs)
    x_lo = next(it)
    x_hi = next(it)
    xi8 = next(it)
    if kind == "q4":
        qs = (next(it),)
    else:
        qs = (next(it), next(it))
    have_s = mode in ("bf16c", "full", "gdot")
    s = (next(it), next(it)) if have_s else (None, None)
    out = next(it)
    acc = next(it)

    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    if mode == "gdot":
        from tpu_kquant.ops.pallas_dequant import sp_scales

        contrib = None
        for hi, x_chunk in ((0, x_lo), (1, x_hi)):
            q_ref = qs[0] if kind == "q4" else qs[hi]
            codes = (q4_codes_word(q_ref[:], bool(hi)) if kind == "q4"
                     else q_ref[:])
            if s_fmt == "sm":
                sv, mv = _decode_sm(s[hi][:])
            elif s_fmt == "sp":
                sv, mv = sp_scales(s[hi][:]), None
            else:
                sv, mv = s[hi][:].astype(jnp.float32), None
            d = group_scale_dot(x_chunk[:].astype(jnp.float32), codes,
                                sv, mv, g)
            contrib = d if contrib is None else contrib + d
        acc[:] = acc[:] + contrib

        @pl.when(k == nk - 1)
        def _():
            out[:] = acc[:].astype(out.dtype)

        return

    if mode == "dma":
        # consume every packed byte through the MXU, zero VPU work
        contrib = None
        for q_ref in qs:
            d = _mm(xi8[:], pltpu.bitcast(q_ref[:], jnp.int8), jnp.int32)
            contrib = d if contrib is None else contrib + d
        acc[:] = acc[:] + contrib.astype(jnp.float32)
    elif mode == "extract":
        contrib = None
        for hi in (0, 1):
            q_ref = qs[0] if kind == "q4" else qs[hi]
            w, _ = _dequant_fold(kind, s_fmt, q_ref, None, hi, g, mode)
            d = _mm(xi8[:], w, jnp.int32)
            contrib = d if contrib is None else contrib + d
        acc[:] = acc[:] + contrib.astype(jnp.float32)
    else:
        contrib = None
        for hi, x_chunk in ((0, x_lo), (1, x_hi)):
            q_ref = qs[0] if kind == "q4" else qs[hi]
            w, _ = _dequant_fold(kind, s_fmt, q_ref, s[hi], hi, g, mode)
            d = _mm(x_chunk[:], w)
            contrib = d if contrib is None else contrib + d
        acc[:] = acc[:] + contrib

    @pl.when(k == nk - 1)
    def _():
        out[:] = acc[:].astype(out.dtype)


def _ngrid_kernel(mode, kind, s_fmt, K, g, *refs):
    """N-tiled grid, full-K blocks, direct tile writes — no accumulator."""
    it = iter(refs)
    x = next(it)
    xi8 = next(it)
    qs = next(it)
    have_s = mode in ("bf16c", "full", "gdot")
    s = next(it) if have_s else None
    out = next(it)

    def _gdot_sm(sref):
        from tpu_kquant.ops.pallas_dequant import sp_scales

        if s_fmt == "sm":
            return _decode_sm(sref[:])
        if s_fmt == "sp":
            return sp_scales(sref[:]), None
        return sref[:].astype(jnp.float32), None

    if mode == "dma":
        xi = xi8[:, : K // 2] if kind == "q4" else xi8[:]
        out[:] = _mm(xi, pltpu.bitcast(qs[:], jnp.int8), jnp.int32
                     ).astype(out.dtype)
        return
    if kind == "q4":
        contrib = None
        for hi in (0, 1):
            if mode == "gdot":
                sv, mv = _gdot_sm(_SliceRef(s, hi, K, g, s_fmt))
                d = group_scale_dot(
                    (x[:, : K // 2] if hi == 0 else x[:, K // 2:]
                     ).astype(jnp.float32),
                    q4_codes_word(qs[:], bool(hi)), sv, mv, g)
            elif mode == "extract":
                w, _ = _dequant_fold(kind, s_fmt, qs, None, hi, g, mode)
                d = _mm(xi8[:, : K // 2] if hi == 0 else xi8[:, K // 2:],
                        w, jnp.int32).astype(jnp.float32)
            else:
                sref = _SliceRef(s, hi, K, g, s_fmt) if have_s else None
                w, _ = _dequant_fold(kind, s_fmt, qs, sref, hi, g, mode)
                d = _mm(x[:, : K // 2] if hi == 0 else x[:, K // 2:], w)
            contrib = d if contrib is None else contrib + d
        out[:] = contrib.astype(out.dtype)
    else:
        if mode == "extract":
            out[:] = _mm(xi8[:], qs[:], jnp.int32).astype(out.dtype)
            return
        if mode == "gdot":
            sv, mv = _gdot_sm(_WholeRef(s))
            out[:] = group_scale_dot(x[:].astype(jnp.float32), qs[:],
                                     sv, mv, g).astype(out.dtype)
            return
        sref = _WholeRef(s) if have_s else None
        w, _ = _dequant_fold(kind, s_fmt, qs, sref, 0, g, mode)
        out[:] = _mm(x[:], w).astype(out.dtype)


class _WholeRef:
    """Adapter so _dequant_fold's s_ref[:] reads work on a value slice."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, idx):
        return self._ref[idx]


class _SliceRef:
    """q4 ngrid: scales for one fold are a row-half of the [K/g, TN] block."""

    def __init__(self, ref, hi, K, g, s_fmt):
        rows = (K // g) // (2 if s_fmt == "sp" else 1)
        half = rows // 2
        self._sl = slice(half, None) if hi else slice(0, half)
        self._ref = ref

    def __getitem__(self, idx):
        return self._ref[self._sl]


@functools.partial(
    jax.jit,
    static_argnames=("mode", "kind", "s_fmt", "keys", "N", "K", "tk",
                     "geometry", "tn", "interpret"),
)
def lab_qmm(x, xi8, arrays, mode, kind, s_fmt, keys, N, K, tk, geometry="k",
            tn=256, interpret=False):
    """One mutation-ladder measurement call: x [R, K] bf16, xi8 [R, *] i8
    ones, arrays = packed tensor arrays (by sorted key)."""
    a = dict(zip(keys, arrays))
    R = x.shape[0]
    g = GROUP_SIZE[kind]
    have_s = mode in ("bf16c", "full", "gdot")
    s_key = {"sm": "sm", "sp": "sp"}.get(s_fmt, "scales")

    if geometry == "n":
        TN = tn
        while N % TN:
            TN //= 2
        qs_rows = K // 2 if kind == "q4" else K
        s_rows = (K // g) // (2 if s_fmt == "sp" else 1)
        in_specs = [
            pl.BlockSpec((R, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, qs_rows if kind != "q4" else K),
                         lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qs_rows, TN), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        inputs = [x, xi8, a["qs"]]
        if have_s:
            in_specs.append(pl.BlockSpec((s_rows, TN), lambda j: (0, j),
                                         memory_space=pltpu.VMEM))
            inputs.append(a[s_key])
        kernel = functools.partial(_ngrid_kernel, mode, kind, s_fmt, K, g)
        out = pl.pallas_call(
            kernel,
            grid=(N // TN,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((R, TN), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(*inputs)
        return out

    # K-chunked geometry (attn_in / oproj phase shape)
    TK2 = tk
    while (K // 2) % TK2:
        TK2 //= 2
    nk = (K // 2) // TK2
    sg = TK2 // (2 * g) if s_fmt == "sp" else TK2 // g

    xlo_spec = pl.BlockSpec((R, TK2), lambda k: (0, k), memory_space=pltpu.VMEM)
    xhi_spec = pl.BlockSpec((R, TK2), lambda k, _o=nk: (0, _o + k),
                            memory_space=pltpu.VMEM)
    xi8_spec = pl.BlockSpec((R, TK2), lambda k: (0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [xlo_spec, xhi_spec, xi8_spec]
    inputs = [x, x, xi8]
    if kind == "q4":
        in_specs.append(pl.BlockSpec((TK2, N), lambda k: (k, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(a["qs"])
    else:
        in_specs += [
            pl.BlockSpec((TK2, N), lambda k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK2, N), lambda k, _o=nk: (_o + k, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [a["qs"], a["qs"]]
    if have_s:
        in_specs += [
            pl.BlockSpec((sg, N), lambda k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sg, N), lambda k, _o=nk: (_o + k, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [a[s_key], a[s_key]]

    kernel = functools.partial(_kgrid_kernel, mode, kind, s_fmt, TK2, nk, g)
    out = pl.pallas_call(
        kernel,
        grid=(nk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, N), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, N), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*inputs)
    return out


def lab_bytes(qt: QTensor, mode: str) -> int:
    """Bytes the given mode actually streams (scale planes only reach the
    kernel for bf16c/full)."""
    keep = (qt.arrays if mode in ("bf16c", "full", "gdot")
            else {"qs": qt.arrays["qs"]})
    return sum(int(v.size) * v.dtype.itemsize for v in keep.values())


def run_ladder(qt: QTensor, s_fmt: str, R: int = 1, tks=(256, 512, 1024),
               tns=(256, 512), modes=MODES, log=print, reps: int = 3):
    """Run the full mutation ladder + grid sweep on one packed tensor.
    Returns a list of attribution rows."""
    import numpy as np

    from tpu_kquant.utils.attribution import (
        chain_length_for,
        dep,
        kernel_report,
        time_chained,
    )

    N, K = int(qt.shape[0]), int(qt.shape[1])
    keys = tuple(sorted(qt.arrays))
    arrays = tuple(qt.arrays[k] for k in keys)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, K)), jnp.bfloat16)
    xi8_k = jnp.ones((R, max(tks)), jnp.int8)
    xi8_n = jnp.ones((R, K), jnp.int8)
    rows = []
    for geometry in ("k", "n"):
        sizes = tks if geometry == "k" else tns
        for tsz in sizes:
            for mode in modes:
                nb = lab_bytes(qt, mode)

                def fn(xc, aux):
                    y = lab_qmm(xc, xi8_k if geometry == "k" else xi8_n,
                                aux, mode, qt.kind, s_fmt, keys, N, K,
                                tsz if geometry == "k" else 256,
                                geometry=geometry,
                                tn=tsz if geometry == "n" else 256)
                    return dep(xc, y)

                try:
                    t = time_chained(fn, x, chain_length_for(nb), reps=reps,
                                     aux=arrays)
                except Exception as e:  # pragma: no cover - lab robustness
                    log(f"  {geometry}grid t={tsz} {mode}: FAILED {type(e).__name__}: {e}")
                    continue
                r = kernel_report(
                    f"{qt.kind} [{N},{K}] {geometry}grid t={tsz} {mode}",
                    t, nb, log=log)
                r.update(kind=qt.kind, N=N, K=K, geometry=geometry,
                         tile=tsz, mode=mode)
                rows.append(r)
    return rows


# ---------------------------------------------------------------------------
# MANUAL double-buffered pipeline (r5): does a hand-rolled DMA loop overlap
# the VPU dequant chain with the weight stream where Mosaic's automatic grid
# pipeline does not (finding 4)? Weights live in ANY/HBM; the kernel runs a
# fori_loop that starts chunk i+1's async copy BEFORE computing chunk i.
# ---------------------------------------------------------------------------


def _manual_kernel(mode, s_fmt, TK2, nk, g, K, x_ref, qs_hbm, s_hbm,
                   out_ref, buf, sbuf, acc, sem, ssem):
    sg = TK2 // g

    def start(i, slot):
        pltpu.make_async_copy(qs_hbm.at[pl.ds(i * TK2, TK2)],
                              buf.at[slot], sem.at[slot]).start()
        if mode != "dma":
            pltpu.make_async_copy(s_hbm.at[pl.ds(i * sg, sg)],
                                  sbuf.at[slot], ssem.at[slot]).start()

    def wait(i, slot):
        pltpu.make_async_copy(qs_hbm.at[pl.ds(i * TK2, TK2)],
                              buf.at[slot], sem.at[slot]).wait()
        if mode != "dma":
            pltpu.make_async_copy(s_hbm.at[pl.ds(i * sg, sg)],
                                  sbuf.at[slot], ssem.at[slot]).wait()

    acc[:] = jnp.zeros_like(acc)
    start(0, 0)

    def body(i, carry):
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < nk)
        def _():
            start(i + 1, nslot)

        wait(i, slot)
        qs_tile = buf[slot]
        if mode == "dma":
            xi = jnp.ones((acc.shape[0], TK2), jnp.int8)
            d = jax.lax.dot_general(
                xi, pltpu.bitcast(qs_tile, jnp.int8),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc[:] = acc[:] + d.astype(jnp.float32)
            return carry
        if s_fmt == "sm":
            s, m = _decode_sm(sbuf[slot])
        else:
            s, m = sbuf[slot], None
        contrib = None
        for hi in (0, 1):
            codes = q4_codes_word(qs_tile, bool(hi))
            x_chunk = x_ref[:, pl.ds((K // 2 if hi else 0), TK2)]
            # production mxu-combo chain: f32 scale-mul + f32 dot, mins on
            # the MXU (fold_dot_mxu equivalent, inlined to avoid imports)
            qf = codes.astype(jnp.float32)
            TKc, TN = qf.shape
            w = (qf.reshape(TKc // g, g, TN) * s[:, None, :]).reshape(TKc, TN)
            d = jax.lax.dot_general(
                x_chunk.astype(jnp.float32), w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if m is not None:
                from tpu_kquant.ops.pallas_dequant import group_gmat

                t = jax.lax.dot_general(
                    x_chunk.astype(jnp.float32), group_gmat(TKc, g),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                d = d - jax.lax.dot_general(
                    t, m, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            contrib = d if contrib is None else contrib + d
        acc[:] = acc[:] + contrib
        return carry

    jax.lax.fori_loop(0, nk, body, 0)
    out_ref[:] = acc[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "s_fmt", "keys", "N", "K", "tk", "interpret"),
)
def lab_qmm_manual(x, arrays, mode, s_fmt, keys, N, K, tk, interpret=False):
    """Manual-pipeline measurement: q4 kinds only, kgrid geometry. x [R, K]
    bf16. Weights stay in HBM (ANY); the kernel DMAs chunks itself."""
    a = dict(zip(keys, arrays))
    R = x.shape[0]
    g = GROUP_SIZE["q4"]
    TK2 = tk
    while (K // 2) % TK2:
        TK2 //= 2
    nk = (K // 2) // TK2
    sg = TK2 // g
    s_key = "sm" if s_fmt == "sm" else "scales"

    kernel = functools.partial(_manual_kernel, mode, s_fmt, TK2, nk, g, K)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, TK2, N), jnp.uint8),
            pltpu.VMEM((2, sg, N), jnp.float32),
            pltpu.VMEM((R, N), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, a["qs"], a[s_key])
    return out
