"""Whole-layer single-launch decode megakernel.

ONE pallas_call computes an entire transformer decode layer:

  phase QKV  (nqkv steps): rms_norm -> {wqk, wv} quantized matmuls, K-depth
             chunked exactly like ops.pallas_attn_in; last step applies the
             NEOX rope epilogue and relayouts q into per-head rows.
  phase ATT  (nS steps): blockwise flash attention over KV cache S-tiles
             (all KV heads per tile; online softmax in scratch, masks
             computed from positions — ops.pallas_attention's algorithm).
             The CURRENT token's k/v never touch HBM: they are folded into
             the online softmax from scratch at the last tile and exported
             as (k_new, v_new) outputs for the cache scatter outside.
  phase OPROJ(nko steps, statically unrolled): o_proj K-chunks.
  phase FFN  (nf steps): norm -> gate/up -> act -> down -> residual
             (ops.pallas_ffn's pipeline).

Why: per-kernel attribution at 8B shapes (tools_kernel_bench.py) measured
attn_in at 67% of HBM roofline with the gap almost entirely per-LAUNCH fixed
cost (~10 us), plus the separate attention dispatch costing ~20-40 us at
decode-size KV. Merging the layer into one launch removes two kernel
launches and the XLA attention dispatch per layer — the decode step's
remaining fixed costs collapse into grid steps that pipeline with weight DMA.
The reference pays the analogous per-node cost in ggml_compute_forward
(SURVEY.md 3.1); its fix was the same in spirit: fuse the hot loop.

Supported (gates in layer_supported): T=1 rows<=4, NEOX rope at full head
rotation, unified (non-ring) heads-major bf16 KV cache, full attention (no
SWA/softcap/post-norms/bias), wqk+wv split projections, w_gateup fused,
kinds q4/q6w/q8 per tensor, D multiple of 512, head_dim 64/128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_kquant.ops.pallas_attn_in import (
    _VMEM_LIMIT,
    _cap_chunk,
    _decode_sm,
    rope_tables_full,
)
from tpu_kquant.ops.pallas_dequant import group_scale_mulsub, q4_codes_word
from tpu_kquant.ops.pallas_ffn import _pick_tf
from tpu_kquant.quant.qtensor import QTensor
from tpu_kquant.quant.repack import GROUP_SIZE

_FLAT_KINDS = ("q6w", "q8")
_KINDS = ("q4",) + _FLAT_KINDS
_NEG_INF = -1e30


def layer_supported(wqk: QTensor, wv: QTensor, wo: QTensor, gu: QTensor,
                    dn: QTensor, rows: int, D: int, H: int, Hkv: int,
                    hd: int) -> bool:
    if rows > 4 or D % 512 or hd not in (64, 128):
        return False
    for w in (wqk, wv, wo, gu, dn):
        if w.layout != "kmajor" or w.kind not in _KINDS:
            return False
        if "sp" in w.arrays:  # adjacent-pair scales: not plumbed here
            return False
    if wqk.shape != ((H + Hkv) * hd, D) or wv.shape != (Hkv * hd, D):
        return False
    if wo.shape[0] != D or wo.shape[-1] != H * hd or (H * hd) % 1024:
        return False
    F = dn.shape[-1]
    if gu.shape != (2 * F, D) or dn.shape[0] != D:
        return False
    if dn.kind not in _FLAT_KINDS or _pick_tf(F, D) == 0:
        return False
    return True


def layer_enabled(impl: str, *args, **kw) -> bool:
    import os

    # Default OFF: measured regression on real TPU (tg128 740 -> 510 t/s,
    # BENCH_r02.json) — same failure mode as the attention+o_proj fusion
    # negative result (README Perf log). Opt in with TKQ_FUSE_LAYER=1 only
    # after a before/after llama-bench win at the target shape.
    if os.environ.get("TKQ_FUSE_LAYER", "0") != "1":
        return False
    if impl not in ("auto", "pallas", "int8"):
        return False
    if not layer_supported(*args, **kw):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _wspecs(qt: QTensor):
    return (qt.kind, "sm" in qt.arrays, "mins" in qt.arrays)


def _dequant_chunk(kind, has_sm, qs_refs, s_refs, m_refs, hi, g):
    """One fold's dequantized [TK2, N] f32 weights (pallas_attn_in scheme)."""
    if kind == "q4":
        q = q4_codes_word(qs_refs[0][:], bool(hi)).astype(jnp.float32)
        if has_sm:
            sc, mn = _decode_sm(s_refs[hi][:])
        else:
            sc = s_refs[hi][:].astype(jnp.float32)
            mn = m_refs[hi][:].astype(jnp.float32) if m_refs else None
        return group_scale_mulsub(q, sc, mn, g)
    return group_scale_mulsub(qs_refs[hi][:].astype(jnp.float32),
                              s_refs[hi][:].astype(jnp.float32), None, g)


def _mm(x, w):
    return jax.lax.dot_general(
        x, w.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _layer_kernel(cfgs, *refs):
    (R, D, H, Hkv, hd, N0, F, TK2, nqkv, TS, nS, S_real, TKo2, nko, TF, nf,
     wqk_spec, wv_spec, wo_spec, gu_spec, dn_spec, eps, act_fn,
     att_scale) = cfgs
    G = H // Hkv
    HD, HkvD = H * hd, Hkv * hd
    half_rot = hd // 2

    it = iter(refs)
    qpos_ref = next(it)  # scalar prefetch: [R+1] (positions..., last live tile)
    x_full = next(it)
    anw_lo = next(it)
    anw_hi = next(it)
    x_lo_ref = next(it)
    x_hi_ref = next(it)

    def take_w(spec):
        kind, has_sm, has_mins = spec
        if kind == "q4":
            qs = (next(it),)
            s = (next(it), next(it))
            m = (next(it), next(it)) if has_mins else None
        else:
            qs = (next(it), next(it))
            s = (next(it), next(it))
            m = None
        return qs, s, m

    wqk_r = take_w(wqk_spec)
    wv_r = take_w(wv_spec)
    cos_ref = next(it)
    sin_ref = next(it)
    k_tile = next(it)
    v_tile = next(it)
    fnw_ref = next(it)
    wo_r = take_w(wo_spec)
    kind, gu_sm, gu_mins = gu_spec
    g_qs, u_qs = next(it), next(it)
    g_s, u_s = next(it), next(it)
    g_m = next(it) if gu_mins else None
    u_m = next(it) if gu_mins else None
    d_qs = next(it)
    d_s = next(it)
    y_ref = next(it)
    knew_ref = next(it)
    vnew_ref = next(it)
    # scratch
    acc_qk = next(it)   # [R, N0] f32
    acc_v = next(it)    # [R, HkvD] f32
    qkr = next(it)      # [R, N0] bf16 (roped qk)
    vr = next(it)       # [R, HkvD] bf16
    q_scr = next(it)    # [R*H, hd] bf16
    m_scr = next(it)    # [R*H, 1] f32
    l_scr = next(it)    # [R*H, 1] f32
    acc_att = next(it)  # [R*H, hd] f32
    att_flat = next(it)  # [R, HD] bf16
    acc_x = next(it)    # [R, dim] f32
    x2_scr = next(it)   # [R, dim] bf16
    acc_f = next(it)    # [R, dim] f32

    j = pl.program_id(0)
    j_att0 = nqkv
    j_op0 = nqkv + nS
    j_ffn0 = j_op0 + nko

    @pl.when(j == 0)
    def _():
        acc_qk[:] = jnp.zeros_like(acc_qk)
        acc_v[:] = jnp.zeros_like(acc_v)
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_att[:] = jnp.zeros_like(acc_att)
        acc_x[:] = jnp.zeros_like(acc_x)
        acc_f[:] = jnp.zeros_like(acc_f)

    # ---------------- phase QKV ------------------------------------------
    @pl.when(j < nqkv)
    def _():
        xf = x_full[:].astype(jnp.float32)
        rstd = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
        x_lo = (x_lo_ref[:].astype(jnp.float32) * rstd
                * anw_lo[:].astype(jnp.float32)).astype(jnp.bfloat16)
        x_hi = (x_hi_ref[:].astype(jnp.float32) * rstd
                * anw_hi[:].astype(jnp.float32)).astype(jnp.bfloat16)
        for (spec, wr, acc, g) in ((wqk_spec, wqk_r, acc_qk,
                                    GROUP_SIZE[wqk_spec[0]]),
                                   (wv_spec, wv_r, acc_v,
                                    GROUP_SIZE[wv_spec[0]])):
            qs, s, m = wr
            contrib = None
            for hi, xc in ((0, x_lo), (1, x_hi)):
                w = _dequant_chunk(spec[0], spec[1], qs, s, m, hi, g)
                d = _mm(xc, w)
                contrib = d if contrib is None else contrib + d
            acc[:] = acc[:] + contrib

    @pl.when(j == nqkv - 1)
    def _():
        # rope epilogue on q+k (bf16 rounding first: matches unfused qmatmul)
        y = acc_qk[:].astype(jnp.bfloat16).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
        first = (lane % (2 * half_rot)) < half_rot
        n = y.shape[-1]
        rot = jnp.where(first,
                        -pltpu.roll(y, n - half_rot, 1),
                        pltpu.roll(y, half_rot, 1))
        y = y * cos_ref[:] + rot * sin_ref[:]
        qkr[:] = y.astype(jnp.bfloat16)
        vr[:] = acc_v[:].astype(jnp.bfloat16)
        knew_ref[:] = qkr[:, HD:].astype(knew_ref.dtype)
        vnew_ref[:] = vr[:].astype(vnew_ref.dtype)
        # relayout q: [R, H*hd] lanes -> [R*H, hd] rows for MXU-friendly
        # [G, hd] x [hd, TS] attention matmuls
        for r in range(R):
            for h in range(H):
                q_scr[r * H + h: r * H + h + 1, :] = (
                    qkr[r: r + 1, h * hd:(h + 1) * hd])

    # ---------------- phase ATT ------------------------------------------
    def att_step(s_idx, S_total):
        tile_start = s_idx * TS
        # partial last tile: rows >= S_total - tile_start are out-of-bounds
        # garbage (possibly NaN); p is 0 there but 0*NaN = NaN in the p@V
        # matmul, so V rows must be zeroed (static per unrolled tile step)
        n_valid = min(TS, S_total - tile_start)
        for r in range(R):
            q_pos = qpos_ref[r]

            @pl.when(tile_start < q_pos)  # cache holds positions < q_pos
            def _():
                for h in range(Hkv):
                    rows = slice(r * H + h * G, r * H + (h + 1) * G)
                    q = q_scr[rows, :]  # [G, hd]
                    kf = k_tile[r, h].astype(jnp.bfloat16)  # [TS, hd]
                    vf = v_tile[r, h].astype(jnp.bfloat16)
                    if n_valid < TS:
                        row_idx = jax.lax.broadcasted_iota(
                            jnp.int32, vf.shape, 0)
                        vf = jnp.where(row_idx < n_valid, vf, 0)
                    s = jax.lax.dot_general(
                        q, kf, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * att_scale  # [G, TS]
                    kv_idx = tile_start + jax.lax.broadcasted_iota(
                        jnp.int32, s.shape, 1)
                    s = jnp.where(kv_idx < q_pos, s, _NEG_INF)
                    m_prev = m_scr[rows, :]
                    m_new = jnp.maximum(m_prev,
                                        jnp.max(s, axis=1, keepdims=True))
                    alpha = jnp.exp(m_prev - m_new)
                    p = jnp.exp(s - m_new)
                    l_scr[rows, :] = (l_scr[rows, :] * alpha
                                      + jnp.sum(p, axis=1, keepdims=True))
                    acc_att[rows, :] = acc_att[rows, :] * alpha + (
                        jax.lax.dot_general(
                            p.astype(jnp.bfloat16), vf,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ))
                    m_scr[rows, :] = m_new

    for si in range(nS):
        @pl.when(j == j_att0 + si)
        def _(si=si):
            att_step(si, S_real)

    @pl.when(j == j_att0 + nS - 1)
    def _():
        # fold the CURRENT token's k/v (self-attention; slot not yet in HBM),
        # then normalize and flatten the attention output
        for r in range(R):
            for h in range(Hkv):
                rows = slice(r * H + h * G, r * H + (h + 1) * G)
                q = q_scr[rows, :]
                k_self = qkr[r:r + 1, HD + h * hd: HD + (h + 1) * hd]  # [1, hd]
                v_self = vr[r:r + 1, h * hd:(h + 1) * hd]
                # NOT dot_general: an N=1 contraction lowers through a
                # broadcast-multiply-reduce whose bf16->f32 vector.broadcast
                # fails Mosaic verification on real TPU; the VPU
                # multiply+reduce is equivalent (and tiny: [G, hd])
                s = jnp.sum(
                    q.astype(jnp.float32) * k_self.astype(jnp.float32),
                    axis=1, keepdims=True,
                ) * att_scale  # [G, 1]
                m_prev = m_scr[rows, :]
                m_new = jnp.maximum(m_prev, s)
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new)  # [G, 1]
                l = l_scr[rows, :] * alpha + p
                acc = acc_att[rows, :] * alpha + p * v_self.astype(jnp.float32)
                out = (acc / l).astype(jnp.bfloat16)  # [G, hd]
                for g_i in range(G):
                    hq = h * G + g_i
                    att_flat[r: r + 1, hq * hd:(hq + 1) * hd] = (
                        out[g_i: g_i + 1, :])

    # ---------------- phase OPROJ (statically unrolled chunks) -----------
    kind_o, wo_sm, _wo_mins = wo_spec
    g_o = GROUP_SIZE[kind_o]
    for c in range(nko):
        @pl.when(j == j_op0 + c)
        def _(c=c):
            qs, s, m = wo_r
            a_lo = att_flat[:, c * TKo2:(c + 1) * TKo2]
            a_hi = att_flat[:, HD // 2 + c * TKo2: HD // 2 + (c + 1) * TKo2]
            contrib = None
            for hi, a in ((0, a_lo), (1, a_hi)):
                w = _dequant_chunk(kind_o, wo_sm, qs, s, m, hi, g_o)
                d = _mm(a, w)
                contrib = d if contrib is None else contrib + d
            acc_x[:] = acc_x[:] + contrib

    @pl.when(j == j_op0 + nko - 1)
    def _():
        h_res = acc_x[:].astype(jnp.bfloat16).astype(jnp.float32)
        x2_scr[:] = (x_full[:].astype(jnp.float32) + h_res).astype(jnp.bfloat16)

    # ---------------- phase FFN ------------------------------------------
    g_gu = GROUP_SIZE[kind]
    kind_d = dn_spec[0]
    g_d = GROUP_SIZE[kind_d]

    @pl.when(j >= j_ffn0)
    def _():
        xf = x2_scr[:].astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xn = (xf * jax.lax.rsqrt(var + eps)
              * fnw_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)

        def gu_matmul(qs_ref, s_ref, m_ref):
            if kind in _FLAT_KINDS:
                w = group_scale_mulsub(
                    qs_ref[:].astype(jnp.float32),
                    s_ref[:].astype(jnp.float32),
                    m_ref[:].astype(jnp.float32) if m_ref is not None else None,
                    g_gu)
                return _mm(xn, w)
            if gu_sm:
                s_all, m_all = _decode_sm(s_ref[:])
            else:
                s_all = s_ref[:].astype(jnp.float32)
                m_all = (m_ref[:].astype(jnp.float32)
                         if m_ref is not None else None)
            half_g = (D // 2) // g_gu
            out = None
            for hi, xs in ((False, xn[:, : D // 2]), (True, xn[:, D // 2:])):
                q = q4_codes_word(qs_ref[:], hi).astype(jnp.float32)
                sl = slice(half_g, None) if hi else slice(0, half_g)
                w = group_scale_mulsub(
                    q, s_all[sl], m_all[sl] if m_all is not None else None,
                    g_gu)
                d = _mm(xs, w)
                out = d if out is None else out + d
            return out

        gate = gu_matmul(g_qs, g_s, g_m).astype(jnp.bfloat16).astype(jnp.float32)
        up = gu_matmul(u_qs, u_s, u_m).astype(jnp.bfloat16).astype(jnp.float32)
        if act_fn == "gelu":
            a = jax.nn.gelu(gate, approximate=False) * up
        else:
            a = jax.nn.silu(gate) * up
        a = a.astype(jnp.bfloat16)
        wd = group_scale_mulsub(d_qs[:].astype(jnp.float32),
                                d_s[:].astype(jnp.float32), None, g_d)
        acc_f[:] = acc_f[:] + _mm(a, wd)

    @pl.when(j == j_ffn0 + nf - 1)
    def _():
        y_ref[:] = (x2_scr[:].astype(jnp.float32) + acc_f[:]).astype(y_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kinds", "keys", "shapes", "R", "D", "H", "Hkv", "hd",
                     "F", "S", "eps", "act_fn", "out_dtype", "interpret"),
)
def _layer_call(x2d, anw, fnw, flat_arrays, cos_full, sin_full, k_cache,
                v_cache, qpos, kinds, keys, shapes, R, D, H, Hkv, hd, F, S,
                eps, act_fn, out_dtype, interpret):
    G = H // Hkv
    HD, HkvD = H * hd, Hkv * hd
    N0 = HD + HkvD

    arrs = {}
    ai = iter(flat_arrays)
    for name, kk in zip(("wqk", "wv", "wo", "gu", "dn"), keys):
        arrs[name] = dict(zip(kk, [next(ai) for _ in kk]))

    TK2 = _cap_chunk(512, N0, 256)
    while (D // 2) % TK2:
        TK2 //= 2
    nqkv = (D // 2) // TK2
    TS = 256
    nS = pl.cdiv(S, TS)
    TKo2 = _cap_chunk(512, D, 256)
    while (HD // 2) % TKo2:
        TKo2 //= 2
    nko = (HD // 2) // TKo2
    TF = _pick_tf(F, D)
    nf = F // TF
    n_steps = nqkv + nS + nko + nf
    j_att0, j_op0, j_ffn0 = nqkv, nqkv + nS, nqkv + nS + nko

    specs5 = {n: (kinds[i], "sm" in arrs[n], "mins" in arrs[n])
              for i, n in enumerate(("wqk", "wv", "wo", "gu", "dn"))}

    in_specs = [
        pl.BlockSpec((R, D), lambda j, qp: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TK2), lambda j, qp: (0, jnp.minimum(j, nqkv - 1)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TK2),
                     lambda j, qp: (0, (D // 2) // TK2 + jnp.minimum(j, nqkv - 1)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, TK2), lambda j, qp: (0, jnp.minimum(j, nqkv - 1)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, TK2),
                     lambda j, qp: (0, (D // 2) // TK2 + jnp.minimum(j, nqkv - 1)),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [x2d, anw.reshape(1, D), anw.reshape(1, D), x2d, x2d]

    def clampq(j):
        return jnp.minimum(j, nqkv - 1)

    def add_kchunked_weight(name, N, depth_rows):
        """K-chunked weight (wqk, wv): blocks [TK2, N] over packed rows."""
        a = arrs[name]
        kind, has_sm, has_mins = specs5[name]
        g = GROUP_SIZE[kind]
        sg = TK2 // g
        skey = "sm" if has_sm else "scales"
        lo_s = pl.BlockSpec((sg, N), lambda j, qp: (clampq(j), 0),
                            memory_space=pltpu.VMEM)
        hi_s = pl.BlockSpec(
            (sg, N), lambda j, qp, _o=(D // 2) // TK2: (_o + clampq(j), 0),
            memory_space=pltpu.VMEM)
        if kind == "q4":
            in_specs.append(pl.BlockSpec((TK2, N),
                                         lambda j, qp: (clampq(j), 0),
                                         memory_space=pltpu.VMEM))
            inputs.append(a["qs"])
            in_specs.extend([lo_s, hi_s])
            inputs.extend([a[skey], a[skey]])
            if has_mins:
                in_specs.extend([lo_s, hi_s])
                inputs.extend([a["mins"], a["mins"]])
        else:
            lo_q = pl.BlockSpec((TK2, N), lambda j, qp: (clampq(j), 0),
                                memory_space=pltpu.VMEM)
            hi_q = pl.BlockSpec(
                (TK2, N), lambda j, qp, _o=(D // 2) // TK2: (_o + clampq(j), 0),
                memory_space=pltpu.VMEM)
            in_specs.extend([lo_q, hi_q, lo_s, hi_s])
            inputs.extend([a["qs"], a["qs"], a[skey], a[skey]])

    add_kchunked_weight("wqk", N0, D // 2)
    add_kchunked_weight("wv", HkvD, D // 2)

    cs_spec = pl.BlockSpec((R, N0), lambda j, qp: (0, 0),
                           memory_space=pltpu.VMEM)
    in_specs.extend([cs_spec, cs_spec])
    inputs.extend([cos_full, sin_full])

    # KV tiles: all heads per tile; index clamped to the attention phase and
    # to the last LIVE tile (qp[-1]) so dead tiles re-request the same block
    def s_live(j, qp):
        s = jnp.clip(j - j_att0, 0, nS - 1)
        return jnp.minimum(s, qp[R])

    kv_spec = pl.BlockSpec((R, Hkv, TS, hd),
                           lambda j, qp: (0, 0, s_live(j, qp), 0),
                           memory_space=pltpu.VMEM)
    in_specs.extend([kv_spec, kv_spec])
    inputs.extend([k_cache, v_cache])

    in_specs.append(pl.BlockSpec((1, D), lambda j, qp: (0, 0),
                                 memory_space=pltpu.VMEM))
    inputs.append(fnw.reshape(1, D))

    # wo: K-chunked over the OPROJ phase
    def clampo(j):
        return jnp.clip(j - j_op0, 0, nko - 1)

    a = arrs["wo"]
    kind_o, wo_sm, wo_mins = specs5["wo"]
    g_o = GROUP_SIZE[kind_o]
    wo_sg = TKo2 // g_o
    wo_skey = "sm" if wo_sm else "scales"
    wlo_s = pl.BlockSpec((wo_sg, D), lambda j, qp: (clampo(j), 0),
                         memory_space=pltpu.VMEM)
    whi_s = pl.BlockSpec(
        (wo_sg, D), lambda j, qp, _o=(HD // 2) // TKo2: (_o + clampo(j), 0),
        memory_space=pltpu.VMEM)
    if kind_o == "q4":
        in_specs.append(pl.BlockSpec((TKo2, D), lambda j, qp: (clampo(j), 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(a["qs"])
        in_specs.extend([wlo_s, whi_s])
        inputs.extend([a[wo_skey], a[wo_skey]])
        if wo_mins:
            in_specs.extend([wlo_s, whi_s])
            inputs.extend([a["mins"], a["mins"]])
    else:
        in_specs.extend([
            pl.BlockSpec((TKo2, D), lambda j, qp: (clampo(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TKo2, D),
                lambda j, qp, _o=(HD // 2) // TKo2: (_o + clampo(j), 0),
                memory_space=pltpu.VMEM),
            wlo_s, whi_s,
        ])
        inputs.extend([a["qs"], a["qs"], a[wo_skey], a[wo_skey]])

    # gate/up + down: N-chunked over the FFN phase (pallas_ffn geometry)
    def clampf(j):
        return jnp.clip(j - j_ffn0, 0, nf - 1)

    gu = arrs["gu"]
    kind_g, gu_sm, gu_mins = specs5["gu"]
    qs_rows = gu["qs"].shape[0]
    s_key = "sm" if gu_sm else "scales"
    s_rows = gu[s_key].shape[0]
    in_specs.extend([
        pl.BlockSpec((qs_rows, TF), lambda j, qp: (0, clampf(j)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((qs_rows, TF), lambda j, qp: (0, F // TF + clampf(j)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((s_rows, TF), lambda j, qp: (0, clampf(j)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((s_rows, TF), lambda j, qp: (0, F // TF + clampf(j)),
                     memory_space=pltpu.VMEM),
    ])
    inputs.extend([gu["qs"], gu["qs"], gu[s_key], gu[s_key]])
    if gu_mins:
        in_specs.extend([
            pl.BlockSpec((s_rows, TF), lambda j, qp: (0, clampf(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_rows, TF), lambda j, qp: (0, F // TF + clampf(j)),
                         memory_space=pltpu.VMEM),
        ])
        inputs.extend([gu["mins"], gu["mins"]])
    dn = arrs["dn"]
    g_d = GROUP_SIZE[specs5["dn"][0]]
    in_specs.append(pl.BlockSpec((TF, D), lambda j, qp: (clampf(j), 0),
                                 memory_space=pltpu.VMEM))
    inputs.append(dn["qs"])
    in_specs.append(pl.BlockSpec((TF // g_d, D), lambda j, qp: (clampf(j), 0),
                                 memory_space=pltpu.VMEM))
    inputs.append(dn["scales"])

    cfgs = (R, D, H, Hkv, hd, N0, F, TK2, nqkv, TS, nS, S, TKo2, nko, TF, nf,
            specs5["wqk"], specs5["wv"], specs5["wo"], specs5["gu"],
            specs5["dn"], eps, act_fn, float(hd) ** -0.5)
    kernel = functools.partial(_layer_kernel, cfgs)

    bytes_accessed = sum(
        int(v.size) * v.dtype.itemsize for v in flat_arrays
    ) + 2 * R * Hkv * S * hd * 2 + 2 * R * (D * 3 + N0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((R, D), lambda j, qp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, HkvD), lambda j, qp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, HkvD), lambda j, qp: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, N0), jnp.float32),    # acc_qk
            pltpu.VMEM((R, HkvD), jnp.float32),  # acc_v
            pltpu.VMEM((R, N0), jnp.bfloat16),   # qkr
            pltpu.VMEM((R, HkvD), jnp.bfloat16),  # vr
            pltpu.VMEM((R * H, hd), jnp.bfloat16),  # q_scr
            pltpu.VMEM((R * H, 1), jnp.float32),  # m
            pltpu.VMEM((R * H, 1), jnp.float32),  # l
            pltpu.VMEM((R * H, hd), jnp.float32),  # acc_att
            pltpu.VMEM((R, HD), jnp.bfloat16),   # att_flat
            pltpu.VMEM((R, D), jnp.float32),     # acc_x
            pltpu.VMEM((R, D), jnp.bfloat16),    # x2
            pltpu.VMEM((R, D), jnp.float32),     # acc_f
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((R, D), jnp.dtype(out_dtype)),
            jax.ShapeDtypeStruct((R, HkvD), jnp.dtype(out_dtype)),
            jax.ShapeDtypeStruct((R, HkvD), jnp.dtype(out_dtype)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * R * (D * (N0 + HkvD + HD) + 3 * D * F)
            + 4 * R * HD * S,
            bytes_accessed=bytes_accessed, transcendentals=R * (F + H * S),
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qpos, *inputs)
    return outs


def fused_layer(
    x: jnp.ndarray,  # [B, 1, D] residual stream
    positions: jnp.ndarray,  # [B, 1] current absolute positions
    attn_norm_w: jnp.ndarray,
    ffn_norm_w: jnp.ndarray,
    eps: float,
    wqk: QTensor,
    wv: QTensor,
    wo: QTensor,
    gu: QTensor,
    dn: QTensor,
    cos: jnp.ndarray,  # [B, 1, hd/2] rope tables for these positions
    sin: jnp.ndarray,
    k_cache: jnp.ndarray,  # [B, Hkv, S, D] heads-major bf16 (PRE-append)
    v_cache: jnp.ndarray,
    H: int,
    Hkv: int,
    act_fn: str = "silu",
    interpret: bool = False,
):
    """One decode layer in one launch. Returns (y [B,1,D], k_new [B,1,Hkv,hd],
    v_new [B,1,Hkv,hd]) — caller scatters k_new/v_new into the cache."""
    B, T, D = x.shape
    assert T == 1
    hd = wqk.shape[0] // (H + Hkv)
    F = dn.shape[-1]
    S = int(k_cache.shape[2])
    cf, sf = rope_tables_full(cos, sin, H + Hkv, hd, n_pad=0)

    kinds = tuple(w.kind for w in (wqk, wv, wo, gu, dn))
    keys = tuple(tuple(sorted(w.arrays)) for w in (wqk, wv, wo, gu, dn))
    shapes = tuple(tuple(w.shape) for w in (wqk, wv, wo, gu, dn))
    flat_arrays = tuple(
        w.arrays[k]
        for w, kk in zip((wqk, wv, wo, gu, dn), keys)
        for k in kk
    )
    pos = positions[:, 0].astype(jnp.int32)
    TS = 256
    nS = pl.cdiv(S, TS)
    last_live = jnp.clip((jnp.max(pos) - 1) // TS, 0, nS - 1)
    qp = jnp.concatenate([pos, last_live[None]])

    y, k_new, v_new = _layer_call(
        x.reshape(B, D), attn_norm_w, ffn_norm_w, flat_arrays, cf, sf,
        k_cache, v_cache, qp, kinds, keys, shapes, B, D, H, Hkv, hd, F, S,
        float(eps), act_fn, jnp.dtype(x.dtype).name, interpret,
    )
    return (y.reshape(B, 1, D),
            k_new.reshape(B, 1, Hkv, hd),
            v_new.reshape(B, 1, Hkv, hd))
