"""Quantized matmul dispatch — the TPU analog of ggml_compute_forward_mul_mat.

The reference's hot path (SURVEY.md 3.1) is mul_mat over packed Q4_K/Q6_K
weights via per-row NEON vec-dots (67%+26% of decode cycles). Here the same
contraction is one op with two implementations:

  - 'xla':    dequantize W^T [K, N] with jnp unpackers, then a bf16 MXU
              matmul (XLA fuses dequant into the matmul's operand pipeline).
  - 'pallas': fused kernel that streams packed bits HBM->VMEM and dequantizes
              in-tile (tpu_kquant.ops.pallas_qmm) — the speed-of-light path.
  - 'auto':   pallas for supported kinds on TPU, else xla.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_kquant.quant.jnp_codecs import dequant_kmajor
from tpu_kquant.quant.qtensor import QTensor

_PALLAS_KINDS = ("q4", "q5", "q6", "q8", "q2", "q3", "q6w")


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def qmatmul(
    x: jnp.ndarray,
    qt: QTensor,
    impl: str = "auto",
    out_dtype=None,
) -> jnp.ndarray:
    """y[..., n] = sum_k x[..., k] * W[n, k] for a kmajor/dense QTensor.

    Contraction runs on the MXU in bf16 (weights dequantized to bf16) with
    float32 accumulation; output cast to ``out_dtype`` (default: x.dtype).
    """
    out_dtype = out_dtype or x.dtype
    if (qt.fold or 1) > 1:
        # block-local fold (row-parallel TP shards): the Pallas kernels
        # assume the global fold — the XLA path's unpacker handles any fold
        impl = "xla"
    if impl in ("auto", "pallas", "int8") and qt.kind in _PALLAS_KINDS:
        from tpu_kquant.ops.pallas_qmm import pallas_supported

        if not pallas_supported(qt.kind, qt.shape[-1]):
            impl = "xla"
    if impl == "auto":
        impl = "pallas" if (qt.kind in _PALLAS_KINDS and _on_tpu()) else "xla"
    if impl == "int8":
        # int8-MXU path (Q8_K-style activation quant); q4/q6, decode-sized
        # batches only (prefill is MXU-compute-bound: the bf16 kernel wins,
        # and the int8 kernel keeps the whole batch resident in VMEM) —
        # other cases fall through to the bf16-dequant kernel
        rows = 1
        for s in x.shape[:-1]:
            rows *= s
        if (qt.kind in ("q4", "q6") and qt.layout == "kmajor"
                and "sm" not in qt.arrays  # int8 kernel reads scales/mins
                and len(qt.shape) == 2 and rows <= 32):
            from tpu_kquant.ops.pallas_qmm_int8 import qmm_int8

            return qmm_int8(x, qt, out_dtype=out_dtype, interpret=not _on_tpu())
        impl = "pallas" if (qt.kind in _PALLAS_KINDS and _on_tpu()) else "xla"
    if impl == "pallas" and qt.kind in _PALLAS_KINDS:
        from tpu_kquant.ops.pallas_qmm import qmm_pallas

        return qmm_pallas(x, qt, out_dtype=out_dtype)

    # compute dtype follows the activations: bf16 activations -> bf16 MXU
    # matmul (f32 accumulate); f32 activations -> full-precision parity path
    cdt = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    wt = dequant_kmajor(qt, dtype=cdt)  # [K, N]
    if qt.tp in ("col", "row"):
        # pin the dequanted weight to the loader's Megatron orientation so
        # the SPMD partitioner cannot reshard packed weights per layer
        # (parallel.sharding.tp_shard_constraints has the full story)
        from tpu_kquant.parallel.sharding import current_tp_ctx

        ctx = current_tp_ctx()
        if ctx is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh, axis = ctx
            n = mesh.shape[axis]
            spec = ((None, axis) if qt.tp == "col" else (axis, None))
            ok = (wt.ndim == 2
                  and wt.shape[1 if qt.tp == "col" else 0] % n == 0)
            if ok:
                wt = jax.lax.with_sharding_constraint(
                    wt, NamedSharding(mesh, P(*spec)))
    y = jax.lax.dot_general(
        x.astype(cdt),
        wt,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.astype(out_dtype)
