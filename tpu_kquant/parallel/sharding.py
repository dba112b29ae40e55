"""GSPMD sharding rules for packed QTensors (TP/DP; EP via expert sharding).

Megatron-style tensor parallelism, adapted to packed layouts: column-parallel
projections shard the output dim N (the lane axis of every kmajor array);
row-parallel projections shard the contraction dim K — and because every
kmajor side array's leading axis is K-derived (K/2 nibbles, K/8 qh bits,
K/g scales), one PartitionSpec per orientation covers all packed fields, and
256-element superblocks never straddle shards as long as K/(2*n_model) stays
a multiple of the pack fold (guaranteed: K multiple of 256, n_model a power
of two). XLA inserts the all-reduce after row-parallel matmuls.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_kquant.quant.qtensor import QTensor

# tensor-name suffix -> TP orientation
_COLUMN_PARALLEL = ("attn_q.weight", "attn_k.weight", "attn_v.weight",
                    "attn_qk.weight", "ffn_gateup.weight",
                    "ffn_gate.weight", "ffn_up.weight", "output.weight",
                    "ffn_gate_exps.weight", "ffn_up_exps.weight")
_ROW_PARALLEL = ("attn_output.weight", "ffn_down.weight", "ffn_down_exps.weight")


def _orientation(name: str) -> str:
    if any(name.endswith(s) or s in name for s in _ROW_PARALLEL):
        return "row"
    if any(name.endswith(s) or s in name for s in _COLUMN_PARALLEL):
        return "col"
    return "replicated"


def _divisible(qt: QTensor, axis: int, n: int) -> bool:
    return all(v.shape[axis] % n == 0 for v in qt.arrays.values() if v.ndim == 2)


def shard_qtensor(qt: QTensor, mesh: Mesh, orientation: str) -> QTensor:
    """device_put a QTensor with TP (+EP for stacked experts) sharding.

    kmajor arrays are [K-ish, N]; stacked expert arrays are [E, K-ish, N]
    and additionally shard their leading axis over 'expert'."""
    n_model = mesh.shape["model"]
    n_expert = mesh.shape["expert"]

    def spec_for(v) -> P:
        tp: tuple = (None, None)
        kax, nax = v.ndim - 2, v.ndim - 1
        if qt.layout == "kmajor" and n_model > 1 and v.ndim >= 2:
            if orientation == "col" and v.shape[nax] % n_model == 0:
                tp = (None, "model")
            elif orientation == "row" and v.shape[kax] % n_model == 0:
                tp = ("model", None)
        if v.ndim == 3:
            e = "expert" if (n_expert > 1 and v.shape[0] % n_expert == 0) else None
            return P(e, *tp)
        if v.ndim == 2:
            return P(*tp)
        return P()

    arrays = {
        k: jax.device_put(v, NamedSharding(mesh, spec_for(v)))
        for k, v in qt.arrays.items()
    }
    return QTensor(qt.kind, qt.layout, qt.shape, arrays)


def make_param_put(mesh: Mesh, moe_impl: str = "ep"):
    """A ``put(name, qtensor)`` for runtime.loader.load_model that applies the
    TP rules above (embeddings and norms replicated).

    moe_impl: expert-parallel strategy when mesh has an 'expert' axis —
    'ep' (dense sharded einsum) or 'a2a' (ragged all_to_all dispatch,
    models.moe_a2a; requires passing mesh= to the engine/forward)."""

    def put(name: str, qt: QTensor) -> QTensor:
        return shard_qtensor(qt, mesh, _orientation(name))

    put.tp_size = mesh.shape["model"]  # loader disables QK/gate-up fusion when >1
    put.ep_size = mesh.shape["expert"]  # loader switches MoE to the EP path
    put.moe_impl = moe_impl
    return put


def shard_cache(cache: Any, mesh: Mesh) -> Any:
    """Shard a KVCache: batch over 'data', kv heads over 'model'.
    ISWACache shards its full and ring sub-caches the same way."""
    from tpu_kquant.runtime.kv_cache import ISWACache

    if isinstance(cache, ISWACache):
        import dataclasses

        return dataclasses.replace(
            cache,
            full=None if cache.full is None else shard_cache(cache.full, mesh),
            swa=None if cache.swa is None else shard_cache(cache.swa, mesh),
        )
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]

    def put(x, with_head_axis: bool):
        if x is None:
            return None
        spec = [None] * x.ndim  # [L, B, Hkv, S(, D)]
        if n_data > 1 and x.shape[1] % n_data == 0:
            spec[1] = "data"
        h_ax = 2
        if with_head_axis and n_model > 1 and x.shape[h_ax] % n_model == 0:
            spec[h_ax] = "model"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    from tpu_kquant.runtime.kv_cache import KVCache

    return KVCache(
        k=put(cache.k, True),
        v=put(cache.v, True),
        k_scale=put(cache.k_scale, True),
        v_scale=put(cache.v_scale, True),
    )
