"""QTensor: a quantized tensor as a JAX pytree of packed device arrays.

This is the on-device analog of the reference's quantized ggml tensors (whose
``data`` pointers alias the GGUF mmap, SURVEY.md section 3.2): packed bits stay
packed in HBM; kernels dequantize in VMEM tiles.

Two layouts:

- ``kmajor``  — for matmul weights W with logical shape (N, K): arrays are
  stored K-major ([K/2, N] packed nibbles etc.) so the contraction dimension
  is the sublane axis of weight tiles and output columns are lanes.
  Nibble fold: byte (k, n) holds element k (low nibble) and element k + K/2
  (high nibble), so unpack is `concat([b & 15, b >> 4], axis=0)` — pure VPU
  masks plus a sublane concat, no lane shuffles.
- ``rowmajor`` — for embedding tables (gather along N): arrays keep rows
  intact ([N, K/2] fold along K within each row).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """Packed quantized tensor.

    kind: 'q4_k' | 'q5_k' | 'q6_k' | 'q8_0' | 'q3_k' | 'q2_k' | 'dense'
    layout: 'kmajor' | 'rowmajor' | 'dense'
    shape: logical float shape, numpy row-major (e.g. (N, K) for a weight)
    arrays: packed fields, e.g. {'qs': u8[K/2, N], 'scales': f32[K/32, N], ...}
    """

    kind: str
    layout: str
    shape: tuple[int, ...]
    arrays: dict[str, Any]

    def tree_flatten(self):
        keys = sorted(self.arrays)
        return [self.arrays[k] for k in keys], (self.kind, self.layout, self.shape, tuple(keys))

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, layout, shape, keys = aux
        return cls(kind, layout, shape, dict(zip(keys, children)))

    @property
    def n_bytes(self) -> int:
        return sum(v.size * v.dtype.itemsize for v in jax.tree.leaves(self.arrays))

    @property
    def bits_per_element(self) -> float:
        import numpy as np

        return self.n_bytes * 8.0 / float(np.prod(self.shape))

    def astype_scales(self, dtype) -> "QTensor":
        """Cast scale/min side-arrays (not packed codes) to ``dtype``."""
        arrs = {
            k: (v.astype(dtype) if v.dtype in (jnp.float32, jnp.bfloat16, jnp.float16) else v)
            for k, v in self.arrays.items()
        }
        return QTensor(self.kind, self.layout, self.shape, arrs)
