"""Mesh construction for TP/DP/EP over ICI (+DCN across hosts)."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    model: int = 1,
    expert: int = 1,
    devices=None,
) -> Mesh:
    """Create a ('data', 'expert', 'model') mesh.

    'model' is innermost so tensor-parallel collectives ride the
    fastest-varying (ICI-adjacent) axis of the device order; 'data' is
    outermost (DCN-friendly across hosts).
    """
    devices = devices if devices is not None else jax.devices()
    n = data * expert * model
    if n > len(devices):
        raise ValueError(f"mesh {data}x{expert}x{model} needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(data, expert, model)
    return Mesh(dev, ("data", "expert", "model"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, 1)
