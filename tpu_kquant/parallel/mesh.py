"""Mesh construction for TP/DP/EP over ICI (+DCN across hosts)."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    model: int = 1,
    expert: int = 1,
    pipe: int = 1,
    devices=None,
) -> Mesh:
    """Create a ('data', 'pipe', 'expert', 'model') mesh.

    'model' is innermost so tensor-parallel collectives ride the
    fastest-varying (ICI-adjacent) axis of the device order; 'data' is
    outermost (DCN-friendly across hosts); 'pipe' sits between them —
    pipeline point-to-point traffic is the lightest, so it tolerates the
    slowest links (typically DCN across hosts for 70B-class PP).
    """
    devices = devices if devices is not None else jax.devices()
    n = data * pipe * expert * model
    if n > len(devices):
        raise ValueError(
            f"mesh {data}x{pipe}x{expert}x{model} needs {n} devices, have {len(devices)}"
        )
    dev = np.asarray(devices[:n]).reshape(data, pipe, expert, model)
    return Mesh(dev, ("data", "pipe", "expert", "model"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, 1)
