"""Rotary position embeddings, NeoX-style, with linear and YaRN scaling.

Replaces the reference's rope_f32 CPU op (SURVEY.md 3.3: ``rope_yarn``,
``ggml_rope_yarn_corr_dims``, ``__sincosf`` frames on the decode path). The
YaRN correction/ramp math follows the published YaRN scheme so GGUF models
carrying ``rope.scaling.type = "yarn"`` metadata reproduce the same
frequencies.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RopeParams:
    head_dim: int
    n_rot: int  # rotated dims (usually == head_dim)
    freq_base: float = 10000.0
    freq_scale: float = 1.0  # 1 / scaling factor
    ext_factor: float = 0.0  # YaRN extrapolation mix (0 = plain/linear)
    attn_factor: float = 1.0
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    n_ctx_orig: int = 0  # original training context (YaRN)
    # pairing convention of the rotation (ggml rope types):
    #   'norm' — adjacent pairs (2i, 2i+1); llama/mistral GGUF exports store
    #            q/k in Meta layout for this mode
    #   'neox' — split-half pairs (i, i + D/2); qwen2/phi3/HF-native layout
    mode: str = "norm"


def _yarn_corr_dim(n_rot: int, n_ctx_orig: int, beta: float, base: float) -> float:
    """Dimension index whose wavelength equals n_ctx_orig / beta rotations."""
    return n_rot * math.log(n_ctx_orig / (beta * 2 * math.pi)) / (2 * math.log(base))


def rope_cos_sin(positions: jnp.ndarray, p: RopeParams) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for given positions. positions: [...]; returns [..., n_rot/2]."""
    half = p.n_rot // 2
    dim_idx = jnp.arange(half, dtype=jnp.float32)
    theta_extrap = positions.astype(jnp.float32)[..., None] * (
        p.freq_base ** (-2.0 * dim_idx / p.n_rot)
    )
    theta_interp = p.freq_scale * theta_extrap
    mscale = p.attn_factor
    if p.ext_factor != 0.0 and p.n_ctx_orig > 0:
        low = _yarn_corr_dim(p.n_rot, p.n_ctx_orig, p.beta_fast, p.freq_base)
        high = _yarn_corr_dim(p.n_rot, p.n_ctx_orig, p.beta_slow, p.freq_base)
        low, high = max(0.0, math.floor(low)), min(p.n_rot - 1.0, math.ceil(high))
        ramp = 1.0 - jnp.clip((dim_idx - low) / max(0.001, high - low), 0.0, 1.0)
        mix = ramp * p.ext_factor
        theta = theta_interp * (1.0 - mix) + theta_extrap * mix
        mscale = p.attn_factor * (1.0 + 0.1 * math.log(1.0 / p.freq_scale))
    else:
        theta = theta_interp
    return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale


def rope_delta_cos_sin(delta, p: RopeParams) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unit-magnitude rotation tables for re-rotating already-roped K vectors
    by ``delta`` positions (KV-cache context shift, the llama.cpp
    llama_kv_cache_seq_add/K-shift equivalent).

    rope theta is linear in position (theta(pos) = pos * f_dim, with f_dim a
    per-dimension constant even under YaRN mixing), so rope(pos + delta) =
    rotate(rope(pos), delta). rope_cos_sin folds the YaRN attention mscale
    into both tables; a shift must be a *pure* rotation, so divide it out
    (cos at position 0 is exactly mscale)."""
    c0, _ = rope_cos_sin(jnp.zeros((), jnp.float32), p)
    c, s = rope_cos_sin(jnp.asarray(delta, jnp.float32), p)
    return c / c0, s / c0


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, mode: str = "norm"
) -> jnp.ndarray:
    """Rotary rotation over the last dim.

    x: [..., H, D]; cos/sin broadcastable to [..., 1, D/2].

    mode='neox': pairs (i, i + D/2) — HF rotate_half / ggml NEOX.
    mode='norm': adjacent pairs (2i, 2i+1) — ggml NORM; real llama/mistral
    GGUF files store q/k weights permuted for exactly this pairing
    (llama.cpp's convert-time `permute`), so loading them requires it.
    """
    d2 = x.shape[-1] // 2
    rot = x[..., : 2 * d2].astype(jnp.float32)
    if mode == "neox":
        x1, x2 = rot[..., :d2], rot[..., d2:]
        y1 = x1 * cos - x2 * sin
        y2 = x2 * cos + x1 * sin
        out = jnp.concatenate([y1, y2], axis=-1)
    else:
        x1 = rot[..., 0::2]
        x2 = rot[..., 1::2]
        y1 = x1 * cos - x2 * sin
        y2 = x2 * cos + x1 * sin
        out = jnp.stack([y1, y2], axis=-1).reshape(rot.shape)
    if x.shape[-1] > 2 * d2:
        out = jnp.concatenate([out, x[..., 2 * d2 :].astype(jnp.float32)], axis=-1)
    return out.astype(x.dtype)
