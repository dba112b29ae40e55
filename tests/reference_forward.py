"""Independent NumPy reference forward for parity tests.

Deliberately implemented from the architecture definition (not by calling any
tpu_kquant op), mirroring SURVEY.md section 4's implication (c): end-to-end
logit parity of the engine vs a dequantized-fp32 forward.
"""

from __future__ import annotations

import numpy as np


def rms_norm(x, w, eps):
    return x / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + eps) * w


def rope(x, positions, base):
    # x: [T, H, D]; ggml NORM mode: rotate adjacent pairs (2i, 2i+1)
    T, H, D = x.shape
    half = D // 2
    inv = base ** (-2.0 * np.arange(half) / D)
    theta = positions[:, None] * inv[None, :]  # [T, half]
    cos, sin = np.cos(theta)[:, None, :], np.sin(theta)[:, None, :]
    x1, x2 = x[..., 0::2], x[..., 1::2]
    out = np.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.reshape(x.shape)


def softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def silu(x):
    return x / (1.0 + np.exp(-x))


def ref_forward(reader, cfg, tokens):
    """Full-sequence causal forward. tokens: [T] -> logits [T, vocab]."""
    t = lambda name: reader.tensor_float(name).astype(np.float64)
    T = len(tokens)
    positions = np.arange(T, dtype=np.float64)
    x = t("token_embd.weight")[tokens]
    H, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        h = rms_norm(x, t(p + "attn_norm.weight"), cfg.norm_eps)
        q = (h @ t(p + "attn_q.weight").T).reshape(T, H, D)
        k = (h @ t(p + "attn_k.weight").T).reshape(T, Hkv, D)
        v = (h @ t(p + "attn_v.weight").T).reshape(T, Hkv, D)
        q = rope(q, positions, cfg.rope.freq_base)
        k = rope(k, positions, cfg.rope.freq_base)
        G = H // Hkv
        k_rep = np.repeat(k, G, axis=1)  # [T, H, D]
        v_rep = np.repeat(v, G, axis=1)
        logits = np.einsum("thd,shd->hts", q, k_rep) / np.sqrt(D)
        mask = np.tril(np.ones((T, T), bool))
        logits = np.where(mask[None], logits, -np.inf)
        attn = np.einsum("hts,shd->thd", softmax(logits), v_rep).reshape(T, H * D)
        x = x + attn @ t(p + "attn_output.weight").T
        h = rms_norm(x, t(p + "ffn_norm.weight"), cfg.norm_eps)
        gate = h @ t(p + "ffn_gate.weight").T
        up = h @ t(p + "ffn_up.weight").T
        x = x + (silu(gate) * up) @ t(p + "ffn_down.weight").T
    x = rms_norm(x, t("output_norm.weight"), cfg.norm_eps)
    return x @ t("output.weight").T
