"""Stateless layer math shared by all models (pure functions over arrays).

The reference model code inherits RMSNorm / RoPE / SiLU-MLP from vLLM's CUDA
layer library; here they are jnp functions that XLA fuses into the
surrounding matmuls (elementwise chains ride along MXU epilogues on TPU, so
no hand-written kernels are needed for these).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm in fp32 accumulation, output in x.dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def l2_norm_scaled(x: jax.Array, weight: jax.Array | None,
                   bias: jax.Array | None, eps: float = 1e-6) -> jax.Array:
    """The speculator's LayerNorm variant: L2 normalize then scale+shift.

    Mirrors the semantics of MLPSpeculatorLayerNorm (reference
    ``arctic_speculator.py:59-96``): no mean subtraction.
    """
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def compute_rope_freqs(head_dim: int, rope_theta: float,
                       scaling: dict | None = None) -> jax.Array:
    """Inverse frequencies [head_dim//2], with optional Llama-3 scaling."""
    inv_freq = 1.0 / (rope_theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    if scaling and scaling.get("rope_type") == "llama3":
        factor = scaling["factor"]
        low = scaling.get("low_freq_factor", 1.0)
        high = scaling.get("high_freq_factor", 4.0)
        old_len = scaling.get("original_max_position_embeddings", 8192)
        wavelen = 2 * jnp.pi / inv_freq
        low_wl = old_len / low
        high_wl = old_len / high
        smooth = (old_len / wavelen - low) / (high - low)
        scaled = jnp.where(
            wavelen > low_wl, inv_freq / factor,
            jnp.where(wavelen < high_wl, inv_freq,
                      (1 - smooth) * inv_freq / factor + smooth * inv_freq))
        inv_freq = scaled
    return inv_freq


def apply_rope(x: jax.Array, positions: jax.Array,
               inv_freq: jax.Array) -> jax.Array:
    """Rotary embedding, interleaved-half convention (HF Llama).

    x: [T, H, D]; positions: [T]; inv_freq: [D//2].
    """
    angles = positions[:, None].astype(jnp.float32) * inv_freq[None, :]
    cos = jnp.cos(angles)[:, None, :]  # [T, 1, D/2]
    sin = jnp.sin(angles)[:, None, :]
    d2 = x.shape[-1] // 2
    x1 = x[..., :d2].astype(jnp.float32)
    x2 = x[..., d2:].astype(jnp.float32)
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def silu_mlp(x: jax.Array, w_gate: jax.Array, w_up: jax.Array,
             w_down: jax.Array) -> jax.Array:
    """SwiGLU MLP: down( silu(x@gate) * (x@up) )."""
    g = jnp.dot(x, w_gate, preferred_element_type=jnp.float32)
    u = jnp.dot(x, w_up, preferred_element_type=jnp.float32)
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    return jnp.dot(h, w_down, preferred_element_type=jnp.float32).astype(
        x.dtype)
