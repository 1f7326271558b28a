"""Weight-only FP8 (float8_e4m3) linear layers.

Why this matters on TPU: batched decode is weight-bandwidth-bound, so
storing matmul weights as fp8 halves HBM traffic vs bf16 — the same
motivation as the reference's FP8 checkpoints (reference
``vllm/spec_dec/fp8.py:69-71`` uses CUDA ``torch._scaled_mm``; TPU v5e has
no native fp8 MXU, so the win is bandwidth, not FLOPs).  The hot path is a
Pallas kernel that streams fp8 weight tiles HBM->VMEM, dequantizes in
registers and feeds bf16 tiles to the MXU (``ops/pallas/fp8_matmul.py``);
the portable fallback lets XLA fuse ``convert(w) * scale`` into the dot.

``QuantizedLinear`` is a pytree node, so quantized params flow through
``lax.scan`` / ``pjit`` like any other leaf (leading layer dim slices off
naturally).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

FP8_DTYPE = jnp.float8_e4m3fn
FP8_MAX = 448.0


@jax.tree_util.register_pytree_node_class
class QuantizedLinear:
    """fp8 values + fp32 scale; ``dequant = weight.astype(f32) * scale``."""

    def __init__(self, weight: jax.Array, scale: jax.Array):
        self.weight = weight
        self.scale = scale

    def tree_flatten(self):
        return (self.weight, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.weight.shape

    @property
    def out_features(self):
        return self.weight.shape[-1]

    def __repr__(self):
        return (f"QuantizedLinear(weight={self.weight.shape} "
                f"{self.weight.dtype}, scale={self.scale.shape})")


def fp8_quantize(w: jax.Array) -> QuantizedLinear:
    """Per-tensor symmetric quantization to e4m3.

    For stacked layer weights ``[L, in, out]`` the scale is per layer
    (``[L]``) so each layer keeps its own dynamic range.
    """
    wf = w.astype(jnp.float32)
    if w.ndim >= 3:
        # Stacked layer (and, for MoE, expert) weights: per-layer scale.
        amax = jnp.max(jnp.abs(wf), axis=tuple(range(1, w.ndim)))
        scale = jnp.maximum(amax, 1e-12) / FP8_MAX
        q = wf / scale.reshape((-1,) + (1,) * (w.ndim - 1))
    else:
        amax = jnp.max(jnp.abs(wf))
        scale = jnp.maximum(amax, 1e-12) / FP8_MAX
        q = wf / scale
    q = jnp.clip(q, -FP8_MAX, FP8_MAX).astype(FP8_DTYPE)
    return QuantizedLinear(weight=q, scale=scale.astype(jnp.float32))


def fp8_dequantize(q: QuantizedLinear,
                   dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    scale = q.scale
    w = q.weight.astype(jnp.float32)
    if w.ndim >= 3 and scale.ndim == 1:
        scale = scale.reshape((-1,) + (1,) * (w.ndim - 1))
    return (w * scale).astype(dtype)


def matmul(x: jax.Array, w, preferred_element_type=None) -> jax.Array:
    """``x @ w`` where ``w`` is a plain array or a QuantizedLinear.

    Output dtype follows x.dtype unless ``preferred_element_type`` is given.

    The fp8 path deliberately uses XLA's fused convert+dot: profiled on
    v5e it streams fp8 weights at ~full HBM bandwidth (~830 GB/s),
    ~10x faster than a hand-written Pallas dequant kernel because the
    fp8->bf16 VPU convert is slow in Mosaic while XLA lowers the dequant
    into the convolution fusion.  (``ops/pallas/fp8_matmul.py`` is kept
    for experimentation; enable with ARCTIC_TPU_FORCE_PALLAS_FP8=1.)
    """
    out_dtype = preferred_element_type or x.dtype
    if isinstance(w, QuantizedLinear):
        import os

        if (os.environ.get("ARCTIC_TPU_FORCE_PALLAS_FP8") == "1"
                and jax.default_backend() == "tpu"
                and w.weight.ndim == 2
                and _pallas_shapes_ok(x, w.weight)):
            from arcticinference_tpu.ops.pallas.fp8_matmul import (
                fp8_matmul_kernel)
            return fp8_matmul_kernel(x, w.weight, w.scale).astype(out_dtype)
        # Scale folded outside the dot: one multiply on the (small) output
        # instead of the (huge) weight.
        y = jnp.dot(x.astype(jnp.bfloat16), w.weight.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        scale = w.scale if w.scale.ndim == 0 else w.scale.reshape(())
        return (y * scale).astype(out_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y.astype(out_dtype)


def _pallas_shapes_ok(x: jax.Array, w: jax.Array) -> bool:
    """The fused kernel wants MXU-aligned K and N."""
    k, n = w.shape
    return k % 128 == 0 and n % 128 == 0
