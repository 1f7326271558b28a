"""Fused weight-dequant matmul: bf16 activations x fp8 weights.

TPU v5e has no fp8 MXU path, so fp8's win is HBM bandwidth: weights stream
at half the bytes of bf16 and are widened to bf16 in VMEM right before the
MXU.  The per-tensor scale multiplies the fp32 accumulator once at the end
(e4m3 values fit bf16 exactly, so the convert is lossless).

This replaces the CUDA ``torch._scaled_mm`` path the reference uses for
its FP8 checkpoints (reference ``vllm/spec_dec/fp8.py:303-308``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(x_ref, w_ref, scale_ref, out_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    wt = w_ref[...].astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], wt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _done():
        out_ref[...] = (acc_ref[...] * scale_ref[0]).astype(out_ref.dtype)


def _pick_block(dim: int, preferred: int) -> int:
    for b in (preferred, 512, 256, 128):
        if b <= preferred and dim % b == 0:
            return b
    return 128


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def fp8_matmul_kernel(x: jax.Array, w: jax.Array, scale: jax.Array,
                      out_dtype=jnp.bfloat16) -> jax.Array:
    """``(x @ w.astype(bf16)) * scale`` with fp8 ``w`` streamed from HBM.

    x: [M, K] bf16; w: [K, N] float8_e4m3fn; scale: scalar (or [1]) f32.
    K and N must be multiples of 128; M is padded internally.
    """
    m, k = x.shape
    k2, n = w.shape
    assert k == k2, (x.shape, w.shape)
    bm = min(256, -(-m // 8) * 8)
    mp = -(-m // bm) * bm
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    bk = _pick_block(k, 512)
    bn = _pick_block(n, 512)
    n_k = k // bk

    out = pl.pallas_call(
        functools.partial(_mm_kernel, n_k=n_k),
        grid=(mp // bm, n // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 2 + k * n + mp * n * 2,
            transcendentals=0),
    )(x.astype(jnp.bfloat16), w, scale.reshape(1).astype(jnp.float32))
    return out[:m] if mp != m else out
