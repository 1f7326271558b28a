"""Fused int4-dequant matmul: bf16 activations x packed-int4 weights.

int4's win over fp8/int8 is HBM bandwidth: 4 bits/weight means an 8B
model streams ~4 GB per decode step instead of ~8 GB.  XLA cannot fuse
the nibble unpack into a dot operand (it materializes the unpacked
weights to HBM, ~12x slower end to end), so this Mosaic kernel does the
unpack in registers:

- the weight is SPLIT-HALF packed (``ops/fp8.py::_pack_int4``): byte row
  ``u`` carries unpacked row ``u`` (low nibble) and ``u + K/2`` (high
  nibble), so the two halves are recovered with pure elementwise shifts
  — no interleave/relayout in the kernel;
- the grid walks the PACKED K dim once (each byte read exactly once);
  every iteration contracts two K-ranges of ``x`` (one per nibble half)
  against the shifted copies of the same packed block;
- group quantization scales (``[K/G, N]``, G=128) are applied per
  G-row sub-dot on the f32 accumulator as a [1, bn] row broadcast, so
  the MXU sees plain bf16 tiles.

This is the TPU analogue of the reference's CUDA ``torch._scaled_mm``
path for quantized weights (reference ``vllm/spec_dec/fp8.py:303-308``),
specialized for weight-only int4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128  # quantization group size along the (unpacked) input dim


def _mm_kernel(x_lo_ref, x_hi_ref, w_ref, s_lo_ref, s_hi_ref, out_ref,
               acc_ref, *, n_k: int, bkp: int):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mosaic has no int8 vector shifts; unpack in int32 registers (the
    # HBM read above is still 4 bits/weight).  Measured on v5e: the
    # block-wide unpack beats a per-tile unpack (better VPU/MXU overlap).
    wp = w_ref[...].astype(jnp.int32)                  # [bkp, bn] packed
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(wp, jnp.int32(28)), jnp.int32(28))
    hi = jax.lax.shift_right_arithmetic(wp, jnp.int32(4))

    for half, x_ref, s_ref in ((lo, x_lo_ref, s_lo_ref),
                               (hi, x_hi_ref, s_hi_ref)):
        for g in range(bkp // GROUP):
            wg = half[g * GROUP:(g + 1) * GROUP, :].astype(jnp.bfloat16)
            xg = x_ref[:, g * GROUP:(g + 1) * GROUP]
            y = jax.lax.dot_general(
                xg, wg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [bm, bn]
            acc_ref[...] += y * s_ref[g:g + 1, :]      # [1, bn] broadcast

    @pl.when(kk == n_k - 1)
    def _done():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _pick_block(dim: int, preferred: int, multiple: int) -> int:
    for b in (preferred, 512, 256, 128):
        if b <= preferred and b % multiple == 0 and dim % b == 0:
            return b
    return multiple


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def int4_matmul_kernel(x: jax.Array, w_packed: jax.Array,
                       scale: jax.Array,
                       out_dtype=jnp.bfloat16) -> jax.Array:
    """``x @ dequant(w)`` with split-half packed int4 ``w``.

    x: [M, K] (cast to bf16); w_packed: [K/2, N] int8 (two nibbles per
    byte); scale: [K/GROUP, N] f32 group scales.  K/2 must divide by
    8*GROUP and N by 128 (see ``int4_shapes_ok``); M is padded
    internally.
    """
    m, k = x.shape
    kp, n = w_packed.shape
    assert kp * 2 == k, (x.shape, w_packed.shape)
    kg, n2 = scale.shape
    assert n2 == n and kg * GROUP == k, (scale.shape, (k, n))
    assert kp % GROUP == 0, "packed half must divide the group size"

    bm = min(256, -(-m // 8) * 8)
    mp = -(-m // bm) * bm
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    # Scale blocks need >= 8 sublane rows -> bkp = 8 groups of 128.
    bkp = 8 * GROUP
    assert kp % bkp == 0, (
        f"packed K/2={kp} must divide by {bkp} (shapes_ok gates this)")
    bn = _pick_block(n, 512, 128)
    n_k = kp // bkp
    sg = bkp // GROUP                     # scale rows per block (= 8)

    out = pl.pallas_call(
        functools.partial(_mm_kernel, n_k=n_k, bkp=bkp),
        grid=(mp // bm, n // bn, n_k),
        in_specs=[
            # x columns for the low-nibble half: [kk*bkp, kk*bkp+bkp)
            pl.BlockSpec((bm, bkp), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            # x columns for the high-nibble half: offset by K/2.
            pl.BlockSpec((bm, bkp), lambda i, j, kk: (i, kk + n_k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bkp, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            # Group-scale rows for each half.
            pl.BlockSpec((sg, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sg, bn), lambda i, j, kk: (kk + n_k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 2 + kp * n + kg * n * 4 + mp * n * 2,
            transcendentals=0),
    )(x.astype(jnp.bfloat16), x.astype(jnp.bfloat16), w_packed,
      scale.astype(jnp.float32), scale.astype(jnp.float32))
    return out[:m] if mp != m else out


def int4_shapes_ok(k: int, n: int) -> bool:
    """True when the kernel's block constraints admit this weight."""
    return (k // 2) % (8 * GROUP) == 0 and n % 128 == 0


def int4_matmul_reference(x, w_packed, scale, out_dtype=jnp.bfloat16):
    """jnp oracle: explicit unpack + group dequant + dot."""
    from arcticinference_tpu.ops.fp8 import _unpack_int4

    k = w_packed.shape[0] * 2
    n = w_packed.shape[1]
    w4 = _unpack_int4(w_packed).astype(jnp.float32)
    wg = w4.reshape(scale.shape[0], GROUP, n)
    wd = (wg * scale[:, None, :]).reshape(k, n).astype(jnp.bfloat16)
    y = jnp.dot(x.astype(jnp.bfloat16), wd,
                preferred_element_type=jnp.float32)
    return y.astype(out_dtype)
