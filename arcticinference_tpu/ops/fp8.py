"""Weight-only quantized linear layers: FP8 (e4m3), INT8, INT4.

Why this matters on TPU: batched decode is weight-bandwidth-bound, so
storing matmul weights as fp8/int8 halves HBM traffic vs bf16 and int4
quarters it — the same motivation as the reference's FP8 checkpoints
(reference ``vllm/spec_dec/fp8.py:69-71`` uses CUDA ``torch._scaled_mm``;
TPU v5e has no native fp8 MXU, so the win is bandwidth, not FLOPs).  The
hot path lets XLA fuse ``convert(w) * scale`` into the dot's weight
stream; a Pallas fp8 kernel (``ops/pallas/fp8_matmul.py``) is kept for
experiments.

Scale granularities (selected by quantization mode, encoded purely in
the scale's rank relative to the weight's):
- fp8: per tensor / per stacked layer (matches fp8 checkpoints);
- int8: per output channel (``[.., out]``);
- int4: per (group of 128 input rows, output channel)
  (``[.., in/128, out]``, AWQ/GPTQ-style group quantization).

Measured on one v5e chip (8B, batch-64 greedy decode incl. prefill):
int8 2063 tok/s > fp8 1941 tok/s (int8->bf16 convert is cheaper than
fp8->bf16 in the dot fusion) > int4 1567 tok/s via the Mosaic kernel
(``ops/pallas/int4_matmul.py``; XLA cannot fuse the nibble unpack into
a dot operand and materializes unpacked weights — 164 tok/s — so the
kernel is the default int4 path on TPU).  int4's draw is capacity: 8B
weights in ~4.3 GB, at ~80% of fp8 throughput; the register unpack is
VPU-bound, which caps it below int4's 2x bandwidth ceiling.

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
INT4_GROUP = 128


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


def int_quantize(w: jax.Array, bits: int = 8,
                 group_size: Optional[int] = None) -> QuantizedLinear:
    """Symmetric round-to-nearest int8/int4 weight quantization.

    ``w`` is ``[.., in, out]``.  int8 gets per-output-channel scales
    (``[.., out]``); int4 additionally groups the input dim
    (``[.., in/g, out]``).  The granularity is recovered from the scale's
    rank at dequant/matmul time, so no extra metadata rides the pytree.

    int4 values are packed two-per-int8 byte along the input dim (row
    ``2i`` in the low nibble, ``2i+1`` in the high nibble): the stored
    weight is ``int8 [.., in/2, out]``.  Packing ourselves (instead of
    ``jnp.int4``) keeps the array in a plain well-supported dtype — the
    unpack (two shifts) fuses into the dot's weight stream, and the HBM
    footprint is the same 4 bits/weight.
    """
    assert bits in (8, 4)
    if group_size is None and bits == 4:
        group_size = INT4_GROUP
    wf = w.astype(jnp.float32)
    qmax = 127.0 if bits == 8 else 7.0
    packed = bool(group_size and w.shape[-2] % group_size == 0)
    if packed:
        g = group_size
        lead = wf.shape[:-2]
        kin, out = wf.shape[-2:]
        wg = wf.reshape(*lead, kin // g, g, out)
        amax = jnp.max(jnp.abs(wg), axis=-2)              # [.., in/g, out]
        scale = jnp.maximum(amax, 1e-12) / qmax
        q = jnp.round(wg / scale[..., None, :]).reshape(*lead, kin, out)
    else:
        # Sub-group weights (tiny layers / tests): per-out-channel scale,
        # int4 VALUES stored unpacked in int8 (the matmul treats them as
        # int8; the HBM saving only matters for group-sized weights).
        amax = jnp.max(jnp.abs(wf), axis=-2)              # [.., out]
        scale = jnp.maximum(amax, 1e-12) / qmax
        q = jnp.round(wf / scale[..., None, :])
    q = jnp.clip(q, -qmax, qmax).astype(jnp.int8)
    if packed:
        q = _pack_int4(q)
    return QuantizedLinear(q, scale.astype(jnp.float32))


def _pack_int4(q: jax.Array) -> jax.Array:
    """[.., in, out] int8 in [-7, 7] -> [.., in/2, out] packed nibbles.

    SPLIT-HALF pairing: byte row ``u`` holds unpacked row ``u`` in its
    low nibble and row ``u + in/2`` in its high nibble.  Unpacking is
    then two elementwise shifts plus a CONCAT along the input dim — no
    row interleave — which is what lets the Pallas matmul kernel (and
    XLA's fallback) consume the halves without any relayout.
    """
    lead = q.shape[:-2]
    kin, out = q.shape[-2:]
    assert kin % 2 == 0
    lo = q[..., : kin // 2, :] & jnp.int8(0x0F)
    hi = jax.lax.shift_left(q[..., kin // 2:, :], jnp.int8(4))
    return (lo | hi).astype(jnp.int8)


def _unpack_int4(w: jax.Array) -> jax.Array:
    """Packed [.., in/2, out] int8 -> [.., in, out] int8 (sign-extended,
    split-half order: low nibbles first, high nibbles second)."""
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(w, jnp.int8(4)), jnp.int8(4))
    hi = jax.lax.shift_right_arithmetic(w, jnp.int8(4))
    return jnp.concatenate([lo, hi], axis=-2)


def weight_quantize(w: jax.Array, mode: str) -> QuantizedLinear:
    """Quantize by mode name: "fp8" | "int8" | "int4"."""
    if mode == "fp8":
        return fp8_quantize(w)
    if mode == "int8":
        return int_quantize(w, bits=8)
    if mode == "int4":
        return int_quantize(w, bits=4)
    raise ValueError(f"unknown quantization mode {mode!r}")


def fuse_quantized(parts: list, interleave: int = 1):
    """Concatenate linear weights along the out axis into ONE matmul
    operand (fused qkv / gate+up decode-path optimization).

    Quantized parts keep their original scale granularity exactly: each
    part's per-tensor/per-layer scale is broadcast to per-out-channel
    over its own column span, so ``dequant(fused)[..., span]`` is
    bit-identical to ``dequant(part)``.  The fused matmul then takes the
    (already fast) per-out-channel epilogue of the int8 path.

    ``interleave=W`` emits the W-shard-interleaved column order
    ``[p0_0|p1_0|..|p0_1|p1_1|..]`` (chunk f of each part = its f-th
    1/W out-column slice): a contiguous W-way split of the fused out
    axis then hands shard f exactly ``[q_f|k_f|v_f]`` — the layout that
    lets the fused weights shard over tp and re-slice under shift
    (parallel/ulysses.py layer_params).  Because consecutive chunks of
    one part tile its contiguous column range in order, the PER-PART
    column order inside any contiguous group of shards is unchanged —
    no wo/w_down row permutation is needed anywhere.

    Why fuse: batched decode is weight-stream-bound and v5e pays a fixed
    per-dot cost that dominates the small q/k/v dots; one [d, nq+2*nkv]
    dot streams the same bytes in ~half the device time (measured in
    ``benchmarks/stream_microbench.py``).
    """
    def chunks(arrs):
        """Interleave: per-shard chunks of each part, shard-major."""
        if interleave == 1:
            return list(arrs)
        out = []
        for f in range(interleave):
            for a in arrs:
                n = a.shape[-1]
                assert n % interleave == 0, \
                    f"out dim {n} not divisible by interleave={interleave}"
                nf = n // interleave
                out.append(a[..., f * nf:(f + 1) * nf])
        return out

    if not any(isinstance(p, QuantizedLinear) for p in parts):
        return jnp.concatenate(chunks(parts), axis=-1)
    assert all(isinstance(p, QuantizedLinear) for p in parts), \
        "cannot fuse quantized with unquantized weights"
    w = jnp.concatenate(chunks([p.weight for p in parts]), axis=-1)
    scales = []
    group = parts[0].scale.ndim == parts[0].weight.ndim
    for p in parts:
        s, wq = p.scale, p.weight
        n = wq.shape[-1]
        if s.ndim == wq.ndim:                 # int4 group [.., in/g, out]
            assert group, "mixed scale granularities"
            scales.append(s)
            continue
        assert not group, "mixed scale granularities"
        if s.ndim == wq.ndim - 1 and s.shape[-1] == n:
            scales.append(s)                  # per-out-channel already
        else:                                 # per-tensor / per-layer
            tgt = wq.shape[:-2] + (n,)
            s = s.reshape(s.shape + (1,) * (len(tgt) - s.ndim))
            scales.append(jnp.broadcast_to(s.astype(jnp.float32), tgt))
    return QuantizedLinear(weight=w,
                           scale=jnp.concatenate(chunks(scales), axis=-1))


def fp8_dequantize(q: QuantizedLinear,
                   dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    """Dequantize any QuantizedLinear (fp8/int8/int4; granularity is
    encoded in the scale's rank — see int_quantize)."""
    scale = q.scale
    wq = q.weight
    if scale.ndim == wq.ndim:         # group scales => packed int4
        wq = _unpack_int4(wq)
        w = wq.astype(jnp.float32)
        g = w.shape[-2] // scale.shape[-2]
        lead = w.shape[:-2]
        wg = w.reshape(*lead, scale.shape[-2], g, w.shape[-1])
        return (wg * scale[..., None, :]).reshape(w.shape).astype(dtype)
    w = wq.astype(jnp.float32)
    if scale.ndim == w.ndim - 1 and scale.shape[-1] == w.shape[-1]:
        return (w * scale[..., None, :]).astype(dtype)    # per out-channel
    if w.ndim >= 3 and scale.ndim == 1:
        scale = scale.reshape((-1,) + (1,) * (w.ndim - 1))
    return (w * scale).astype(dtype)


dequantize = fp8_dequantize


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

        wq, s = w.weight, w.scale
        if (os.environ.get("ARCTIC_TPU_FORCE_PALLAS_FP8") == "1"
                and jax.default_backend() == "tpu"
                and wq.dtype == FP8_DTYPE and wq.ndim == 2
                and s.ndim == 0 and _pallas_shapes_ok(x, wq)):
            from arcticinference_tpu.ops.pallas.fp8_matmul import (
                fp8_matmul_kernel)
            return fp8_matmul_kernel(x, wq, s).astype(out_dtype)
        if s.ndim == wq.ndim:
            # Packed int4, group scales [in/g, out].
            if (jax.default_backend() == "tpu" and wq.ndim == 2
                    and os.environ.get("ARCTIC_TPU_DISABLE_PALLAS") != "1"):
                from arcticinference_tpu.ops.pallas.int4_matmul import (
                    int4_matmul_kernel, int4_shapes_ok)
                if int4_shapes_ok(wq.shape[-2] * 2, wq.shape[-1]):
                    # Mosaic kernel: unpacks nibbles in registers.  XLA
                    # cannot fuse the unpack into a dot operand — it
                    # materializes unpacked weights to HBM (~12x slower
                    # end to end), so the kernel is the default here.
                    return int4_matmul_kernel(x, wq, s).astype(out_dtype)
            # Fallback: explicit unpack + dequant on the weight side.
            w4 = _unpack_int4(wq)
            g = w4.shape[-2] // s.shape[-2]
            wg = w4.astype(jnp.float32).reshape(
                s.shape[-2], g, w4.shape[-1])
            wd = (wg * s[..., None, :]).reshape(w4.shape).astype(
                jnp.bfloat16)
            y = jnp.dot(x.astype(jnp.bfloat16), wd,
                        preferred_element_type=jnp.float32)
            return y.astype(out_dtype)
        y = jnp.dot(x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        if s.ndim == wq.ndim - 1 and s.shape[-1] == wq.shape[-1]:
            # int8 per-output-channel: one multiply on the (small) output.
            return (y * s[None, :]).astype(out_dtype)
        # fp8 per-tensor/layer: scale folded outside the dot — one
        # multiply on the (small) output instead of the (huge) weight.
        return (y * s.reshape(())).astype(out_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y.astype(out_dtype)


def _pallas_shapes_ok(x: jax.Array, w: jax.Array) -> bool:
    """The fused kernel wants MXU-aligned K and N."""
    k, n = w.shape
    return k % 128 == 0 and n % 128 == 0
