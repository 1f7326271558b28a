"""Paged KV cache: layout, allocation and token scatter-write.

Layout: one fused array ``[L, num_blocks, 2, block_size, Hkv*D]`` (K at
index 0, V at index 1 of the third axis).  One page = ``[2, Bs, Hkv*D]`` is
a single contiguous 128 KB (bf16, Hkv*D=1024) region, so the attention
kernel fetches a page's full K+V for every kv head in ONE DMA — the unit
that keeps HBM streaming at full bandwidth during batched decode.  Writes
are contiguous ``Hkv*D`` rows per token.

The write path is the TPU equivalent of the reference's
``reshape_and_cache_flash`` (and the SwiftKV bulk variant
``csrc/custom_ops/kernels.cu:15-69``): new tokens' K/V are scattered to
``slot_mapping`` positions.

FP8 mode stores e4m3 values with a per-model scale (amax-calibrated
online), halving KV HBM traffic — the dominant bandwidth term of batched
decode.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class KVCacheSpec:
    num_layers: int
    num_blocks: int
    num_kv_heads: int
    block_size: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def shape(self) -> tuple[int, ...]:
        return (self.num_layers, self.num_blocks, 2, self.block_size,
                self.num_kv_heads * self.head_dim)

    @property
    def bytes_per_block(self) -> int:
        """K+V bytes for one block across all layers."""
        itemsize = jnp.dtype(self.dtype).itemsize
        return (2 * self.num_layers * self.num_kv_heads * self.block_size *
                self.head_dim * itemsize)


def allocate_kv_cache(spec: KVCacheSpec) -> jax.Array:
    """Zero-initialised fused KV cache."""
    return jnp.zeros(spec.shape, dtype=spec.dtype)


def write_kv(layer_kv_cache: jax.Array, k: jax.Array, v: jax.Array,
             slot_mapping: jax.Array) -> jax.Array:
    """Scatter new tokens' K/V into one layer's paged cache.

    layer_kv_cache: [N_blk, 2, Bs, Hkv*D]; k/v: [T, Hkv, D] or [T, Hkv*D];
    slot_mapping: [T] flat slot ids (block * Bs + offset); -1 entries are
    padding and land in block 0, which the allocator reserves as a sink.
    """
    block_size = layer_kv_cache.shape[2]
    t = k.shape[0]
    slots = jnp.where(slot_mapping < 0, 0, slot_mapping)
    block_idx = slots // block_size
    block_off = slots % block_size
    out = layer_kv_cache.at[block_idx, 0, block_off, :].set(
        k.reshape(t, -1).astype(layer_kv_cache.dtype))
    out = out.at[block_idx, 1, block_off, :].set(
        v.reshape(t, -1).astype(layer_kv_cache.dtype))
    return out


def split_kv(layer_kv_cache: jax.Array) -> tuple[jax.Array, jax.Array]:
    """View one layer's cache as (k, v) of shape [N_blk, Bs, Hkv*D]."""
    return layer_kv_cache[:, 0], layer_kv_cache[:, 1]


def compute_slot_mapping(block_tables: np.ndarray, context_lens: np.ndarray,
                         query_lens: np.ndarray, block_size: int,
                         total_tokens: int) -> np.ndarray:
    """Host-side: flat slot id for each new token (padding slots = -1).

    block_tables: [B, MaxBlocks]; context_lens: [B] tokens already cached;
    query_lens: [B] new tokens per request this step.
    """
    out = np.full(total_tokens, -1, dtype=np.int32)
    t = 0
    for r in range(len(query_lens)):
        for i in range(query_lens[r]):
            pos = context_lens[r] + i
            blk = block_tables[r, pos // block_size]
            out[t] = blk * block_size + pos % block_size
            t += 1
    return out
