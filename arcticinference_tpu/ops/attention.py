"""Ragged paged attention.

This is the engine's hot op: a flat, ragged batch of query tokens (mixed
chunked-prefill and decode, vLLM-v1 style) attends to the paged KV cache.
The reference gets this from FlashAttention/FlashInfer (see reference
``llama_swiftkv.py:46-52``); on TPU we own it.

Two implementations:

- :func:`ragged_paged_attention_reference` — pure jnp, O(T * S) dense; the
  numerics oracle and the CPU-test path.
- :func:`ragged_paged_attention` — Pallas flash-style kernel (see
  ``ops/pallas/ragged_attention.py``), selected automatically on TPU.

Metadata contract (all device arrays, static shapes):
  q               [T, Hq, D]    flat new-token queries
  positions       [T]           absolute position of each query token
  req_idx         [T]           which request each token belongs to (padding: -1)
  block_tables    [B, MaxBlk]   physical block ids per request
  seq_lens        [B]           total context length per request (incl. new)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dense_kv(kv_cache, block_tables, head_dim):
    """[B, MaxBlk*Bs, Hkv, D] dense gather of each request's KV.

    kv_cache: [N, 2, Bs, Hkv*D] (see ops/kv_cache.py for the layout
    rationale).
    """
    kv = kv_cache[block_tables]          # [B, MaxBlk, 2, Bs, Hkv*D]
    b, mb, _, bs, hd = kv.shape
    h = hd // head_dim
    k = kv[:, :, 0].reshape(b, mb * bs, h, head_dim)
    v = kv[:, :, 1].reshape(b, mb * bs, h, head_dim)
    return k, v


def ragged_paged_attention_reference(
    q: jax.Array,
    kv_cache: jax.Array,
    positions: jax.Array,
    req_idx: jax.Array,
    block_tables: jax.Array,
    seq_lens: jax.Array,
    scale: float | None = None,
    kv_scale=None,
    tree_start: jax.Array | None = None,
    row_tree_mask: jax.Array | None = None,
) -> jax.Array:
    """Dense-gather oracle implementation.

    Every query token t attends to kv positions j of its request with
    j <= positions[t] (causal) and j < seq_lens[req]. Padding tokens
    (req_idx < 0) produce zeros.

    ``kv_scale``: this layer's [k_scale, v_scale] dequant pair (or a
    scalar applied to both; None = no dequant scaling).

    Tree-draft verification (token-tree speculation): ``tree_start`` [B]
    is the frontier token's cache slot per request (-1 = none) and
    ``row_tree_mask`` [T] a per-row ancestor bitmask — rows with a
    non-zero mask attend kv slots past tree_start iff bit
    (slot - tree_start) is set, so a draft row sees the real context plus
    exactly its ancestor chain, never a sibling branch.
    """
    t_, hq, d = q.shape
    hkv = kv_cache.shape[3] // d
    if scale is None:
        scale = d ** -0.5
    kd, vd = _dense_kv(kv_cache, block_tables, d)  # [B, S, Hkv, D]
    if kv_scale is not None:
        ks = jnp.asarray(kv_scale, jnp.float32).reshape(-1)
        kd = kd.astype(jnp.float32) * ks[0]
        vd = vd.astype(jnp.float32) * ks[-1]
    s = kd.shape[1]
    group = hq // hkv

    safe_req = jnp.maximum(req_idx, 0)
    k_t = kd[safe_req]                      # [T, S, Hkv, D]
    v_t = vd[safe_req]
    qf = q.astype(jnp.float32) * scale
    kf = k_t.astype(jnp.float32)
    vf = v_t.astype(jnp.float32)
    # scores[t, h, j] = q[t, h] . k[t, j, h // group]
    qg = qf.reshape(t_, hkv, group, d)
    scores = jnp.einsum("thgd,tshd->thgs", qg, kf)
    kv_pos = jnp.arange(s)[None, :]
    valid = (kv_pos <= positions[:, None]) & \
            (kv_pos < seq_lens[safe_req][:, None])
    if row_tree_mask is not None and tree_start is not None:
        ts_t = tree_start[safe_req][:, None]          # [T, 1]
        rel = kv_pos - ts_t                           # [T, S]
        override = (row_tree_mask[:, None] != 0) & (rel >= 1)
        bit = jnp.right_shift(row_tree_mask[:, None],
                              jnp.clip(rel, 0, 31)) & 1
        tree_ok = (rel < 32) & (bit > 0) & \
            (kv_pos < seq_lens[safe_req][:, None])
        valid = jnp.where(override, tree_ok, valid)
    scores = jnp.where(valid[:, None, None, :], scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("thgs,tshd->thgd", p, vf).reshape(t_, hq, d)
    out = jnp.where(req_idx[:, None, None] < 0, 0.0, out)
    return out.astype(q.dtype)


# The production dispatch lives in models/llama.py:make_attn_impl, which
# threads the host-built work-item schedule through to the Pallas kernel.
