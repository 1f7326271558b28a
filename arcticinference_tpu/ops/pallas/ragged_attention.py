"""Ragged paged attention — the engine's hot Pallas kernel.

One kernel serves the whole vLLM-v1-style mixed batch (chunked prefill +
decode) against the paged KV cache; the reference relies on CUDA
FlashAttention/FlashInfer for this (reference ``llama_swiftkv.py:46-52``).

Design (TPU-first, not a port):

- The host scheduler lowers the ragged token batch into fixed-size *work
  items* ``(req, qstart, qlen, pos_base, npages)``; the grid is
  ``(num_items,)`` and every program owns one query block across ALL kv
  heads.  Items never span requests, so each program walks exactly one
  request's page list.
- KV cache layout is ``[num_blocks, block_size, Hkv*D]``: one page DMA
  brings every kv head's K (or V) for 32 tokens in a single contiguous
  64 KB transfer — the unit that keeps HBM streaming at full bandwidth on
  the decode path.  Heads are peeled off with static lane slices in VMEM.
- Pages are double-buffered (per-slot semaphores) and consumed by a
  flash-style online-softmax accumulator in fp32, one accumulator set per
  kv head (static Python loop -> fully unrolled).
- Work-item query windows are aligned down to the 8-sublane boundary
  host-side (window = qb + 8) so all dynamic slicing is tile-legal; the
  surplus rows are computed and discarded (never gathered).
- Output is written densely per item; a cheap gather maps rows back to
  the flat token order.
- ``qb`` is static: the engine compiles a wide-block variant for
  prefill-heavy steps and a narrow one for decode-heavy steps (same role
  as the reference's per-shape CUDA graphs, ``model_runner.py:778-856``).

KV dtype may be bf16 or fp8 (float8_e4m3fn); fp8 pages are dequantized in
VMEM right after DMA (``kv_scale``), halving decode HBM traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


import os

N_BUF = int(os.environ.get("ARCTIC_TPU_ATTN_NBUF", "2"))
CHUNK_PAGES = int(os.environ.get("ARCTIC_TPU_ATTN_CHUNK_PAGES", "8"))


def _attn_kernel(
    # scalar prefetch
    layer_smem, item_req, item_qstart, item_qlen, item_pages,
    item_pos_base, block_tables, item_tree_start, item_tree_mask,
    # inputs
    q_hbm, kv_hbm, kv_scale_smem,
    # output
    out_vmem,
    # scratch
    qbuf, kvbuf, qsem, kvsems,
    *, qw: int, group: int, hkv: int, bs: int, head_dim: int, scale: float,
    kv_bf16: bool, use_tree: bool,
):
    item = pl.program_id(0)
    qlen = item_qlen[item]

    @pl.when(qlen > 0)
    def _run():
        req = item_req[item]
        # Host aligns qstart down to the 8-sublane boundary; surplus rows
        # are computed but never gathered.
        qstart = pl.multiple_of(item_qstart[item], 8)
        npages = item_pages[item]
        d = head_dim
        rows = qw * group

        q_dma = pltpu.make_async_copy(
            q_hbm.at[:, :, pl.ds(qstart, qw), :], qbuf, qsem)
        q_dma.start()

        ck = CHUNK_PAGES * bs  # kv tokens per flash iteration

        layer = layer_smem[0]

        max_blk = block_tables.shape[1]

        def chunk_run_info(c):
            """Is chunk c a full run of CONSECUTIVE pages?  The block
            manager allocates page ids in order, so long contexts are
            overwhelmingly contiguous runs — one big DMA instead of
            CHUNK_PAGES descriptor issues (issue latency, not bandwidth,
            bounds the per-page path)."""
            base = block_tables[req, jnp.minimum(c * CHUNK_PAGES,
                                                 max_blk - 1)]
            run = (c + 1) * CHUNK_PAGES <= npages
            for j in range(1, CHUNK_PAGES):
                idx = jnp.minimum(c * CHUNK_PAGES + j, max_blk - 1)
                run = run & (block_tables[req, idx] == base + j)
            return base, run

        def chunk_dma(slot, c):
            """Start DMAs for all in-range pages of chunk c into `slot`."""
            base, run = chunk_run_info(c)

            @pl.when(run)
            def _run():
                pltpu.make_async_copy(
                    kv_hbm.at[layer, pl.ds(base, CHUNK_PAGES)],
                    kvbuf.at[slot], kvsems.at[slot]).start()

            @pl.when(jnp.logical_not(run))
            def _pages():
                for j in range(CHUNK_PAGES):
                    @pl.when(c * CHUNK_PAGES + j < npages)
                    def _start():
                        page = block_tables[req, c * CHUNK_PAGES + j]
                        pltpu.make_async_copy(
                            kv_hbm.at[layer, page], kvbuf.at[slot, j],
                            kvsems.at[slot]).start()

        def chunk_wait(slot, c):
            base, run = chunk_run_info(c)

            @pl.when(run)
            def _wait_run():
                pltpu.make_async_copy(
                    kv_hbm.at[layer, pl.ds(base, CHUNK_PAGES)],
                    kvbuf.at[slot], kvsems.at[slot]).wait()

            @pl.when(jnp.logical_not(run))
            def _wait_pages():
                for j in range(CHUNK_PAGES):
                    @pl.when(c * CHUNK_PAGES + j < npages)
                    def _wait():
                        pltpu.make_async_copy(
                            kv_hbm.at[0, 0], kvbuf.at[slot, j],
                            kvsems.at[slot]).wait()

        n_chunks = (npages + CHUNK_PAGES - 1) // CHUNK_PAGES
        chunk_dma(0, 0)
        q_dma.wait()

        # Positions are consecutive within an item: pos = base + t_off.
        t_off = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0), qw)
        pos_row = item_pos_base[item] + t_off

        if use_tree:
            # Tree-draft verification (token-tree speculation): rows with
            # a non-zero ancestor bitmask override causality for kv slots
            # PAST the tree start `ts` (the frontier token's slot): slot
            # ts + r is attended iff bit r of the row's mask is set —
            # i.e. each draft row sees the real context plus exactly its
            # ancestor chain, never a sibling branch (the reference's
            # token trees, csrc/suffix_cache/suffix_tree.cc:245-274,
            # would otherwise be verified incorrectly).
            ts = item_tree_start[item]
            mvec = jnp.zeros((rows, 1), jnp.int32)
            for j in range(qw):
                mvec = jnp.where(t_off == j, item_tree_mask[item, j],
                                 mvec)

        # Fold the per-layer kv dequant scales into q (k_scale) and the
        # output (v_scale): the inner loop then never multiplies a
        # [ck, d] tile by a scalar.
        k_scale = kv_scale_smem[layer, 0]
        v_scale = kv_scale_smem[layer, 1]
        qf = [
            (qbuf[h].reshape(rows, d).astype(jnp.float32)
             * (scale * k_scale)).astype(jnp.bfloat16)
            for h in range(hkv)
        ]

        def body(c, carry):
            slot = jax.lax.rem(c, N_BUF)

            @pl.when(c + 1 < n_chunks)
            def _prefetch():
                chunk_dma(jax.lax.rem(c + 1, N_BUF), c + 1)

            chunk_wait(slot, c)

            kv_pos = (c * ck +
                      jax.lax.broadcasted_iota(jnp.int32, (rows, ck), 1))
            valid = kv_pos <= pos_row
            if use_tree:
                rel = kv_pos - ts
                override = (mvec != 0) & (rel >= 1)
                bit = jax.lax.shift_right_logical(
                    jnp.broadcast_to(mvec, rel.shape),
                    jnp.clip(rel, 0, 31)) & 1
                valid = jnp.where(override, (rel < 32) & (bit > 0), valid)
            # Tokens of out-of-range pages sit in un-DMA'd buffer space;
            # their P entries are 0 but 0*NaN = NaN, so V must be zeroed.
            tok_real = (c * ck + jax.lax.broadcasted_iota(
                jnp.int32, (ck, 1), 0)) < npages * bs
            # kvbuf slot: [CHUNK, 2, Bs, Hkv*D]; out-of-range pages hold
            # stale data masked out by kv_pos (their positions are beyond
            # every row's causal limit).
            kchunk = kvbuf[slot, :, 0]         # [CHUNK, Bs, Hkv*D]
            vchunk = kvbuf[slot, :, 1]

            new_carry = []
            for h in range(hkv):
                m_prev, l_prev, acc = carry[h]
                k = kchunk[:, :, h * d:(h + 1) * d].reshape(ck, d)
                if not kv_bf16:
                    k = k.astype(jnp.bfloat16)
                s = jax.lax.dot_general(
                    qf[h], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [rows, ck]
                s = jnp.where(valid, s, -jnp.inf)
                m_cur = jnp.max(s, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                # exp(-inf - finite) = 0 masks invalid columns for free;
                # m_safe guards the all-masked-row NaN (-inf - -inf).
                m_safe = jnp.where(m_new == -jnp.inf, 0.0, m_new)
                alpha = jnp.where(m_prev == -jnp.inf, 0.0,
                                  jnp.exp(m_prev - m_safe))
                pmat = jnp.exp(s - m_safe)
                l_new = alpha * l_prev + jnp.sum(pmat, -1, keepdims=True)
                v = vchunk[:, :, h * d:(h + 1) * d].reshape(ck, d)
                # Zero un-DMA'd rows (0*NaN = NaN would poison the PV dot).
                v = jnp.where(tok_real, v.astype(jnp.bfloat16), 0)
                pv = jax.lax.dot_general(
                    pmat.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                new_carry.append((m_new, l_new, acc * alpha + pv))
            return tuple(new_carry)

        init = tuple(
            (jnp.full((rows, 1), -jnp.inf, jnp.float32),
             jnp.zeros((rows, 1), jnp.float32),
             jnp.zeros((rows, head_dim), jnp.float32))
            for _ in range(hkv))
        final = jax.lax.fori_loop(0, n_chunks, body, init)

        for h in range(hkv):
            _, l, acc = final[h]
            # v_scale was deferred to here (one [rows, d] multiply).
            out = acc * (v_scale / jnp.maximum(l, 1e-20))
            out_vmem[0, h] = out.astype(out_vmem.dtype)

    @pl.when(qlen == 0)
    def _skip():
        out_vmem[...] = jnp.zeros(out_vmem.shape, out_vmem.dtype)


@functools.partial(jax.jit,
                   static_argnames=("qb", "scale", "use_tree"))
def _ragged_attention_call(
    q, kv_cache, layer, item_req, item_qstart, item_qlen,
    item_pages, item_pos_base, block_tables, token_item, token_off,
    kv_scale, item_tree_start, item_tree_mask, qb: int, scale: float,
    use_tree: bool = False,
):
    t, hq, d = q.shape
    num_layers, n_blocks, _, bs, hkv_d = kv_cache.shape
    hkv = hkv_d // d
    group = hq // hkv
    n_items = item_req.shape[0]
    # Window = qb + 8: see module docstring.
    qw = qb + 8
    q = jnp.pad(q, ((0, qw), (0, 0), (0, 0)))
    q = q.reshape(t + qw, hkv, group, d).transpose(1, 2, 0, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(n_items,),
        in_specs=[
            # q is sliced at token granularity (8-aligned via the host
            # schedule): it stays in HBM and reaches VMEM via DMA.
            pl.BlockSpec(memory_space=pltpu.HBM),   # q [Hkv, group, T+, D]
            pl.BlockSpec(memory_space=pl.ANY),   # kv_cache
            pl.BlockSpec(memory_space=pltpu.SMEM),  # kv_scale [L, 2]
        ],
        out_specs=pl.BlockSpec(
            (1, hkv, qw * group, d), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hkv, group, qw, d), q.dtype),         # qbuf
            pltpu.VMEM((N_BUF, CHUNK_PAGES, 2, bs, hkv_d),
                       kv_cache.dtype),                       # kvbuf
            pltpu.SemaphoreType.DMA(()),                      # qsem
            pltpu.SemaphoreType.DMA((N_BUF,)),                # kvsems
        ],
    )
    kernel = functools.partial(
        _attn_kernel, qw=qw, group=group, hkv=hkv, bs=bs, head_dim=d,
        scale=scale, kv_bf16=kv_cache.dtype == jnp.bfloat16,
        use_tree=use_tree)
    out_items = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_items, hkv, qw * group, d),
                                       q.dtype),
        grid_spec=grid_spec,
    )(layer.reshape(1), item_req, item_qstart, item_qlen, item_pages,
      item_pos_base, block_tables, item_tree_start, item_tree_mask,
      q, kv_cache, kv_scale)
    # Rows are group-major: [items, hkv, group, qw, d] -> [items, qw, hq, d],
    # then map dense per-item rows back to the ragged token order.
    out_items = out_items.reshape(n_items, hkv, group, qw, d)
    out_items = out_items.transpose(0, 3, 1, 2, 4).reshape(
        n_items, qw, hq, d)
    return out_items[token_item, token_off]


def build_work_items(query_lens: np.ndarray, positions_last: np.ndarray,
                     qb: int, block_size: int, num_items: int,
                     total_tokens: int):
    """Host-side schedule: split each request's query chunk into <=QB items.

    query_lens: [B] new tokens per request; positions_last: [B] last
    absolute position of each request this step.  Returns the prefetch
    arrays plus the token->(item, offset) back-map.
    """
    b = len(query_lens)
    item_req = np.zeros(num_items, np.int32)
    item_qstart = np.zeros(num_items, np.int32)
    item_qlen = np.zeros(num_items, np.int32)
    item_pages = np.zeros(num_items, np.int32)
    item_pos_base = np.zeros(num_items, np.int32)
    token_item = np.zeros(total_tokens, np.int32)
    token_off = np.zeros(total_tokens, np.int32)
    it = 0
    qpos = 0
    for r in range(b):
        qlen = int(query_lens[r])
        if qlen == 0:
            continue
        first_pos = int(positions_last[r]) - qlen + 1
        done = 0
        while done < qlen:
            n = min(qb, qlen - done)
            if it >= num_items:
                raise ValueError("work item overflow; raise num_items")
            aligned = qpos & ~7  # sublane-tile alignment for the kernel DMA
            item_req[it] = r
            item_qstart[it] = aligned
            item_qlen[it] = n
            # Window row 0 is `aligned`; the item's first real token sits at
            # offset qpos-aligned with position first_pos+done.
            item_pos_base[it] = first_pos + done - (qpos - aligned)
            last_pos = first_pos + done + n - 1
            item_pages[it] = last_pos // block_size + 1
            token_item[qpos:qpos + n] = it
            token_off[qpos:qpos + n] = np.arange(qpos - aligned,
                                                 qpos - aligned + n)
            done += n
            qpos += n
            it += 1
    return (item_req, item_qstart, item_qlen, item_pages, item_pos_base,
            token_item, token_off)


def ragged_paged_attention_kernel(
    q: jax.Array,
    kv_cache: jax.Array,
    positions: jax.Array,
    req_idx: jax.Array,
    block_tables: jax.Array,
    seq_lens: jax.Array,
    scale: float | None = None,
    qb: int = 32,
    schedule: tuple | None = None,
    kv_scale: jax.Array | None = None,
    layer: jax.Array | None = None,
) -> jax.Array:
    """Drop-in replacement for the jnp reference.

    When the engine already built a schedule (the fast path) pass it via
    ``schedule``; otherwise one is derived on host from the metadata
    (requires concrete inputs — fine for tests, not inside jit).
    """
    t, hq, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if layer is None:
        # Single-layer cache view: add the (trivial) layer dim.
        kv_cache = kv_cache[None]
        layer = jnp.zeros((), jnp.int32)
    if kv_scale is None:
        kv_scale = jnp.ones((kv_cache.shape[0], 2), jnp.float32)
    else:
        kv_scale = jnp.asarray(kv_scale, jnp.float32)
        if kv_scale.ndim != 2:  # legacy scalar/(1,) form
            kv_scale = jnp.broadcast_to(
                kv_scale.reshape(-1)[0], (kv_cache.shape[0], 2))
    if schedule is None:
        req_np = np.asarray(req_idx)
        pos_np = np.asarray(positions)
        b = block_tables.shape[0]
        qlens = np.zeros(b, np.int64)
        last = np.zeros(b, np.int64)
        for i in range(t):
            r = req_np[i]
            if r >= 0:
                qlens[r] += 1
                last[r] = max(last[r], pos_np[i])
        num_items = -(-t // qb) + b
        schedule = build_work_items(
            qlens, last, qb, kv_cache.shape[3], num_items, t)
    (item_req, item_qstart, item_qlen, item_pages, item_pos_base,
     token_item, token_off) = schedule[:7]
    if len(schedule) > 7:
        # Tree-draft verification: (item_tree_start, item_tree_mask).
        tree_start, tree_mask = schedule[7], schedule[8]
        use_tree = True
    else:
        n_items = jnp.asarray(item_req).shape[0]
        tree_start = jnp.full((n_items,), -1, jnp.int32)
        tree_mask = jnp.zeros((n_items, qb + 8), jnp.int32)
        use_tree = False
    return _ragged_attention_call(
        q, kv_cache, jnp.asarray(layer, jnp.int32),
        jnp.asarray(item_req), jnp.asarray(item_qstart),
        jnp.asarray(item_qlen), jnp.asarray(item_pages),
        jnp.asarray(item_pos_base),
        block_tables, jnp.asarray(token_item), jnp.asarray(token_off),
        kv_scale, jnp.asarray(tree_start), jnp.asarray(tree_mask),
        qb=qb, scale=float(scale), use_tree=use_tree)


# --------------------------------------------------------------------- #
# Decode-shaped fast path
# --------------------------------------------------------------------- #
#
# The general ragged kernel pays for a qb+8 token window per item; on
# decode steps (uniform small qlen per sequence) only qlen*group of
# those qw*group rows are real — at qlen=1, ~94% of the QK/softmax work
# is discarded, which turns a bandwidth problem compute-bound.  This
# kernel grids over SEQUENCES with rows = qlen*group (padded to the
# 8-sublane floor), so per-chunk compute scales with real work.


def _decode_kernel(
    # scalar prefetch
    layer_smem, pos_base, seq_lens, block_tables,
    # inputs
    q_vmem, kv_hbm, kv_scale_smem,
    # output
    out_vmem,
    # scratch
    kvbuf, kvsems,
    *, rows: int, qlen: int, group: int, hkv: int, bs: int,
    head_dim: int, scale: float, kv_bf16: bool,
):
    b = pl.program_id(0)
    sl = seq_lens[b]

    @pl.when(sl > 0)
    def _run():
        d = head_dim
        npages = (sl + bs - 1) // bs
        ck = CHUNK_PAGES * bs
        layer = layer_smem[0]
        max_blk = block_tables.shape[1]

        def chunk_run_info(c):
            base = block_tables[b, jnp.minimum(c * CHUNK_PAGES,
                                               max_blk - 1)]
            run = (c + 1) * CHUNK_PAGES <= npages
            for j in range(1, CHUNK_PAGES):
                idx = jnp.minimum(c * CHUNK_PAGES + j, max_blk - 1)
                run = run & (block_tables[b, idx] == base + j)
            return base, run

        def chunk_dma(slot, c):
            base, run = chunk_run_info(c)

            @pl.when(run)
            def _run_dma():
                pltpu.make_async_copy(
                    kv_hbm.at[layer, pl.ds(base, CHUNK_PAGES)],
                    kvbuf.at[slot], kvsems.at[slot]).start()

            @pl.when(jnp.logical_not(run))
            def _pages():
                for j in range(CHUNK_PAGES):
                    @pl.when(c * CHUNK_PAGES + j < npages)
                    def _start():
                        page = block_tables[b, c * CHUNK_PAGES + j]
                        pltpu.make_async_copy(
                            kv_hbm.at[layer, page], kvbuf.at[slot, j],
                            kvsems.at[slot]).start()

        def chunk_wait(slot, c):
            base, run = chunk_run_info(c)

            @pl.when(run)
            def _wait_run():
                pltpu.make_async_copy(
                    kv_hbm.at[layer, pl.ds(base, CHUNK_PAGES)],
                    kvbuf.at[slot], kvsems.at[slot]).wait()

            @pl.when(jnp.logical_not(run))
            def _wait_pages():
                for j in range(CHUNK_PAGES):
                    @pl.when(c * CHUNK_PAGES + j < npages)
                    def _wait():
                        pltpu.make_async_copy(
                            kv_hbm.at[0, 0], kvbuf.at[slot, j],
                            kvsems.at[slot]).wait()

        n_chunks = (npages + CHUNK_PAGES - 1) // CHUNK_PAGES
        chunk_dma(0, 0)

        # Row r holds token t = r // group; its absolute position is
        # pos_base[b] + t.  Padding rows (r >= qlen*group) mask to -1.
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        t_off = r_iota // group
        pos_row = jnp.where(r_iota < qlen * group,
                            pos_base[b] + t_off, -1)

        k_scale = kv_scale_smem[layer, 0]
        v_scale = kv_scale_smem[layer, 1]
        qf = [
            (q_vmem[0, h].astype(jnp.float32)
             * (scale * k_scale)).astype(jnp.bfloat16)
            for h in range(hkv)
        ]

        def body(c, carry):
            slot = jax.lax.rem(c, N_BUF)

            @pl.when(c + 1 < n_chunks)
            def _prefetch():
                chunk_dma(jax.lax.rem(c + 1, N_BUF), c + 1)

            chunk_wait(slot, c)

            kv_pos = (c * ck +
                      jax.lax.broadcasted_iota(jnp.int32, (rows, ck), 1))
            valid = kv_pos <= pos_row
            tok_real = (c * ck + jax.lax.broadcasted_iota(
                jnp.int32, (ck, 1), 0)) < npages * bs
            kchunk = kvbuf[slot, :, 0]         # [CHUNK, Bs, Hkv*D]
            vchunk = kvbuf[slot, :, 1]

            new_carry = []
            for h in range(hkv):
                m_prev, l_prev, acc = carry[h]
                k = kchunk[:, :, h * d:(h + 1) * d].reshape(ck, d)
                if not kv_bf16:
                    k = k.astype(jnp.bfloat16)
                s = jax.lax.dot_general(
                    qf[h], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [rows, ck]
                s = jnp.where(valid, s, -jnp.inf)
                m_cur = jnp.max(s, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                m_safe = jnp.where(m_new == -jnp.inf, 0.0, m_new)
                alpha = jnp.where(m_prev == -jnp.inf, 0.0,
                                  jnp.exp(m_prev - m_safe))
                pmat = jnp.exp(s - m_safe)
                l_new = alpha * l_prev + jnp.sum(pmat, -1, keepdims=True)
                v = vchunk[:, :, h * d:(h + 1) * d].reshape(ck, d)
                v = jnp.where(tok_real, v.astype(jnp.bfloat16), 0)
                pv = jax.lax.dot_general(
                    pmat.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                new_carry.append((m_new, l_new, acc * alpha + pv))
            return tuple(new_carry)

        init = tuple(
            (jnp.full((rows, 1), -jnp.inf, jnp.float32),
             jnp.zeros((rows, 1), jnp.float32),
             jnp.zeros((rows, head_dim), jnp.float32))
            for _ in range(hkv))
        final = jax.lax.fori_loop(0, n_chunks, body, init)

        for h in range(hkv):
            _, l, acc = final[h]
            out = acc * (v_scale / jnp.maximum(l, 1e-20))
            out_vmem[0, h] = out.astype(out_vmem.dtype)

    @pl.when(sl == 0)
    def _skip():
        out_vmem[...] = jnp.zeros(out_vmem.shape, out_vmem.dtype)


@functools.partial(jax.jit, static_argnames=("qlen", "scale"))
def _decode_attention_call(q, kv_cache, layer, pos_base, block_tables,
                           seq_lens, kv_scale, qlen: int, scale: float):
    t, hq, d = q.shape
    num_layers, n_blocks, _, bs, hkv_d = kv_cache.shape
    hkv = hkv_d // d
    group = hq // hkv
    b = block_tables.shape[0]
    rows = max(8, ((qlen * group + 7) // 8) * 8)
    # Seq-major token order: token j of seq i at row i*qlen + j.
    qr = q.reshape(b, qlen, hkv, group, d).transpose(0, 2, 1, 3, 4)
    qr = qr.reshape(b, hkv, qlen * group, d)
    if rows != qlen * group:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rows - qlen * group),
                          (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, rows, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # q (auto-pipelined)
            pl.BlockSpec(memory_space=pl.ANY),       # kv_cache
            pl.BlockSpec(memory_space=pltpu.SMEM),   # kv_scale [L, 2]
        ],
        out_specs=pl.BlockSpec(
            (1, hkv, rows, d), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, CHUNK_PAGES, 2, bs, hkv_d),
                       kv_cache.dtype),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, rows=rows, qlen=qlen, group=group, hkv=hkv,
        bs=bs, head_dim=d, scale=scale,
        kv_bf16=kv_cache.dtype == jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hkv, rows, d), q.dtype),
        grid_spec=grid_spec,
    )(layer.reshape(1), pos_base, seq_lens, block_tables,
      qr, kv_cache, kv_scale)
    out = out[:, :, :qlen * group, :].reshape(b, hkv, qlen, group, d)
    return out.transpose(0, 2, 1, 3, 4).reshape(t, hq, d)


def decode_paged_attention_kernel(
    q: jax.Array,
    kv_cache: jax.Array,
    pos_base: jax.Array,
    block_tables: jax.Array,
    seq_lens: jax.Array,
    qlen: int,
    scale: float | None = None,
    kv_scale: jax.Array | None = None,
    layer: jax.Array | None = None,
) -> jax.Array:
    """Uniform-qlen decode attention over the paged cache.

    q: [B*qlen, Hq, D] seq-major (token j of seq i at row i*qlen+j);
    pos_base: [B] absolute position of each seq's first new token;
    seq_lens: [B] total tokens (context + new; 0 = dead slot).
    """
    t, hq, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if layer is None:
        kv_cache = kv_cache[None]
        layer = jnp.zeros((), jnp.int32)
    if kv_scale is None:
        kv_scale = jnp.ones((kv_cache.shape[0], 2), jnp.float32)
    else:
        kv_scale = jnp.asarray(kv_scale, jnp.float32)
        if kv_scale.ndim != 2:
            kv_scale = jnp.broadcast_to(
                kv_scale.reshape(-1)[0], (kv_cache.shape[0], 2))
    return _decode_attention_call(
        q, kv_cache, jnp.asarray(layer, jnp.int32),
        jnp.asarray(pos_base, jnp.int32), block_tables,
        jnp.asarray(seq_lens, jnp.int32), kv_scale,
        qlen=int(qlen), scale=float(scale))


# --------------------------------------------------------------------- #
# Grouped decode kernel: GSZ sequences per grid program.
#
# At short decode contexts the per-sequence kernels above are bound by
# per-program fixed cost, not bandwidth (profiled on v5e: 0.175 ms per
# layer at B=64/ctx=160 = ~120 GB/s effective vs the ~650 GB/s the same
# step's weight streaming achieves).  Amortize it: each program owns GSZ
# sequences, prefetching the next sequence's first KV chunk while the
# current one computes, so the DMA queue never drains between sequences
# (the dominant case — decode contexts fit one chunk).
# --------------------------------------------------------------------- #

# 8 pages (256 tokens) measured best at decode contexts on v5e: the
# head-packed dense dots scale with chunk width on the N side, and 256
# halves the MXU waste vs 512 at typical contexts (in-engine profile:
# attention 3.26 -> 2.41 ms/step at batch 64 / ctx 160).  This tuning is
# v5e-SPECIFIC: chips with different DMA latency, or workloads at much
# longer decode contexts, may prefer wider chunks (fewer chunk-loop
# iterations) — re-tune via ARCTIC_TPU_ATTN_GCHUNK_PAGES (e.g. 16) and
# benchmarks/attn_microbench.py when bringing up new hardware.
G_CHUNK_PAGES = int(os.environ.get("ARCTIC_TPU_ATTN_GCHUNK_PAGES", "8"))


def _grouped_decode_kernel(
    # scalar prefetch (5 args, +2 when fused_write)
    layer_smem, pos_base, seq_lens, block_tables, chunk_base,
    # then: [new_blk, new_off,] inputs, outputs, scratch
    *rest,
    gsz: int, rows: int, qlen: int, group: int, hkv: int, bs: int,
    head_dim: int, scale: float, kv_bf16: bool, headpack: bool,
    fused_write: bool = False, qv: int = 8,
):
    if fused_write:
        (new_len, q_vmem, kv_hbm, kv_scale_smem, knew_vmem,
         vnew_vmem, out_vmem, kvbuf, kvsems) = rest
    else:
        q_vmem, kv_hbm, kv_scale_smem, out_vmem, kvbuf, kvsems = rest
        new_len = knew_vmem = vnew_vmem = None
    p = pl.program_id(0)
    d = head_dim
    ck = G_CHUNK_PAGES * bs
    layer = layer_smem[0]

    # ---- injected frontier tokens ---------------------------------- #
    # The step's new K/V rows arrive as operands (CACHE dtype: host
    # quantized them first, so softmax numerics match scatter-then-read
    # bit-for-bit) and are folded into the softmax as a virtual chunk
    # below; the cache scatter itself is DEFERRED to ONE whole-model
    # XLA scatter after the layer stack (profiled: each per-layer
    # scatter pays ~10 us fixed cost; 2/layer was ~4%% of the decode
    # step).  Rows not yet in the cache are masked out of the page
    # reads (valid = kv_pos < pos_base).

    def npages_of(b):
        return (seq_lens[b] + bs - 1) // bs

    # chunk_base[b, c] >= 0: chunk c is a full contiguous page run
    # starting there (host precomputes it — the block manager allocates
    # in order, so long contexts are overwhelmingly runs); -1: per-page
    # path.  One SMEM read replaces 2x G_CHUNK_PAGES scalar compares per
    # chunk — at decode batch sizes the scalar unit, not HBM, was the
    # kernel's bottleneck.
    def chunk_dma(slot, b, c, npages):
        base = chunk_base[b, c]

        @pl.when(base >= 0)
        def _run_dma():
            pltpu.make_async_copy(
                kv_hbm.at[layer, pl.ds(base, G_CHUNK_PAGES)],
                kvbuf.at[slot], kvsems.at[slot]).start()

        @pl.when(base < 0)
        def _pages():
            for j in range(G_CHUNK_PAGES):
                @pl.when(c * G_CHUNK_PAGES + j < npages)
                def _start():
                    page = block_tables[b, c * G_CHUNK_PAGES + j]
                    pltpu.make_async_copy(
                        kv_hbm.at[layer, page], kvbuf.at[slot, j],
                        kvsems.at[slot]).start()

    def chunk_wait(slot, b, c, npages):
        base = chunk_base[b, c]

        @pl.when(base >= 0)
        def _wait_run():
            pltpu.make_async_copy(
                kv_hbm.at[layer, pl.ds(base, G_CHUNK_PAGES)],
                kvbuf.at[slot], kvsems.at[slot]).wait()

        @pl.when(base < 0)
        def _wait_pages():
            for j in range(G_CHUNK_PAGES):
                @pl.when(c * G_CHUNK_PAGES + j < npages)
                def _wait():
                    pltpu.make_async_copy(
                        kv_hbm.at[0, 0], kvbuf.at[slot, j],
                        kvsems.at[slot]).wait()

    # Warm-up: sequence 0's first chunk.
    @pl.when(seq_lens[p * gsz] > 0)
    def _warm():
        chunk_dma(0, p * gsz, 0, npages_of(p * gsz))

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    t_off = r_iota // group

    def _run_headpacked(b, g, slot, npages, n_chunks, k_scale, v_scale):
        # Head-packed compute: ONE qk dot and ONE pv dot per chunk for
        # ALL kv heads, via a block-diagonal Q.  Per-head dots issue
        # 2*hkv small MXU ops whose fixed cost dominates at decode
        # shapes; packing trades that for the same MXU tile count in
        # 2 ops plus cheap static-slice packing/unpacking.
        #   Qbd [hkv*rows, hkv*d] (block h on rows/cols h)
        #   s   = Qbd @ K_chunk^T        K_chunk [ck, hkv*d]
        #   out = diag-blocks(P @ V_chunk)
        # Cross-head garbage never mixes: row block h only has nonzero
        # Q columns in head h's d-slice, and the pv diagonal slice
        # discards other heads' columns.
        R = hkv * rows
        qf = (q_vmem[g].astype(jnp.float32)
              * (scale * k_scale)).astype(jnp.bfloat16)   # [hkv,rows,d]
        # Block-diagonal embed in 2D (Mosaic: no dynamic_update_slice,
        # and >2D masked broadcasts hit unsupported relayouts): tile the
        # flattened q rows across all head columns, zero off-diagonal
        # blocks with a 2D iota mask.
        qf2 = qf.reshape(R, d)
        qtile = jnp.concatenate([qf2] * hkv, axis=1)      # [R, hkv*d]
        rowh = jax.lax.broadcasted_iota(jnp.int32, (R, hkv * d), 0) \
            // rows
        colh = jax.lax.broadcasted_iota(jnp.int32, (R, hkv * d), 1) // d
        qbd = jnp.where(rowh == colh, qtile, 0)
        ri = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        rr = ri % rows
        pos_row = jnp.where(rr < qlen * group,
                            pos_base[b] + rr // group, -1)

        def body(c, carry):
            @pl.when(c > 0)
            def _issue(c=c):
                chunk_dma(slot, b, c, npages)

            chunk_wait(slot, b, c, npages)
            m_prev, l_prev, acc = carry
            kv_pos = (c * ck + jax.lax.broadcasted_iota(
                jnp.int32, (R, ck), 1))
            if fused_write:
                # New tokens are injected from registers below; their
                # cache slots are being written concurrently and must
                # not be read.
                valid = (kv_pos < pos_base[b]) & (pos_row >= 0)
            else:
                valid = kv_pos <= pos_row
            tok_real = (c * ck + jax.lax.broadcasted_iota(
                jnp.int32, (ck, 1), 0)) < npages * bs
            k2 = kvbuf[slot, :, 0].reshape(ck, hkv * d)
            if not kv_bf16:
                k2 = k2.astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                qbd, k2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # [R, ck]
            s = jnp.where(valid, s, -jnp.inf)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            m_safe = jnp.where(m_new == -jnp.inf, 0.0, m_new)
            alpha = jnp.where(m_prev == -jnp.inf, 0.0,
                              jnp.exp(m_prev - m_safe))
            pmat = jnp.exp(s - m_safe)
            l_new = alpha * l_prev + jnp.sum(pmat, -1, keepdims=True)
            v2 = kvbuf[slot, :, 1].reshape(ck, hkv * d)
            v2 = jnp.where(tok_real, v2.astype(jnp.bfloat16), 0)
            od = jax.lax.dot_general(
                pmat.astype(jnp.bfloat16), v2,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [R, hkv*d]
            pv = jnp.concatenate(
                [od[h * rows:(h + 1) * rows, h * d:(h + 1) * d]
                 for h in range(hkv)], axis=0)              # [R, d]
            return m_new, l_new, acc * alpha + pv

        init = (jnp.full((R, 1), -jnp.inf, jnp.float32),
                jnp.zeros((R, 1), jnp.float32),
                jnp.zeros((R, d), jnp.float32))
        m, l, acc = jax.lax.fori_loop(0, n_chunks, body, init)
        if fused_write:
            # Virtual chunk: this step's new tokens, straight from the
            # knew/vnew operands (cache dtype — numerics identical to
            # reading them back from the cache as the scatter path did).
            # Rows are padded to the 8-sublane boundary at call level
            # (qv = rounded qlen), so the slice is tile-aligned and the
            # dots run on the MXU like a normal (tiny) chunk; pad
            # columns are masked by realv (their new_blk is -1).
            kn = knew_vmem[pl.ds(b * qv, qv)].astype(jnp.bfloat16)
            vn = vnew_vmem[pl.ds(b * qv, qv)].astype(jnp.bfloat16)
            s2 = jax.lax.dot_general(
                qbd, kn, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # [R, qv]
            colj = jax.lax.broadcasted_iota(jnp.int32, (R, qv), 1)
            tokidx = rr // group
            # Padding rows (qv round-up, bucket surplus, dry fused
            # slots) are a contiguous TAIL per sequence, so one scalar
            # bounds them (vs a per-column scalar loop — the kernel is
            # scalar-unit-bound at decode shapes).
            valid2 = ((colj <= tokidx) & (pos_row >= 0)
                      & (colj < new_len[b]))
            s2 = jnp.where(valid2, s2, -jnp.inf)
            m_cur = jnp.max(s2, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, m_cur)
            m_safe = jnp.where(m_new == -jnp.inf, 0.0, m_new)
            alpha = jnp.where(m == -jnp.inf, 0.0, jnp.exp(m - m_safe))
            p2 = jnp.exp(s2 - m_safe)
            l = alpha * l + jnp.sum(p2, -1, keepdims=True)
            od2 = jax.lax.dot_general(
                p2.astype(jnp.bfloat16), vn, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [R, hkv*d]
            pv2 = jnp.concatenate(
                [od2[h * rows:(h + 1) * rows, h * d:(h + 1) * d]
                 for h in range(hkv)], axis=0)             # [R, d]
            acc = acc * alpha + pv2
        out = acc * (v_scale / jnp.maximum(l, 1e-20))
        out_vmem[g] = out.reshape(hkv, rows, d).astype(out_vmem.dtype)

    for g in range(gsz):
        b = p * gsz + g
        slot = g % N_BUF
        sl = seq_lens[b]

        # Cross-sequence prefetch: the next live sequence's first chunk
        # goes into the other slot while this one computes.
        if g + 1 < gsz:
            @pl.when(seq_lens[b + 1] > 0)
            def _pre(b=b, g=g):
                chunk_dma((g + 1) % N_BUF, b + 1, 0, npages_of(b + 1))

        @pl.when(sl > 0)
        def _run(b=b, g=g, slot=slot):
            npages = npages_of(b)
            n_chunks = (npages + G_CHUNK_PAGES - 1) // G_CHUNK_PAGES
            pos_row = jnp.where(r_iota < qlen * group,
                                pos_base[b] + t_off, -1)
            k_scale = kv_scale_smem[layer, 0]
            v_scale = kv_scale_smem[layer, 1]
            if headpack and hkv > 1:
                _run_headpacked(b, g, slot, npages, n_chunks,
                                k_scale, v_scale)
                return
            qf = [
                (q_vmem[g, h].astype(jnp.float32)
                 * (scale * k_scale)).astype(jnp.bfloat16)
                for h in range(hkv)
            ]

            def body(c, carry):
                # Single-buffered within a sequence (the slot's partner
                # holds the NEXT sequence's prefetch): issue chunk c>0
                # then wait.  One chunk covers G_CHUNK_PAGES*block_size
                # tokens (256 at the tuned default), so short decode
                # contexts rarely loop.
                @pl.when(c > 0)
                def _issue(c=c):
                    chunk_dma(slot, b, c, npages)

                chunk_wait(slot, b, c, npages)
                kv_pos = (c * ck + jax.lax.broadcasted_iota(
                    jnp.int32, (rows, ck), 1))
                if fused_write:
                    valid = (kv_pos < pos_base[b]) & (pos_row >= 0)
                else:
                    valid = kv_pos <= pos_row
                tok_real = (c * ck + jax.lax.broadcasted_iota(
                    jnp.int32, (ck, 1), 0)) < npages * bs
                kchunk = kvbuf[slot, :, 0]
                vchunk = kvbuf[slot, :, 1]
                new_carry = []
                for h in range(hkv):
                    m_prev, l_prev, acc = carry[h]
                    k = kchunk[:, :, h * d:(h + 1) * d].reshape(ck, d)
                    if not kv_bf16:
                        k = k.astype(jnp.bfloat16)
                    s = jax.lax.dot_general(
                        qf[h], k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s = jnp.where(valid, s, -jnp.inf)
                    m_cur = jnp.max(s, axis=-1, keepdims=True)
                    m_new = jnp.maximum(m_prev, m_cur)
                    m_safe = jnp.where(m_new == -jnp.inf, 0.0, m_new)
                    alpha = jnp.where(m_prev == -jnp.inf, 0.0,
                                      jnp.exp(m_prev - m_safe))
                    pmat = jnp.exp(s - m_safe)
                    l_new = alpha * l_prev + jnp.sum(pmat, -1,
                                                     keepdims=True)
                    v = vchunk[:, :, h * d:(h + 1) * d].reshape(ck, d)
                    v = jnp.where(tok_real, v.astype(jnp.bfloat16), 0)
                    pv = jax.lax.dot_general(
                        pmat.astype(jnp.bfloat16), v,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    new_carry.append((m_new, l_new, acc * alpha + pv))
                return tuple(new_carry)

            init = tuple(
                (jnp.full((rows, 1), -jnp.inf, jnp.float32),
                 jnp.zeros((rows, 1), jnp.float32),
                 jnp.zeros((rows, head_dim), jnp.float32))
                for _ in range(hkv))
            final = jax.lax.fori_loop(0, n_chunks, body, init)
            if fused_write:
                kn = knew_vmem[pl.ds(b * qv, qv)].astype(jnp.bfloat16)
                vn = vnew_vmem[pl.ds(b * qv, qv)].astype(jnp.bfloat16)
                colj = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, qv), 1)
                valid2 = ((colj <= t_off) & (pos_row >= 0)
                          & (colj < new_len[b]))
                upd = []
                for h in range(hkv):
                    m_prev, l_prev, acc = final[h]
                    s2 = jax.lax.dot_general(
                        qf[h], kn[:, h * d:(h + 1) * d],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s2 = jnp.where(valid2, s2, -jnp.inf)
                    m_cur = jnp.max(s2, axis=-1, keepdims=True)
                    m_new = jnp.maximum(m_prev, m_cur)
                    m_safe = jnp.where(m_new == -jnp.inf, 0.0, m_new)
                    alpha = jnp.where(m_prev == -jnp.inf, 0.0,
                                      jnp.exp(m_prev - m_safe))
                    p2 = jnp.exp(s2 - m_safe)
                    l_new = alpha * l_prev + jnp.sum(p2, -1,
                                                     keepdims=True)
                    pv2 = jax.lax.dot_general(
                        p2.astype(jnp.bfloat16),
                        vn[:, h * d:(h + 1) * d],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    upd.append((m_new, l_new, acc * alpha + pv2))
                final = tuple(upd)
            for h in range(hkv):
                _, l, acc = final[h]
                out = acc * (v_scale / jnp.maximum(l, 1e-20))
                out_vmem[g, h] = out.astype(out_vmem.dtype)

        @pl.when(sl == 0)
        def _skip(g=g):
            out_vmem[g] = jnp.zeros(out_vmem.shape[1:], out_vmem.dtype)


@functools.partial(jax.jit, static_argnames=("qlen", "scale", "gsz",
                                              "headpack"))
def _grouped_decode_call(q, kv_cache, layer, pos_base, block_tables,
                         seq_lens, kv_scale, qlen: int, scale: float,
                         gsz: int, headpack: bool = True,
                         knew=None, vnew=None, slot_mapping=None):
    t, hq, d = q.shape
    num_layers, n_blocks, _, bs, hkv_d = kv_cache.shape
    hkv = hkv_d // d
    group = hq // hkv
    b = block_tables.shape[0]
    bp = -(-b // gsz) * gsz
    rows = max(8, ((qlen * group + 7) // 8) * 8)
    qr = q.reshape(b, qlen, hkv, group, d).transpose(0, 2, 1, 3, 4)
    qr = qr.reshape(b, hkv, qlen * group, d)
    pads = ((0, bp - b), (0, 0), (0, rows - qlen * group), (0, 0))
    if any(p[1] for p in pads):
        qr = jnp.pad(qr, pads)
    if bp != b:
        pos_base = jnp.pad(pos_base, (0, bp - b))
        seq_lens = jnp.pad(seq_lens, (0, bp - b))
        block_tables = jnp.pad(block_tables, ((0, bp - b), (0, 0)))

    # Host-side run detection (see _grouped_decode_kernel): full chunks
    # whose pages are consecutive get a one-DMA fast path.  Identical
    # across layers, so XLA CSEs it to one tiny op per step.
    max_blk = block_tables.shape[1]
    n_chunks_max = -(-max_blk // G_CHUNK_PAGES)
    blk_pad = n_chunks_max * G_CHUNK_PAGES
    bt_r = block_tables
    if blk_pad != max_blk:
        bt_r = jnp.pad(bt_r, ((0, 0), (0, blk_pad - max_blk)))
    bt_r = bt_r.reshape(bp, n_chunks_max, G_CHUNK_PAGES)
    npages_v = (seq_lens + bs - 1) // bs
    full = ((jnp.arange(n_chunks_max)[None, :] + 1) * G_CHUNK_PAGES
            <= npages_v[:, None])
    base_v = bt_r[:, :, 0]
    contig = (bt_r == base_v[:, :, None]
              + jnp.arange(G_CHUNK_PAGES)[None, None, :]).all(-1)
    chunk_base = jnp.where(full & contig, base_v, -1).astype(jnp.int32)

    fused_write = knew is not None
    attn_spec = pl.BlockSpec((gsz, hkv, rows, d),
                             lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        attn_spec,
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    scratch = [
        pltpu.VMEM((N_BUF, G_CHUNK_PAGES, 2, bs, hkv_d),
                   kv_cache.dtype),
        pltpu.SemaphoreType.DMA((N_BUF,)),
    ]
    kernel = functools.partial(
        _grouped_decode_kernel, gsz=gsz, rows=rows, qlen=qlen,
        group=group, hkv=hkv, bs=bs, head_dim=d, scale=scale,
        kv_bf16=kv_cache.dtype == jnp.bfloat16, headpack=headpack,
        fused_write=fused_write)
    if fused_write:
        kernel = functools.partial(kernel, qv=-(-qlen // 8) * 8)
    if not fused_write:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5, grid=(bp // gsz,),
            in_specs=in_specs, out_specs=attn_spec,
            scratch_shapes=scratch)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((bp, hkv, rows, d), q.dtype),
            grid_spec=grid_spec,
        )(layer.reshape(1), pos_base, seq_lens, block_tables, chunk_base,
          qr, kv_cache, kv_scale)
        out = out[:b, :, :qlen * group, :].reshape(b, hkv, qlen, group, d)
        return out.transpose(0, 2, 1, 3, 4).reshape(t, hq, d)

    # Fused frontier write: knew/vnew [t, hkv*d] in CACHE dtype; the
    # kernel injects them into the softmax (virtual chunk) and DMAs
    # them into the aliased paged cache — no XLA scatter in the step.
    tp = bp * qlen
    if knew.shape[0] != tp:
        knew = jnp.pad(knew, ((0, tp - knew.shape[0]), (0, 0)))
        vnew = jnp.pad(vnew, ((0, tp - vnew.shape[0]), (0, 0)))
        slot_mapping = jnp.pad(slot_mapping, (0, tp - slot_mapping.shape[0]),
                               constant_values=-1)
    # Pad each sequence's rows to the 8-sublane boundary so the kernel's
    # per-seq slices are tile-aligned and the injection dots are MXU
    # shapes; pad rows carry slot -1 (masked).
    qv = -(-qlen // 8) * 8
    slots = slot_mapping.astype(jnp.int32)
    # Per-seq count of REAL new rows (padding — qv round-up, bucket
    # surplus, dry fused slots — is a contiguous tail of slot -1).
    new_len = jnp.sum((slots.reshape(bp, qlen) >= 0).astype(jnp.int32),
                      axis=1)
    if qv != qlen:
        def padq(a):
            a = a.reshape(bp, qlen, *a.shape[1:])
            pads = [(0, 0), (0, qv - qlen)] + [(0, 0)] * (a.ndim - 2)
            return jnp.pad(a, pads).reshape(bp * qv, *a.shape[2:])
        knew = padq(knew)
        vnew = padq(vnew)
    # Whole-array row blocks with a constant index_map: fetched into
    # VMEM once and revisited by every grid step (a per-program block
    # adds two pipeline DMA waits per program — measured ~0.5 ms/step
    # at batch 64).
    row_spec = pl.BlockSpec((bp * qv, hkv_d), lambda i, *_: (0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6, grid=(bp // gsz,),
        in_specs=in_specs + [row_spec, row_spec],
        out_specs=attn_spec,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bp, hkv, rows, d), q.dtype),
        grid_spec=grid_spec,
    )(layer.reshape(1), pos_base, seq_lens, block_tables, chunk_base,
      new_len, qr, kv_cache, kv_scale,
      knew.astype(kv_cache.dtype), vnew.astype(kv_cache.dtype))
    out = out[:b, :, :qlen * group, :].reshape(b, hkv, qlen, group, d)
    return out.transpose(0, 2, 1, 3, 4).reshape(t, hq, d)


def grouped_decode_attention_kernel(
    q: jax.Array,
    kv_cache: jax.Array,
    pos_base: jax.Array,
    block_tables: jax.Array,
    seq_lens: jax.Array,
    qlen: int = 1,
    gsz: int = 8,
    scale: float | None = None,
    kv_scale: jax.Array | None = None,
    layer: jax.Array | None = None,
    knew: jax.Array | None = None,
    vnew: jax.Array | None = None,
    slot_mapping: jax.Array | None = None,
) -> jax.Array:
    """Uniform-qlen decode attention, ``gsz`` sequences per program.

    Same contract as :func:`decode_paged_attention_kernel`; the engine
    uses it for pure-decode steps (every request contributes exactly
    ``qlen`` frontier rows, seq-major order), where grouping amortizes
    per-program fixed cost ~gsz-fold.

    With ``knew``/``vnew`` ([t, hkv*d] rows in CACHE dtype — the host
    quantizes to the cache format first, so softmax numerics match the
    scatter-then-read path bit-for-bit) and ``slot_mapping``, the new
    frontier rows are INJECTED into the softmax from registers (virtual
    chunk) instead of being read from the cache, letting the caller
    defer the cache scatter to one whole-model op after the layer
    stack (per-layer XLA scatters cost ~10 us fixed each on v5e).
    ``slot_mapping`` (< 0 = padding/sink) masks non-real rows.
    """
    t, hq, d = q.shape
    if scale is None:
        scale = d ** -0.5
    single_layer = layer is None
    if single_layer:
        kv_cache = kv_cache[None]
        layer = jnp.zeros((), jnp.int32)
    if kv_scale is None:
        kv_scale = jnp.ones((kv_cache.shape[0], 2), jnp.float32)
    else:
        kv_scale = jnp.asarray(kv_scale, jnp.float32)
        if kv_scale.ndim != 2:
            kv_scale = jnp.broadcast_to(
                kv_scale.reshape(-1)[0], (kv_cache.shape[0], 2))
    headpack = os.environ.get("ARCTIC_TPU_ATTN_HEADPACK", "1") != "0"
    res = _grouped_decode_call(
        q, kv_cache, jnp.asarray(layer, jnp.int32),
        jnp.asarray(pos_base, jnp.int32), block_tables,
        jnp.asarray(seq_lens, jnp.int32), kv_scale,
        qlen=int(qlen), scale=float(scale), gsz=int(gsz),
        headpack=headpack, knew=knew, vnew=vnew,
        slot_mapping=slot_mapping)
    del single_layer
    return res
