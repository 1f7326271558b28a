"""Paged KV block allocator (host side) with automatic prefix caching.

The role vLLM's KVCacheManager plays for the reference — including V1's
automatic prefix caching, which the reference inherits (on by default in
vLLM V1): full blocks are content-addressed by a chained hash of their
token ids, kept in an LRU pool after their last reference drops, and new
requests attach to the longest cached prefix instead of re-prefilling it.

Physical block 0 is reserved as the padding sink (device-side scatter
writes of padded tokens land there, see ``ops/kv_cache.py``), so it is
never handed out.

Safety invariants:
- only FULL blocks are ever shared (a request writes KV only at
  positions >= its matched prefix, which starts at a block boundary);
- a block is evictable only at refcount 0; eviction drops its hash so
  later matches cannot see stale pages;
- device ordering makes reuse safe under the async pipeline: the write
  of a registered block was dispatched before any later step that reads
  it (single in-order device stream).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional, Sequence

from arcticinference_tpu.utils import cdiv


class NoFreeBlocksError(RuntimeError):
    pass


class BlockManager:

    def __init__(self, num_blocks: int, block_size: int,
                 enable_prefix_caching: bool = True):
        if num_blocks < 2:
            raise ValueError("need at least 2 blocks (block 0 is reserved)")
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.enable_prefix_caching = enable_prefix_caching
        # LIFO free list; block 0 reserved.
        self._free: list[int] = list(range(num_blocks - 1, 0, -1))
        # Prefix cache state.
        self._ref: dict[int, int] = {}            # live refcounts
        self._hash_to_block: dict[int, int] = {}
        self._block_hash: dict[int, int] = {}     # reverse map
        self._lru: OrderedDict[int, None] = OrderedDict()  # ref==0, cached

    # -- capacity --------------------------------------------------------

    @property
    def num_free_blocks(self) -> int:
        return len(self._free) + len(self._lru)

    def blocks_needed(self, num_tokens: int) -> int:
        return cdiv(num_tokens, self.block_size)

    def can_allocate(self, n: int) -> bool:
        return self.num_free_blocks >= n

    # -- allocate / free -------------------------------------------------

    def allocate(self, n: int) -> list[int]:
        if n > self.num_free_blocks:
            raise NoFreeBlocksError(
                f"requested {n} blocks, {self.num_free_blocks} free")
        out: list[int] = []
        take = min(n, len(self._free))
        if take:
            out = self._free[-take:][::-1]
            del self._free[-take:]
        while len(out) < n:
            # Evict the least-recently-used cached block.
            b, _ = self._lru.popitem(last=False)
            self._drop_hash(b)
            out.append(b)
        for b in out:
            self._ref[b] = 1
        return out

    def free(self, blocks: Sequence[int]) -> None:
        for b in blocks:
            assert 0 < b < self.num_blocks, b
            r = self._ref.get(b, 1) - 1
            if r > 0:
                self._ref[b] = r
                continue
            self._ref.pop(b, None)
            if self.enable_prefix_caching and b in self._block_hash:
                # Content stays valid: park in the LRU pool, reusable by
                # a later prefix match until evicted.
                self._lru[b] = None
                self._lru.move_to_end(b)
            else:
                self._free.append(b)

    def grow_to(self, block_ids: list[int], num_tokens: int) -> None:
        """Extend a request's block list to cover ``num_tokens`` tokens."""
        need = self.blocks_needed(num_tokens) - len(block_ids)
        if need > 0:
            block_ids.extend(self.allocate(need))

    # -- prefix cache ----------------------------------------------------

    @staticmethod
    def _chain(prev: int, tokens: tuple) -> int:
        return hash((prev, tokens))

    def _drop_hash(self, block: int) -> None:
        h = self._block_hash.pop(block, None)
        if h is not None and self._hash_to_block.get(h) == block:
            del self._hash_to_block[h]

    def match_prefix(self, token_ids: Sequence[int]) -> tuple[list[int], int]:
        """Longest cached full-block prefix of ``token_ids``.

        Returns (blocks, num_matched_tokens); each returned block's
        refcount is incremented (caller owns one reference, released via
        ``free`` like any allocated block).  At most ``len - 1`` tokens
        match so the request always has >= 1 token to schedule.
        """
        if not self.enable_prefix_caching:
            return [], 0
        bs = self.block_size
        usable = max(len(token_ids) - 1, 0)
        blocks: list[int] = []
        h = 0
        for i in range(usable // bs):
            h = self._chain(h, tuple(token_ids[i * bs:(i + 1) * bs]))
            b = self._hash_to_block.get(h)
            if b is None:
                break
            blocks.append(b)
        for b in blocks:
            if b in self._lru:
                del self._lru[b]
            self._ref[b] = self._ref.get(b, 0) + 1
        return blocks, len(blocks) * bs

    def register_prefix(self, token_ids: Sequence[int],
                        block_ids: Sequence[int], num_full: int,
                        start_block: int = 0) -> int:
        """Register the chain hashes of blocks ``[start_block, num_full)``
        whose token values are all known; returns the new watermark.

        Deduplication keeps the FIRST registered block for a hash (later
        identical blocks still serve their own request and simply are
        not cached).
        """
        if not self.enable_prefix_caching:
            return start_block
        bs = self.block_size
        # Recompute the chain up to start_block (cheap: hashes only).
        h = 0
        for i in range(start_block):
            h = self._chain(h, tuple(token_ids[i * bs:(i + 1) * bs]))
        for i in range(start_block, num_full):
            h = self._chain(h, tuple(token_ids[i * bs:(i + 1) * bs]))
            b = block_ids[i]
            if h not in self._hash_to_block and b not in self._block_hash:
                self._hash_to_block[h] = b
                self._block_hash[b] = h
        return num_full
