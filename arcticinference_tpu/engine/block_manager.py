"""Paged KV block allocator (host side).

The role vLLM's KVCacheManager plays for the reference.  Physical block 0
is reserved as the padding sink (device-side scatter writes of padded
tokens land there, see ``ops/kv_cache.py``), so it is never handed out.
"""

from __future__ import annotations

from arcticinference_tpu.utils import cdiv


class NoFreeBlocksError(RuntimeError):
    pass


class BlockManager:

    def __init__(self, num_blocks: int, block_size: int):
        if num_blocks < 2:
            raise ValueError("need at least 2 blocks (block 0 is reserved)")
        self.num_blocks = num_blocks
        self.block_size = block_size
        # LIFO free list; block 0 reserved.
        self._free: list[int] = list(range(num_blocks - 1, 0, -1))

    @property
    def num_free_blocks(self) -> int:
        return len(self._free)

    def blocks_needed(self, num_tokens: int) -> int:
        return cdiv(num_tokens, self.block_size)

    def can_allocate(self, n: int) -> bool:
        return len(self._free) >= n

    def allocate(self, n: int) -> list[int]:
        if n > len(self._free):
            raise NoFreeBlocksError(
                f"requested {n} blocks, {len(self._free)} free")
        out = self._free[-n:][::-1]
        del self._free[-n:]
        return out

    def free(self, blocks: list[int]) -> None:
        for b in blocks:
            assert 0 < b < self.num_blocks, b
        self._free.extend(reversed(blocks))

    def grow_to(self, block_ids: list[int], num_tokens: int) -> None:
        """Extend a request's block list to cover ``num_tokens`` tokens."""
        need = self.blocks_needed(num_tokens) - len(block_ids)
        if need > 0:
            block_ids.extend(self.allocate(need))
