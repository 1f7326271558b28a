"""Automatic prefix caching (block_manager.py + scheduler admission).

The reference inherits this from vLLM V1 (on by default there): full KV
blocks are content-addressed and reused across requests.  Oracles:
outputs must be EXACTLY invariant to caching, and cached admissions must
skip the matched prefill work.
"""

import numpy as np
import pytest

from arcticinference_tpu.engine.block_manager import (BlockManager,
                                                      NoFreeBlocksError)
from arcticinference_tpu.engine.llm import LLM
from arcticinference_tpu.engine.request import SamplingParams
from tests.test_engine import tiny_config


class TestBlockManagerPrefixCache:

    def test_match_register_roundtrip(self):
        bm = BlockManager(16, 4)
        toks = list(range(1, 14))            # 13 tokens -> 3 full blocks
        blocks = bm.allocate(4)
        bm.register_prefix(toks, blocks, 3)
        got, matched = bm.match_prefix(toks)
        assert got == blocks[:3] and matched == 12
        # A shorter shared prefix matches fewer blocks.
        got2, matched2 = bm.match_prefix(toks[:9])
        assert got2 == blocks[:2] and matched2 == 8
        # Diverging content after block 1 only matches block 1.
        other = toks[:4] + [99] * 9
        got3, matched3 = bm.match_prefix(other)
        assert got3 == blocks[:1] and matched3 == 4

    def test_match_leaves_one_token(self):
        """A fully cached prompt must still leave >= 1 token to compute."""
        bm = BlockManager(16, 4)
        toks = list(range(1, 9))             # exactly 2 blocks
        blocks = bm.allocate(2)
        bm.register_prefix(toks, blocks, 2)
        got, matched = bm.match_prefix(toks)
        assert matched == 4 and got == blocks[:1]

    def test_refcount_shared_then_freed(self):
        bm = BlockManager(16, 4)
        toks = list(range(1, 14))
        blocks = bm.allocate(3)
        bm.register_prefix(toks, blocks, 3)
        got, _ = bm.match_prefix(toks)       # second reference
        bm.free(blocks)                      # first owner drops
        # Still referenced by the matcher: not evictable.
        free_before = bm.num_free_blocks
        bm.free(got)                         # last reference -> LRU pool
        assert bm.num_free_blocks == free_before + len(got)
        # Content still matchable from the LRU pool.
        again, matched = bm.match_prefix(toks)
        assert matched == 12 and again == blocks[:3]

    def test_eviction_drops_hash(self):
        bm = BlockManager(6, 4)              # blocks 1..5
        toks = list(range(1, 14))
        blocks = bm.allocate(3)
        bm.register_prefix(toks, blocks, 3)
        bm.free(blocks)                      # all 3 parked in LRU
        # Exhaust: allocate everything; LRU blocks get evicted.
        alloc = bm.allocate(5)
        assert sorted(alloc + [0])[:1] == [0]
        _, matched = bm.match_prefix(toks)
        assert matched == 0                  # hashes gone with eviction
        with pytest.raises(NoFreeBlocksError):
            bm.allocate(1)

    def test_disabled_mode_matches_nothing(self):
        bm = BlockManager(16, 4, enable_prefix_caching=False)
        toks = list(range(1, 14))
        blocks = bm.allocate(3)
        bm.register_prefix(toks, blocks, 3)
        assert bm.match_prefix(toks) == ([], 0)
        bm.free(blocks)
        assert bm.num_free_blocks == 15


class TestEnginePrefixCache:

    def _prompts(self, n=3, seed=40):
        rng = np.random.default_rng(seed)
        shared = [int(x) for x in rng.integers(1, 97, 24)]
        return [shared + [int(x) for x in rng.integers(1, 97, 4 + i)]
                for i in range(n)]

    def test_outputs_invariant_to_caching(self):
        prompts = self._prompts()
        sp = SamplingParams(max_tokens=10)
        off = tiny_config()
        off.cache.enable_prefix_caching = False
        want = [o.token_ids for o in LLM(off).generate(
            prompt_token_ids=prompts, sampling_params=sp)]
        llm = LLM(tiny_config())
        # Two passes: the second hits the cache for whole prompts.
        got1 = [o.token_ids for o in llm.generate(
            prompt_token_ids=prompts, sampling_params=sp)]
        got2 = [o.token_ids for o in llm.generate(
            prompt_token_ids=prompts, sampling_params=sp)]
        assert got1 == want and got2 == want

    def test_cached_admission_skips_prefill(self):
        llm = LLM(tiny_config())
        eng = llm.engine
        prompt = [int(x) for x in np.random.default_rng(41).integers(
            1, 97, 33)]
        sp = SamplingParams(max_tokens=6)
        llm.generate(prompt_token_ids=[prompt], sampling_params=sp)
        # Same prompt again: admission must attach the cached prefix.
        eng.add_request("again", prompt, sp)
        sched = eng.scheduler.schedule()
        (s,) = sched.scheduled
        # 33-token prompt, block 8: 4 full blocks cached => only the
        # final partial chunk is scheduled.
        assert s.request.num_computed_tokens == 32
        assert s.num_new_tokens == 1
        while eng.has_unfinished:
            eng.step()

    def test_shared_prefix_across_requests(self):
        """Distinct requests sharing a long prefix: the later one reuses
        the earlier one's blocks and produces identical output to the
        cache-off engine."""
        prompts = self._prompts(2, seed=42)
        sp = SamplingParams(max_tokens=8)
        off = tiny_config()
        off.cache.enable_prefix_caching = False
        want = [o.token_ids for o in LLM(off).generate(
            prompt_token_ids=prompts, sampling_params=sp)]
        llm = LLM(tiny_config())
        first = llm.generate(prompt_token_ids=[prompts[0]],
                             sampling_params=sp)
        second = llm.generate(prompt_token_ids=[prompts[1]],
                              sampling_params=sp)
        assert first[0].token_ids == want[0]
        assert second[0].token_ids == want[1]
        # The shared 24-token prefix = 3 full blocks were reused.
        assert llm.engine.scheduler.block_manager.num_free_blocks > 0

    def test_eviction_pressure_outputs_exact(self):
        """Tight cache: LRU eviction under churn must never corrupt
        outputs (every generation equals the cache-off engine)."""
        rng = np.random.default_rng(43)
        prompts = [[int(x) for x in rng.integers(1, 97, 20)]
                   for _ in range(6)]
        sp = SamplingParams(max_tokens=6, ignore_eos=True)
        off = tiny_config()
        off.cache.enable_prefix_caching = False
        off.cache.num_blocks = 24
        want = [LLM(off).generate(prompt_token_ids=[p],
                                  sampling_params=sp)[0].token_ids
                for p in prompts]
        cfg = tiny_config()
        cfg.cache.num_blocks = 24
        llm = LLM(cfg)
        for _ in range(2):  # second sweep re-matches / re-evicts
            for p, w in zip(prompts, want):
                got = llm.generate(prompt_token_ids=[p],
                                   sampling_params=sp)[0].token_ids
                assert got == w

    def test_fused_spec_with_prefix_cache(self):
        from arcticinference_tpu.config import SpeculativeConfig

        rng = np.random.default_rng(44)
        base = [int(x) for x in rng.integers(1, 97, 6)]
        prompts = [(base * 4)[:20] for _ in range(2)]
        sp = SamplingParams(max_tokens=16)
        off = tiny_config()
        off.cache.enable_prefix_caching = False
        want = [o.token_ids for o in LLM(off).generate(
            prompt_token_ids=prompts, sampling_params=sp)]
        cfg = tiny_config(speculative=SpeculativeConfig(
            method="suffix", enable_fused_decode=True))
        llm = LLM(cfg)
        got1 = [o.token_ids for o in llm.generate(
            prompt_token_ids=prompts, sampling_params=sp)]
        got2 = [o.token_ids for o in llm.generate(
            prompt_token_ids=prompts, sampling_params=sp)]
        assert got1 == want and got2 == want
