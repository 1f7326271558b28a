"""End-to-end engine tests on the CPU backend.

The key correctness oracle: the engine's paged continuous-batching output
must exactly match naive full-context greedy decoding with the same
weights (computed via the model's own forward on a scratch cache).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                        ModelConfig, SchedulerConfig,
                                        SpeculativeConfig)
from arcticinference_tpu.engine.block_manager import (BlockManager,
                                                      NoFreeBlocksError)
from arcticinference_tpu.engine.llm import LLM
from arcticinference_tpu.engine.request import SamplingParams

TINY = dict(
    vocab_size=97, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16)


def tiny_config(**kw) -> EngineConfig:
    spec = kw.pop("speculative", None)
    hf = {**TINY, **kw.pop("hf", {})}
    return EngineConfig(
        model=ModelConfig(model="llama", hf_overrides=hf,
                          max_model_len=256, dtype="float32", **kw.pop(
                              "model_kw", {})),
        cache=CacheConfig(block_size=8, num_blocks=128),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64),
        speculative=spec,
    )


@pytest.fixture(scope="module")
def llm():
    return LLM(tiny_config())


def naive_greedy(llm: LLM, prompt: list[int], n: int) -> list[int]:
    """Oracle: recompute the full context each token on a scratch cache."""
    from arcticinference_tpu.ops.kv_cache import (KVCacheSpec,
                                                  allocate_kv_cache)

    eng = llm.engine
    module, arch, params = eng.runner.module, eng.arch, eng.runner.params
    out = []
    toks = list(prompt)
    for _ in range(n):
        t = len(toks)
        spec = KVCacheSpec(num_layers=arch.num_layers, num_blocks=64,
                           num_kv_heads=arch.num_kv_heads, block_size=8,
                           head_dim=arch.head_dim, dtype=jnp.float32)
        kv = allocate_kv_cache(spec)
        inputs = dict(
            input_ids=jnp.asarray(toks, jnp.int32),
            positions=jnp.arange(t, dtype=jnp.int32),
            req_idx=jnp.zeros(t, jnp.int32),
            slot_mapping=jnp.arange(8, 8 + t, dtype=jnp.int32),
            block_tables=jnp.arange(1, 33, dtype=jnp.int32)[None, :],
            seq_lens=jnp.array([t], jnp.int32),
        )
        kv, h = module.forward(params, arch, kv, inputs)
        logits = module.compute_logits(params, h[-1:])
        tok = int(jnp.argmax(logits, -1)[0])
        out.append(tok)
        toks.append(tok)
    return out


class TestGreedyCorrectness:

    def test_single_request_matches_naive(self, llm):
        prompt = [3, 14, 15, 92, 65, 35]
        want = naive_greedy(llm, prompt, 8)
        got = llm.generate(prompt_token_ids=[prompt],
                           sampling_params=SamplingParams(max_tokens=8))
        assert got[0].token_ids == want

    def test_batch_matches_naive(self, llm):
        rng = np.random.default_rng(0)
        prompts = [list(rng.integers(1, 97, rng.integers(3, 40)))
                   for _ in range(5)]
        prompts = [[int(x) for x in p] for p in prompts]
        wants = [naive_greedy(llm, p, 6) for p in prompts]
        outs = llm.generate(prompt_token_ids=prompts,
                            sampling_params=SamplingParams(max_tokens=6))
        for o, w in zip(outs, wants):
            assert o.token_ids == w

    def test_long_prompt_chunked_prefill(self, llm):
        # Prompt longer than max_num_batched_tokens forces chunking.
        rng = np.random.default_rng(1)
        prompt = [int(x) for x in rng.integers(1, 97, 150)]
        want = naive_greedy(llm, prompt, 4)
        out = llm.generate(prompt_token_ids=[prompt],
                           sampling_params=SamplingParams(max_tokens=4))
        assert out[0].token_ids == want

    def test_max_tokens_respected(self, llm):
        out = llm.generate(prompt_token_ids=[[5, 6, 7]],
                           sampling_params=SamplingParams(max_tokens=3))
        assert len(out[0].token_ids) == 3
        assert out[0].finish_reason == "finished_length"

    def test_stop_token(self, llm):
        base = llm.generate(prompt_token_ids=[[5, 6, 7]],
                            sampling_params=SamplingParams(max_tokens=5))
        first = base[0].token_ids[0]
        out = llm.generate(
            prompt_token_ids=[[5, 6, 7]],
            sampling_params=SamplingParams(max_tokens=5,
                                           stop_token_ids=(first,)))
        assert out[0].token_ids == [first]
        assert out[0].finish_reason == "finished_stopped"


class TestSampling:

    def test_temperature_changes_output(self, llm):
        p = [[9, 8, 7, 6]]
        a = llm.generate(prompt_token_ids=p,
                         sampling_params=SamplingParams(
                             max_tokens=12, temperature=5.0))
        b = llm.generate(prompt_token_ids=p,
                         sampling_params=SamplingParams(
                             max_tokens=12, temperature=5.0))
        # With high temperature on random weights, two runs (different rng
        # streams) should diverge.
        assert a[0].token_ids != b[0].token_ids


class TestSuffixDecoding:

    def test_repetitive_output_accelerated(self):
        cfg = tiny_config(speculative=SpeculativeConfig(
            method="suffix", suffix_cache_max_depth=16))
        llm2 = LLM(cfg)
        base = LLM(tiny_config())
        prompt = [3, 14, 15, 92, 65, 35]
        want = base.generate(prompt_token_ids=[prompt],
                             sampling_params=SamplingParams(max_tokens=24))
        got = llm2.generate(prompt_token_ids=[prompt],
                            sampling_params=SamplingParams(max_tokens=24))
        # Identical tokens (speculation never changes greedy output)...
        assert got[0].token_ids == want[0].token_ids
        # ...and with random weights the chain loops quickly, so suffix
        # decoding must have accepted drafts.
        assert got[0].num_accepted_draft_tokens > 0

    def test_cross_request_reuse(self):
        cfg = tiny_config(speculative=SpeculativeConfig(method="suffix"))
        llm2 = LLM(cfg)
        prompt = [3, 14, 15, 92]
        llm2.generate(prompt_token_ids=[prompt],
                      sampling_params=SamplingParams(max_tokens=16))
        out2 = llm2.generate(prompt_token_ids=[prompt],
                             sampling_params=SamplingParams(max_tokens=16))
        # Second identical request should draft heavily from the first
        # response (global tree) and accept nearly everything.
        assert out2[0].num_accepted_draft_tokens >= \
            len(out2[0].token_ids) // 2


class TestBlockManager:

    def test_alloc_free_cycle(self):
        bm = BlockManager(num_blocks=10, block_size=4)
        a = bm.allocate(3)
        assert len(set(a)) == 3 and 0 not in a
        bm.free(a)
        assert bm.num_free_blocks == 9

    def test_exhaustion(self):
        bm = BlockManager(num_blocks=4, block_size=4)
        bm.allocate(3)
        with pytest.raises(NoFreeBlocksError):
            bm.allocate(1)

    def test_grow_to(self):
        bm = BlockManager(num_blocks=10, block_size=4)
        ids: list[int] = []
        bm.grow_to(ids, 9)   # 3 blocks
        assert len(ids) == 3
        bm.grow_to(ids, 12)  # still 3
        assert len(ids) == 3
        bm.grow_to(ids, 13)  # 4th
        assert len(ids) == 4


class TestSchedulerBehavior:

    def test_more_requests_than_slots(self):
        llm2 = LLM(tiny_config())
        rng = np.random.default_rng(2)
        prompts = [[int(x) for x in rng.integers(1, 97, 10)]
                   for _ in range(9)]  # > max_num_seqs=4
        outs = llm2.generate(prompt_token_ids=prompts,
                             sampling_params=SamplingParams(max_tokens=4))
        assert len(outs) == 9
        assert all(len(o.token_ids) == 4 for o in outs)


class TestFp8KVCache:

    def test_fp8_kv_outputs_close_to_bf16(self):
        # fp8 KV storage (unit scale) should preserve greedy outputs on
        # most steps; require exact-prefix agreement for several tokens.
        base = LLM(tiny_config())
        cfg = tiny_config()
        cfg.cache.kv_cache_dtype = "fp8"
        fp8 = LLM(cfg)
        prompt = [3, 14, 15, 92, 65, 35]
        a = base.generate(prompt_token_ids=[prompt],
                          sampling_params=SamplingParams(max_tokens=8))
        b = fp8.generate(prompt_token_ids=[prompt],
                         sampling_params=SamplingParams(max_tokens=8))
        assert len(b[0].token_ids) == 8
        # Rounding can flip late tokens; the first few must agree.
        assert a[0].token_ids[:3] == b[0].token_ids[:3]


class TestAsyncScheduling:

    def test_async_equals_sync(self):
        cfg_async = tiny_config()
        cfg_sync = tiny_config()
        cfg_sync.scheduler.async_scheduling = False
        a = LLM(cfg_async)
        s = LLM(cfg_sync)
        assert a.engine._pipeline and not s.engine._pipeline
        rng = np.random.default_rng(3)
        prompts = [[int(x) for x in rng.integers(1, 97, n)]
                   for n in (5, 23, 70, 11, 3, 40)]
        pa = a.generate(prompt_token_ids=prompts,
                        sampling_params=SamplingParams(max_tokens=12))
        ps = s.generate(prompt_token_ids=prompts,
                        sampling_params=SamplingParams(max_tokens=12))
        for x, y in zip(pa, ps):
            assert x.token_ids == y.token_ids

    def test_async_stop_token(self):
        llm = LLM(tiny_config())
        base = llm.generate(prompt_token_ids=[[5, 6, 7]],
                            sampling_params=SamplingParams(max_tokens=5))
        first = base[0].token_ids[0]
        out = llm.generate(
            prompt_token_ids=[[5, 6, 7]],
            sampling_params=SamplingParams(max_tokens=5,
                                           stop_token_ids=(first,)))
        assert out[0].token_ids == [first]


class TestPreemption:

    @pytest.mark.parametrize("blocks", [14, 11, 9])
    def test_preempt_at_max_tokens_boundary(self, blocks):
        """Regression: a preemption flush can FINISH requests already in
        the step's schedule (their last pending token resolves and the
        max_tokens trim fires) — their stale scheduled entries must be
        dropped, and a finished-while-waiting request must never be
        re-admitted.  Outputs must match an ample-cache run exactly."""
        rng = np.random.default_rng(0)
        prompts = [[int(x) for x in rng.integers(1, 97, 16)]
                   for _ in range(8)]
        sp = SamplingParams(max_tokens=8, ignore_eos=True)

        ample = tiny_config()
        ample.scheduler.max_num_seqs = 8
        want = [o.token_ids for o in LLM(ample).generate(
            prompt_token_ids=prompts, sampling_params=sp)]

        cfg = tiny_config()
        cfg.cache.num_blocks = blocks  # heavy preemption pressure
        cfg.scheduler.max_num_seqs = 8
        outs = LLM(cfg).generate(prompt_token_ids=prompts,
                                 sampling_params=sp)
        for o, w in zip(outs, want):
            assert o.token_ids == w

    def test_block_exhaustion_preempts_and_recovers(self):
        # Tiny block pool: 4 requests cannot all hold max-length KV.
        cfg = tiny_config()
        cfg.cache.num_blocks = 24  # 23 usable * 8 tokens = 184 token slots
        llm = LLM(cfg)
        rng = np.random.default_rng(5)
        prompts = [[int(x) for x in rng.integers(1, 97, 30)]
                   for _ in range(4)]
        outs = llm.generate(prompt_token_ids=prompts,
                            sampling_params=SamplingParams(max_tokens=30))
        # All requests complete despite preemption/recompute.
        assert all(len(o.token_ids) == 30 for o in outs)
        # And recompute preserved greedy determinism.
        base = LLM(tiny_config())
        wants = base.generate(prompt_token_ids=prompts,
                              sampling_params=SamplingParams(max_tokens=30))
        for o, w in zip(outs, wants):
            assert o.token_ids == w.token_ids

    def test_abort_mid_generation(self):
        llm = LLM(tiny_config())
        eng = llm.engine
        eng.add_request("keep", [5, 6, 7],
                        SamplingParams(max_tokens=12))
        eng.add_request("drop", [8, 9, 10],
                        SamplingParams(max_tokens=12))
        for _ in range(3):
            eng.step()
        eng.abort_request("drop")
        while eng.has_unfinished:
            eng.step()
        ids = {r.req_id for r in eng.scheduler.running}
        assert not ids
        # The kept request ran to completion.
        assert not eng.has_unfinished


class TestLogprobs:

    def test_greedy_logprobs(self):
        llm = LLM(tiny_config())
        out = llm.generate(
            prompt_token_ids=[[3, 14, 15]],
            sampling_params=SamplingParams(max_tokens=5, logprobs=4))[0]
        assert out.logprobs is not None
        assert len(out.logprobs) == 5
        for tok, lp in zip(out.token_ids, out.logprobs):
            assert len(lp) == 4
            # The chosen (greedy) token is the top candidate.
            top = max(lp, key=lp.get)
            assert top == tok
            assert all(v <= 0.0 for v in lp.values())

    def test_logprobs_validation(self):
        with pytest.raises(ValueError):
            SamplingParams(logprobs=40)
