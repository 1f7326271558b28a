"""Sampling-surface parity: min_p, per-request seed, penalties, string
stops, n>1 (capabilities the reference inherits from vLLM's sampler)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcticinference_tpu.engine.llm import LLM
from arcticinference_tpu.engine.request import SamplingParams
from arcticinference_tpu.ops.sampling import apply_penalties, sample

from tests.test_engine import tiny_config


def _prompts(n=3, seed=0):
    rng = np.random.default_rng(seed)
    return [[int(x) for x in rng.integers(1, 97, rng.integers(5, 20))]
            for _ in range(n)]


class TestSampleOp:

    def test_min_p_filters_tail(self):
        # One dominant token: min_p close to 1 forces it even at temp 1.
        logits = jnp.array([[10.0, 0.0, 0.0, 0.0]] * 4)
        t = jnp.ones(4)
        z = jnp.zeros(4, jnp.int32)
        p1 = jnp.ones(4)
        for s in range(5):
            tok = sample(logits, t, z, p1, jax.random.PRNGKey(s),
                         min_p=jnp.full(4, 0.9))
            assert np.asarray(tok).tolist() == [0, 0, 0, 0]

    def test_seeded_rows_are_schedule_invariant(self):
        logits = jax.random.normal(jax.random.PRNGKey(1), (8, 64))
        t = jnp.ones(8)
        z = jnp.zeros(8, jnp.int32)
        p1 = jnp.ones(8)
        seeds = jnp.full(8, 42, jnp.int32)
        ctr = jnp.arange(8, dtype=jnp.int32)
        a = sample(logits, t, z, p1, jax.random.PRNGKey(0),
                   seeds=seeds, counters=ctr)
        # Different step rng, same seeds/counters -> identical draws.
        b = sample(logits, t, z, p1, jax.random.PRNGKey(999),
                   seeds=seeds, counters=ctr)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        # Unseeded rows change with the step rng.
        c = sample(logits, t, z, p1, jax.random.PRNGKey(0),
                   seeds=jnp.full(8, -1, jnp.int32), counters=ctr)
        d = sample(logits, t, z, p1, jax.random.PRNGKey(999),
                   seeds=jnp.full(8, -1, jnp.int32), counters=ctr)
        assert not np.array_equal(np.asarray(c), np.asarray(d))

    def test_penalties_math(self):
        logits = jnp.zeros((2, 8), jnp.float32).at[0, 3].set(2.0)
        out = jnp.array([[3, 3, 5, -1], [-1, -1, -1, -1]], jnp.int32)
        al = jnp.array([[1, 3, 3, 5], [2, -1, -1, -1]], jnp.int32)
        rp = jnp.array([2.0, 2.0])
        pp = jnp.array([0.5, 0.0])
        fp = jnp.array([0.25, 0.0])
        got = np.asarray(apply_penalties(logits, out, al, rp, pp, fp))
        # Row 0 token 3: logit 2.0, freq 2*0.25, presence 0.5 -> 1.0,
        # then repetition (seen, positive) /2 -> 0.5.
        assert got[0, 3] == pytest.approx(0.5)
        # Row 0 token 5: 0 - 0.25 - 0.5 = -0.75, seen -> *2 = -1.5.
        assert got[0, 5] == pytest.approx(-1.5)
        # Row 0 token 1: prompt-only (seen, zero logit) -> 0.
        assert got[0, 1] == pytest.approx(0.0)
        # Row 1 token 2: repetition only on prompt token, logit 0 -> 0.
        assert got[1, 2] == pytest.approx(0.0)
        # Untouched tokens unchanged.
        assert got[0, 7] == pytest.approx(0.0)
        assert got[1, 3] == pytest.approx(0.0)


class TestEngineSampling:

    def test_seeded_request_reproducible_and_schedule_invariant(self):
        llm = LLM(tiny_config())
        sp = SamplingParams(max_tokens=12, temperature=1.0, seed=7,
                            ignore_eos=True)
        p = _prompts(1)[0]
        alone = llm.generate(prompt_token_ids=[p], sampling_params=sp)
        # Same request co-scheduled with noise traffic.
        noise = SamplingParams(max_tokens=12, temperature=1.0,
                               ignore_eos=True)
        batch = llm.generate(
            prompt_token_ids=[_prompts(2, seed=5)[1], p],
            sampling_params=[noise, sp])
        assert batch[1].token_ids == alone[0].token_ids
        # And reproducible across runs.
        again = llm.generate(prompt_token_ids=[p], sampling_params=sp)
        assert again[0].token_ids == alone[0].token_ids

    def test_frequency_penalty_blocks_repeats(self):
        llm = LLM(tiny_config())
        p = _prompts(1, seed=3)[0]
        sp = SamplingParams(max_tokens=16, frequency_penalty=1000.0,
                            ignore_eos=True)
        out = llm.generate(prompt_token_ids=[p], sampling_params=sp)
        toks = out[0].token_ids
        assert len(set(toks)) == len(toks), toks

    def test_repetition_penalty_changes_greedy(self):
        llm = LLM(tiny_config())
        p = _prompts(1, seed=4)[0]
        base = llm.generate(prompt_token_ids=[p],
                            sampling_params=SamplingParams(
                                max_tokens=16, ignore_eos=True))
        pen = llm.generate(prompt_token_ids=[p],
                           sampling_params=SamplingParams(
                               max_tokens=16, repetition_penalty=5.0,
                               ignore_eos=True))
        # The prompt tokens themselves are penalized, so even the first
        # greedy pick can change; outputs must diverge somewhere.
        assert base[0].token_ids != pen[0].token_ids

    def test_penalties_force_sync_path(self):
        llm = LLM(tiny_config())
        p = _prompts(1)[0]
        llm.generate(prompt_token_ids=[p],
                     sampling_params=SamplingParams(
                         max_tokens=4, presence_penalty=0.5))
        kinds = llm.engine.step_times.summary()
        assert "sync" in kinds and "pipelined" not in kinds


class _FakeTok:
    eos_token_id = None

    def decode(self, ids, **kw):
        return "".join(f"<{i}>" for i in ids)


class TestStopStrings:

    def _llm(self):
        llm = LLM(tiny_config())
        llm.engine.tokenizer = _FakeTok()
        return llm

    def test_stop_string_truncates(self):
        llm = self._llm()
        p = _prompts(1, seed=6)[0]
        base = llm.generate(prompt_token_ids=[p],
                            sampling_params=SamplingParams(
                                max_tokens=12, ignore_eos=True))
        toks = base[0].token_ids
        stop_tok = toks[5]
        sp = SamplingParams(max_tokens=12, ignore_eos=True,
                            stop=(f"<{stop_tok}>",))
        out = llm.generate(prompt_token_ids=[p], sampling_params=sp)
        assert out[0].finish_reason == "finished_stopped"
        # final_text cut before the stop sequence.
        want_text = "".join(f"<{t}>" for t in toks[:5])
        assert out[0].text == want_text

    def test_stop_string_sync_path_too(self):
        llm = LLM(tiny_config(
            model_kw={}, speculative=None))
        llm.engine.tokenizer = _FakeTok()
        llm.engine._pipeline = False  # force the synchronous path
        p = _prompts(1, seed=6)[0]
        base = llm.generate(prompt_token_ids=[p],
                            sampling_params=SamplingParams(
                                max_tokens=12, ignore_eos=True))
        stop_tok = base[0].token_ids[4]
        out = llm.generate(prompt_token_ids=[p],
                           sampling_params=SamplingParams(
                               max_tokens=12, ignore_eos=True,
                               stop=(f"<{stop_tok}>",)))
        assert out[0].finish_reason == "finished_stopped"
        assert len(out[0].token_ids) <= 12

    def test_stop_without_tokenizer_rejected(self):
        llm = LLM(tiny_config())
        with pytest.raises(ValueError, match="tokenizer"):
            llm.generate(prompt_token_ids=[_prompts(1)[0]],
                         sampling_params=SamplingParams(
                             max_tokens=4, stop=("x",)))


class TestN:

    def test_n_greedy_identical_choices(self):
        llm = LLM(tiny_config())
        p = _prompts(1)[0]
        outs = llm.generate(prompt_token_ids=[p],
                            sampling_params=SamplingParams(
                                max_tokens=8, n=3, ignore_eos=True))
        assert len(outs) == 3
        assert outs[0].token_ids == outs[1].token_ids == outs[2].token_ids

    def test_n_seeded_choices_differ(self):
        llm = LLM(tiny_config())
        p = _prompts(1)[0]
        outs = llm.generate(prompt_token_ids=[p],
                            sampling_params=SamplingParams(
                                max_tokens=10, n=3, temperature=1.0,
                                seed=11, ignore_eos=True))
        assert len(outs) == 3
        assert len({tuple(o.token_ids) for o in outs}) > 1
        # Reproducible: same call, same three outputs.
        again = llm.generate(prompt_token_ids=[p],
                             sampling_params=SamplingParams(
                                 max_tokens=10, n=3, temperature=1.0,
                                 seed=11, ignore_eos=True))
        for a, b in zip(outs, again):
            assert a.token_ids == b.token_ids


class TestPipelinedLogprobs:
    """Logprobs requests ride the async pipeline (round-1 weakness: any
    logprobs request forced the whole engine onto the sync path)."""

    def test_logprobs_on_pipeline_match_sync(self):
        p = _prompts(1, seed=8)[0]
        sp = SamplingParams(max_tokens=8, logprobs=4, ignore_eos=True)

        piped = LLM(tiny_config())
        got = piped.generate(prompt_token_ids=[p], sampling_params=sp)[0]
        kinds = piped.engine.step_times.summary()
        assert "pipelined" in kinds and "sync" not in kinds, kinds

        syncd = LLM(tiny_config())
        syncd.engine._pipeline = False
        want = syncd.generate(prompt_token_ids=[p], sampling_params=sp)[0]

        assert got.token_ids == want.token_ids
        assert got.logprobs is not None and want.logprobs is not None
        assert len(got.logprobs) == len(got.token_ids)
        for a, b in zip(got.logprobs, want.logprobs):
            assert set(a) == set(b)
            for t in a:
                assert abs(a[t] - b[t]) < 1e-4
