"""Arctic MLP/LSTM speculator tests + engine integration.

Key invariant: speculative decoding must never change greedy output —
with a random (useless) drafter the engine output must equal the
no-speculation output, only slower.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcticinference_tpu.config import SpeculativeConfig
from arcticinference_tpu.engine.llm import LLM
from arcticinference_tpu.engine.request import SamplingParams
from arcticinference_tpu.models import speculators as S

from tests.test_engine import tiny_config


class TestMLPSpeculator:

    def test_proposal_shapes(self):
        arch = S.MLPSpecArch(vocab_size=100, emb_dim=32, inner_dim=48,
                             n_predict=3)
        params = S.mlp_init_params(arch, jax.random.PRNGKey(0), jnp.float32)
        toks = jnp.asarray([1, 2, 3, 4], jnp.int32)
        hidden = jnp.ones((4, 32), jnp.float32)
        out = S.mlp_generate_proposals(params, arch, toks, hidden, 3)
        assert out.shape == (4, 3)
        assert out.dtype == jnp.int32
        assert bool((out >= 0).all()) and bool((out < 100).all())

    def test_untied_variant(self):
        arch = S.MLPSpecArch(vocab_size=50, emb_dim=16, inner_dim=16,
                             n_predict=2, tie_weights=False)
        params = S.mlp_init_params(arch, jax.random.PRNGKey(1), jnp.float32)
        assert len(params["emb"]) == 2
        out = S.mlp_generate_proposals(
            params, arch, jnp.asarray([5], jnp.int32),
            jnp.ones((1, 16), jnp.float32), 2)
        assert out.shape == (1, 2)

    def test_deterministic(self):
        arch = S.MLPSpecArch(vocab_size=100, emb_dim=32, inner_dim=32,
                             n_predict=4)
        params = S.mlp_init_params(arch, jax.random.PRNGKey(0), jnp.float32)
        a = S.mlp_generate_proposals(
            params, arch, jnp.asarray([7, 8], jnp.int32),
            jnp.ones((2, 32), jnp.float32), 4)
        b = S.mlp_generate_proposals(
            params, arch, jnp.asarray([7, 8], jnp.int32),
            jnp.ones((2, 32), jnp.float32), 4)
        assert (np.asarray(a) == np.asarray(b)).all()

    def test_config_parsing_dotted_dims(self):
        arch = S.LSTMSpecArch.from_hf_config({
            "vocab_size": 100, "input_hidden_dim": 64,
            "emb_dim": "32", "inner_dim": "32.64", "proj_dim": "48",
            "n_predict": 3, "method": "sum_lstm"})
        assert arch.inner_dim == (32, 64)
        assert arch.proj_dim == (48,)


class TestLSTMSpeculator:

    def test_proposal_shapes(self):
        arch = S.LSTMSpecArch(vocab_size=80, input_hidden_dim=32,
                              emb_dim=(24,), inner_dim=(24,),
                              proj_dim=(24,), n_predict=3)
        params = S.lstm_init_params(arch, jax.random.PRNGKey(0),
                                    jnp.float32)
        out = S.lstm_generate_proposals(
            params, arch, jnp.asarray([1, 2], jnp.int32),
            jnp.ones((2, 32), jnp.float32), 3)
        assert out.shape == (2, 3)
        assert bool((out >= 0).all()) and bool((out < 80).all())


class TestEngineIntegration:

    def test_arctic_spec_preserves_greedy_output(self):
        base = LLM(tiny_config())
        spec = LLM(tiny_config(speculative=SpeculativeConfig(
            method="arctic", num_speculative_tokens=3)))
        prompts = [[3, 14, 15, 92, 65], [27, 18, 28]]
        sp = SamplingParams(max_tokens=12)
        want = base.generate(prompt_token_ids=prompts, sampling_params=sp)
        got = spec.generate(prompt_token_ids=prompts, sampling_params=sp)
        for w, g in zip(want, got):
            assert w.token_ids == g.token_ids
        # Random drafter proposed drafts (even if rarely accepted).
        assert spec.engine.spec_stats.num_drafts > 0

    def test_arctic_plus_suffix_combined(self):
        cfg = tiny_config(speculative=SpeculativeConfig(
            method="arctic", num_speculative_tokens=3,
            enable_suffix_decoding=True))
        llm = LLM(cfg)
        base = LLM(tiny_config())
        prompts = [[3, 14, 15, 92, 65]]
        sp = SamplingParams(max_tokens=24)
        want = base.generate(prompt_token_ids=prompts, sampling_params=sp)
        got = llm.generate(prompt_token_ids=prompts, sampling_params=sp)
        assert want[0].token_ids == got[0].token_ids
        # Both sources propose; a random drafter rarely gets accepted, so
        # assert drafting happened rather than acceptance.
        assert got[0].num_draft_tokens > 0

    def test_disable_by_batch_size(self):
        cfg = tiny_config(speculative=SpeculativeConfig(
            method="suffix", disable_by_batch_size=1))
        llm = LLM(cfg)
        prompts = [[3, 14, 15, 92], [5, 6, 7, 8], [9, 10, 11, 12]]
        outs = llm.generate(prompt_token_ids=prompts,
                            sampling_params=SamplingParams(max_tokens=10))
        # >1 running requests => speculation disabled => no drafts counted.
        assert llm.engine.spec_stats.num_drafts == 0
        assert all(len(o.token_ids) == 10 for o in outs)


class TestStochasticSpec:

    def test_temperature_spec_unbiased_smoke(self):
        """SYNC-path speculation with temperature>0 must produce
        plausible-length outputs and count draft activity; distribution
        equality is covered by the sample-and-compare construction.
        (Fused decode is pinned off: the fused loop only counts drafts
        the device actually walks, which under sampling is workload-
        dependent — its stochastic behaviour is covered in
        test_fused_decode.py.)"""
        from arcticinference_tpu.config import SpeculativeConfig

        cfg = tiny_config(speculative=SpeculativeConfig(
            method="suffix", enable_fused_decode=False))
        llm = LLM(cfg)
        prompt = [3, 14, 15, 92, 65]
        outs = llm.generate(
            prompt_token_ids=[prompt],
            sampling_params=SamplingParams(max_tokens=24,
                                           temperature=0.7))
        assert len(outs[0].token_ids) == 24
        # A second identical request drafts from the first response.
        outs2 = llm.generate(
            prompt_token_ids=[prompt],
            sampling_params=SamplingParams(max_tokens=24,
                                           temperature=0.7))
        assert llm.engine.spec_stats.num_drafts > 0


class TestSpecMaxLenBoundaries:
    """Mirror of reference tests/unit_tests/test_arctic_spec_max_len.py:
    speculation at max_model_len boundaries must not overrun (the clamp
    logic at engine._propose_drafts / scheduler draft truncation)."""

    @pytest.mark.parametrize("offset", [0, 1, 2, 3])
    def test_suffix_spec_near_max_len(self, offset):
        cfg = tiny_config(speculative=SpeculativeConfig(
            method="suffix", suffix_cache_max_depth=16))
        cfg.model.max_model_len = 64
        llm = LLM(cfg)
        # Repetitive prompt => aggressive drafts near the boundary.
        prompt = ([7, 8, 9, 10] * 12)[:64 - 16 - offset]
        out = llm.generate(
            prompt_token_ids=[prompt],
            sampling_params=SamplingParams(max_tokens=100,
                                           ignore_eos=True))
        total = len(prompt) + len(out[0].token_ids)
        assert total <= 64
        assert out[0].finish_reason == "finished_length"

    @pytest.mark.parametrize("offset", [0, 1, 2])
    def test_arctic_spec_near_max_len(self, offset):
        cfg = tiny_config(speculative=SpeculativeConfig(
            method="arctic", num_speculative_tokens=3))
        cfg.model.max_model_len = 48
        llm = LLM(cfg)
        prompt = [5, 6, 7, 8, 9, 10, 11][:7 - offset]
        out = llm.generate(
            prompt_token_ids=[prompt],
            sampling_params=SamplingParams(max_tokens=100,
                                           ignore_eos=True))
        assert len(prompt) + len(out[0].token_ids) <= 48


def test_long_suffix_drafts_fit_sample_buckets():
    """Many long drafts must not overflow the sample-row buckets
    (regression: rows can approach max_num_batched_tokens)."""
    cfg = tiny_config(speculative=SpeculativeConfig(
        method="suffix", suffix_cache_max_depth=32))
    llm = LLM(cfg)
    # Highly repetitive prompts across 4 requests -> long drafts at once.
    prompt = [4, 5, 6, 7] * 10
    outs = llm.generate(
        prompt_token_ids=[prompt, prompt, prompt, prompt],
        sampling_params=SamplingParams(max_tokens=40, ignore_eos=True))
    assert all(len(o.token_ids) == 40 for o in outs)


class TestQuantizedSpeculator:
    """Draft-model weight quantization (reference fp8.py
    Fp8ConfigWithEmbedding: fp8 LM head + fp8-weight embedding gather)."""

    @pytest.mark.parametrize("mode", ["fp8", "int8"])
    def test_mlp_quantized_matches_bf16_argmax(self, mode):
        # Well-separated logits => quantization must not flip the argmax
        # chain.  Use a tiny arch with distinct row magnitudes.
        arch = S.MLPSpecArch(vocab_size=64, emb_dim=32, inner_dim=32,
                             n_predict=3)
        params = S.mlp_init_params(arch, jax.random.PRNGKey(0),
                                   jnp.float32)
        qparams = S.quantize_spec_params(params, mode)
        toks = jnp.asarray([1, 2, 3, 4], jnp.int32)
        hidden = jax.random.normal(jax.random.PRNGKey(1), (4, 32),
                                   jnp.float32)
        want = S.mlp_generate_proposals(params, arch, toks, hidden, 3)
        got = S.mlp_generate_proposals(qparams, arch, toks, hidden, 3)
        assert got.shape == want.shape
        # Random-init logits are near-uniform, so exact argmax equality is
        # not guaranteed; require high agreement and validity.
        agree = float((got == want).mean())
        assert agree >= 0.5, f"quantized drafts diverged: {agree}"
        assert bool((got >= 0).all()) and bool((got < 64).all())

    @pytest.mark.parametrize("mode", ["fp8", "int8"])
    def test_lstm_quantized_runs(self, mode):
        arch = S.LSTMSpecArch(vocab_size=64, input_hidden_dim=32,
                              emb_dim=(32,), inner_dim=(32,),
                              proj_dim=(32,), n_predict=2)
        params = S.lstm_init_params(arch, jax.random.PRNGKey(0),
                                    jnp.float32)
        qparams = S.quantize_spec_params(params, mode)
        out = S.lstm_generate_proposals(
            qparams, arch, jnp.asarray([3, 9], jnp.int32),
            jnp.ones((2, 32), jnp.float32), 2)
        assert out.shape == (2, 2)
        assert bool((out >= 0).all()) and bool((out < 64).all())

    def test_engine_quantized_drafter_preserves_greedy(self):
        base = LLM(tiny_config())
        spec = LLM(tiny_config(speculative=SpeculativeConfig(
            method="arctic", num_speculative_tokens=3,
            quantization="fp8")))
        prompts = [[3, 14, 15, 92, 65]]
        sp = SamplingParams(max_tokens=12)
        want = base.generate(prompt_token_ids=prompts, sampling_params=sp)
        got = spec.generate(prompt_token_ids=prompts, sampling_params=sp)
        assert want[0].token_ids == got[0].token_ids
        assert spec.engine.spec_stats.num_drafts > 0

    def test_int4_rejected(self):
        with pytest.raises(ValueError):
            SpeculativeConfig(method="arctic", quantization="int4")
