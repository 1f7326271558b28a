"""Drafter distillation end to end (spec/distill.py).

The reference ships pre-distilled Arctic speculator checkpoints; here the
capability is reproduced in-environment: capture (hidden, next-K-token)
pairs from the running engine, train the tied-table MLP drafter on-chip,
and verify that speculative decoding with the distilled drafter

1. produces EXACTLY the greedy baseline output (verification invariance),
2. achieves real, measured draft acceptance (the north-star mechanism:
   >1 token per target step).
"""

import os

import numpy as np
import pytest

from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                        ModelConfig, SchedulerConfig,
                                        SpeculativeConfig)
from arcticinference_tpu.engine.llm import LLM
from arcticinference_tpu.engine.request import SamplingParams

TINY = dict(
    vocab_size=211, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=32)


def _config(speculative=None, sync=False) -> EngineConfig:
    return EngineConfig(
        model=ModelConfig(model="llama", hf_overrides=dict(TINY),
                          max_model_len=256, dtype="float32"),
        cache=CacheConfig(block_size=8, num_blocks=128),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  async_scheduling=not sync),
        speculative=speculative,
    )


def _prompts(n=4, seed=0):
    rng = np.random.default_rng(seed)
    return [[int(x) for x in rng.integers(1, 200, 12)] for _ in range(n)]


GEN = 24


@pytest.fixture(scope="module")
def distilled(tmp_path_factory):
    from arcticinference_tpu.spec.distill import (capture_pairs,
                                                  distill_mlp,
                                                  save_distilled)

    llm = LLM(_config(sync=True))
    prompts = _prompts()
    hidden, tok0, targets, mask = capture_pairs(
        llm, prompts, gen_len=GEN, n_predict=3)
    assert hidden.shape[0] == len(prompts) * (GEN - 1)
    params, arch, acc = distill_mlp(
        llm.engine.runner.params, hidden, tok0, targets, mask,
        n_predict=3, steps=600, lr=3e-3, log_every=0)
    out = tmp_path_factory.mktemp("drafter")
    save_distilled(out, params, arch,
                   metrics={"train_acc": [float(a) for a in acc]})
    # Greedy baseline from the same engine (weights are seed-determined,
    # so a fresh engine reproduces them bit-for-bit).
    want = llm.generate(prompt_token_ids=prompts,
                        sampling_params=SamplingParams(max_tokens=GEN,
                                                       ignore_eos=True))
    return out, prompts, [w.token_ids for w in want], acc


class TestDistill:

    def test_memorization_accuracy(self, distilled):
        _, _, _, acc = distilled
        # Head 1 must learn the target's next-token map almost exactly;
        # later heads degrade gracefully.
        assert acc[0] > 0.9, acc
        assert acc[1] > 0.5, acc

    def test_spec_matches_greedy_with_real_acceptance(self, distilled):
        out, prompts, want, _ = distilled
        spec = SpeculativeConfig(method="arctic", model=str(out),
                                 num_speculative_tokens=3)
        llm = LLM(_config(speculative=spec))
        got = llm.generate(prompt_token_ids=prompts,
                           sampling_params=SamplingParams(max_tokens=GEN,
                                                          ignore_eos=True))
        for g, w in zip(got, want):
            assert g.token_ids == w
        stats = llm.engine.spec_stats
        assert stats.num_drafts > 0
        assert stats.acceptance_rate > 0.5, stats.acceptance_rate
        # The whole point: >1 token per verified step on average.
        per_req = [(len(g.token_ids), g.num_draft_tokens,
                    g.num_accepted_draft_tokens) for g in got]
        total_acc = sum(a for _, _, a in per_req)
        assert total_acc > 0, per_req

    def test_spec_shaped_capture_transfers(self, tmp_path):
        """The production recipe (benchmarks/distill_drafter.py): capture
        runs the SAME spec configuration the measurement replays —
        verify-shaped fused-loop programs seeded with a random drafter of
        the distilled architecture, prefix caching off.  On the real
        8B random-weight target this is the only capture that transfers
        (greedy argmax flips under any program-shape change); here it
        must reach full acceptance on replay."""
        from arcticinference_tpu.spec.distill import (capture_pairs,
                                                      distill_mlp,
                                                      init_tied_drafter,
                                                      save_distilled)

        seed_dir = tmp_path / "seed"
        sp, sa = init_tied_drafter(
            (TINY["hidden_size"], TINY["vocab_size"]), n_predict=3)
        save_distilled(seed_dir, sp, sa)

        def spec_cfg(model_dir):
            cfg = _config(
                speculative=SpeculativeConfig(
                    method="arctic", model=str(model_dir),
                    num_speculative_tokens=3),
                sync=True)
            cfg.cache.enable_prefix_caching = False
            return cfg

        llm = LLM(spec_cfg(seed_dir))
        prompts = _prompts(seed=5)
        hidden, tok0, targets, mask = capture_pairs(
            llm, prompts, gen_len=GEN, n_predict=3)
        assert hidden.shape[0] >= len(prompts) * (GEN - 2)
        params, arch, acc = distill_mlp(
            llm.engine.runner.params, hidden, tok0, targets, mask,
            n_predict=3, steps=600, lr=3e-3, log_every=0)
        out = tmp_path / "drafter"
        save_distilled(out, params, arch)

        llm2 = LLM(spec_cfg(out))
        got = llm2.generate(
            prompt_token_ids=prompts,
            sampling_params=SamplingParams(max_tokens=GEN,
                                           ignore_eos=True))
        stats = llm2.engine.spec_stats
        assert stats.num_drafts > 0
        assert stats.acceptance_rate > 0.8, stats.acceptance_rate
        assert stats.mean_accepted_per_draft > 1.5, \
            stats.mean_accepted_per_draft
        assert all(len(g.token_ids) == GEN for g in got)

    def test_sync_path_matches_too(self, distilled):
        out, prompts, want, _ = distilled
        spec = SpeculativeConfig(method="arctic", model=str(out),
                                 num_speculative_tokens=3,
                                 enable_fused_decode=False)
        llm = LLM(_config(speculative=spec))
        got = llm.generate(prompt_token_ids=prompts,
                           sampling_params=SamplingParams(max_tokens=GEN,
                                                          ignore_eos=True))
        for g, w in zip(got, want):
            assert g.token_ids == w
        assert llm.engine.spec_stats.acceptance_rate > 0.5


class TestLSTMDistill:
    """The sum_lstm drafter kind end-to-end (round-5 item 5): train on
    captured pairs, save/load through the HF-style checkpoint layout,
    and draft through the engine."""

    def test_lstm_save_load_roundtrip_exact(self, tmp_path):
        """save_lstm -> load_lstm_state must be value-exact: safetensors
        writes raw buffers, so transposed views must be materialised
        (the round-5 bug: .T views saved with pre-transpose layout)."""
        import jax.numpy as jnp

        from arcticinference_tpu.models import speculators as sm
        from arcticinference_tpu.spec.distill import (distill_lstm,
                                                      save_lstm)

        rng = np.random.default_rng(0)
        hidden = rng.standard_normal((256, 32)).astype(np.float32)
        tok0 = rng.integers(0, 64, 256).astype(np.int32)
        targets = rng.integers(0, 64, (256, 3)).astype(np.int32)
        mask = np.ones((256, 3), np.float32)
        params, arch, _ = distill_lstm(32, 64, hidden, tok0, targets,
                                       mask, steps=3, log_every=0)
        save_lstm(tmp_path / "d", params, arch)

        import json

        from safetensors import safe_open
        cfg = json.loads((tmp_path / "d" / "config.json").read_text())
        arch2 = sm.LSTMSpecArch.from_hf_config(cfg)
        assert arch2 == arch
        tensors = {}
        with safe_open(str(tmp_path / "d" / "model.safetensors"),
                       framework="numpy") as st:
            for n in st.keys():
                tensors[n] = st.get_tensor(n)
        p2 = sm.load_lstm_state(arch2, tensors, dtype=jnp.float32)
        for k in params:
            np.testing.assert_array_equal(np.asarray(params[k]),
                                          np.asarray(p2[k]), err_msg=k)

    @pytest.mark.slow
    def test_transfer_pipeline_both_kinds(self, tmp_path):
        """Drive benchmarks/transfer_drafter.py (capture -> distill ->
        held-out eval on the trained tiny teacher) for BOTH drafter
        architectures; held-out acceptance must clear the verdict bar
        (>0.3; measured ~0.81 mlp / ~0.89 lstm)."""
        import json
        import subprocess
        import sys
        from pathlib import Path

        repo = Path(__file__).resolve().parent.parent
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        res = subprocess.run(
            [sys.executable, str(repo / "benchmarks/transfer_drafter.py"),
             "--ckpt", str(tmp_path / "teacher"),
             "--drafter-out", str(tmp_path / "drafter"),
             "--steps", "400"],
            capture_output=True, text=True, timeout=1200, cwd=str(repo),
            env=env)
        assert res.returncode == 0, res.stderr[-2000:]
        out = json.loads([ln for ln in res.stdout.splitlines()
                          if ln.startswith("{")][-1])
        assert out["drafter_kind"] == "mlp"
        assert out["transfer_acceptance"] > 0.3
        assert out["lstm"]["transfer_acceptance"] > 0.3
        assert out["lstm"]["drafter_kind"] == "lstm"
