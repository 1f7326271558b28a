"""Quantization quality gate: fp8 / int8 / int4 / fp8-KV vs bf16.

BASELINE.md requires "FP8 perplexity within the reference Δ"; the
reference ships pre-quantized FP8 checkpoints whose quality is validated
by its lm_eval benchmark matrix.  Here the gate is direct: held-out
perplexity (through the full engine: loader -> quantizer -> paged
forward -> scoring path) and logit KL (module level) of each precision
against the bf16 baseline on a genuinely trained tiny model.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                        ModelConfig, SchedulerConfig)
from arcticinference_tpu.engine.llm import LLM

pytest.importorskip("torch")
pytest.importorskip("transformers")


def _ppl(ckpt_dir, heldout, quant, kv="auto"):
    cfg = EngineConfig(
        model=ModelConfig(model=ckpt_dir, quantization=quant,
                          max_model_len=2048),
        cache=CacheConfig(block_size=16, num_blocks=256,
                          kv_cache_dtype=kv),
        scheduler=SchedulerConfig(max_num_seqs=8,
                                  max_num_batched_tokens=512))
    llm = LLM(cfg)
    seqs = [heldout[i:i + 256].tolist()
            for i in range(0, len(heldout) - 256, 256)][:6]
    lps = llm.score(seqs)
    return float(np.exp(-np.concatenate(lps).mean()))


@pytest.fixture(scope="module")
def ppls(trained_checkpoint):
    d, heldout = trained_checkpoint
    return {
        "bf16": _ppl(d, heldout, None),
        "fp8": _ppl(d, heldout, "fp8"),
        "int8": _ppl(d, heldout, "int8"),
        "int4": _ppl(d, heldout, "int4"),
        "fp8_kv": _ppl(d, heldout, "fp8", kv="fp8"),
    }


class TestPerplexityGate:

    def test_model_learned(self, ppls):
        # Uniform over the 256-byte vocab is 256; the corpus entropy is
        # ~1.5/byte.  A broken load/score path scores way above this.
        assert ppls["bf16"] < 2.5, ppls

    def test_fp8_delta(self, ppls):
        assert ppls["fp8"] / ppls["bf16"] < 1.02, ppls

    def test_int8_delta(self, ppls):
        assert ppls["int8"] / ppls["bf16"] < 1.02, ppls

    def test_int4_delta(self, ppls):
        assert ppls["int4"] / ppls["bf16"] < 1.06, ppls

    def test_fp8_kv_cache_delta(self, ppls):
        assert ppls["fp8_kv"] / ppls["bf16"] < 1.03, ppls


class TestLogitKL:

    @pytest.fixture(scope="class")
    def logits_by_mode(self, trained_checkpoint):
        from arcticinference_tpu.models import llama
        from arcticinference_tpu.models.loader import load_model
        from arcticinference_tpu.ops.kv_cache import (KVCacheSpec,
                                                      allocate_kv_cache)

        d, heldout = trained_checkpoint
        ids = np.asarray(heldout[:256], np.int32)

        def forward(quant):
            module, arch, params = load_model(
                ModelConfig(model=d, quantization=quant,
                            max_model_len=2048))
            spec = KVCacheSpec(
                num_layers=arch.num_layers, num_blocks=32,
                num_kv_heads=arch.num_kv_heads, block_size=16,
                head_dim=arch.head_dim, dtype=jnp.bfloat16)
            n_blocks = -(-len(ids) // 16)
            inputs = dict(
                input_ids=jnp.asarray(ids),
                positions=jnp.arange(len(ids), dtype=jnp.int32),
                req_idx=jnp.zeros(len(ids), jnp.int32),
                slot_mapping=jnp.arange(len(ids), dtype=jnp.int32),
                block_tables=jnp.arange(n_blocks, dtype=jnp.int32)[None],
                seq_lens=jnp.asarray([len(ids)], jnp.int32))
            _, h = module.forward(params, arch,
                                  allocate_kv_cache(spec), inputs)
            return np.asarray(module.compute_logits(params, h),
                              np.float64)

        return {q: forward(q) for q in (None, "fp8", "int8", "int4")}

    @staticmethod
    def _kl(p_logits, q_logits):
        def logsoft(x):
            m = x.max(-1, keepdims=True)
            return x - m - np.log(np.exp(x - m).sum(-1, keepdims=True))

        lp, lq = logsoft(p_logits), logsoft(q_logits)
        return float((np.exp(lp) * (lp - lq)).sum(-1).mean())

    def test_kl_bounds(self, logits_by_mode):
        base = logits_by_mode[None]
        kl = {q: self._kl(base, logits_by_mode[q])
              for q in ("fp8", "int8", "int4")}
        assert kl["fp8"] < 0.05, kl
        assert kl["int8"] < 0.05, kl
        assert kl["int4"] < 0.20, kl
