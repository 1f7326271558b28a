"""Decoder-family differential tests vs HuggingFace transformers.

Gold models are the HF reference implementations on CPU torch — the same
checkpoints format the loaders consume (reference serves these families
through vLLM's model zoo; our engine owns its registry,
``models/__init__.py``).  Each test builds a tiny random HF model, maps
its state dict through ``load_hf_state``, runs our paged ragged forward,
and compares full-vocab logits at every position.

This pins down convention bugs internal oracles cannot see: RoPE
half-rotation + llama3 frequency scaling, Qwen2 qkv biases, Qwen3
per-head q/k RMSNorm placement (pre-RoPE), Mixtral's softmax-then-top-k
router ordering, GQA head grouping, and the name→pytree mapping itself.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from arcticinference_tpu.models import llama, mixtral, qwen2, qwen3
from arcticinference_tpu.ops.kv_cache import KVCacheSpec, allocate_kv_cache

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

T = 13  # prompt length (odd, not a block multiple)
TINY = dict(vocab_size=97, hidden_size=64, intermediate_size=112,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            tie_word_embeddings=False)


def _hf_logits(model, ids):
    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids[None].astype(np.int64)))
    return out.logits[0].float().numpy()


def _our_logits(mod, arch, params, ids):
    """Single-sequence paged forward over all T prompt rows.

    Blocks start at 1: block 0 is the engine's reserved padding sink for
    -1 slots (ops/kv_cache.py), so the fixture mirrors the engine's
    block-allocation invariant.
    """
    spec = KVCacheSpec(num_layers=arch.num_layers, num_blocks=8,
                       num_kv_heads=arch.num_kv_heads, block_size=4,
                       head_dim=arch.head_dim, dtype=jnp.float32)
    bs = spec.block_size
    n_blocks = -(-len(ids) // bs)
    inputs = dict(
        input_ids=jnp.asarray(ids),
        positions=jnp.arange(len(ids), dtype=jnp.int32),
        req_idx=jnp.zeros(len(ids), jnp.int32),
        slot_mapping=jnp.arange(bs, bs + len(ids), dtype=jnp.int32),
        block_tables=jnp.arange(1, n_blocks + 1, dtype=jnp.int32)[None],
        seq_lens=jnp.asarray([len(ids)], jnp.int32),
    )
    _, h = mod.forward(params, arch, allocate_kv_cache(spec), inputs)
    return np.asarray(mod.compute_logits(params, h))


def _run_family(mod, hf_model, hf_cfg, rtol=2e-4, atol=2e-4,
                check_argmax=False, ids_seed=0):
    hf_model.eval()
    tensors = {k: v.detach().float().numpy()
               for k, v in hf_model.state_dict().items()}
    arch = mod.Arch.from_hf_config(hf_cfg.to_dict())
    params = mod.load_hf_state(arch, tensors, jnp.float32)
    ids = np.random.default_rng(ids_seed).integers(
        1, hf_cfg.vocab_size, T).astype(np.int32)
    got = _our_logits(mod, arch, params, ids)
    want = _hf_logits(hf_model, ids)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
    if check_argmax:
        assert (got.argmax(-1) == want.argmax(-1)).all()


class TestLlama:

    def test_logits_match_hf(self):
        torch.manual_seed(0)
        cfg = transformers.LlamaConfig(**TINY, rope_theta=500000.0)
        _run_family(llama, transformers.LlamaForCausalLM(cfg), cfg)

    def test_llama3_rope_scaling(self):
        """Llama-3.1 frequency-banded RoPE scaling (the flagship model's
        long-context convention) matches HF's implementation."""
        torch.manual_seed(1)
        cfg = transformers.LlamaConfig(
            **TINY, rope_theta=500000.0,
            rope_scaling=dict(rope_type="llama3", factor=8.0,
                              low_freq_factor=1.0, high_freq_factor=4.0,
                              original_max_position_embeddings=32))
        _run_family(llama, transformers.LlamaForCausalLM(cfg), cfg)

    def test_tied_embeddings(self):
        torch.manual_seed(2)
        tiny = dict(TINY, tie_word_embeddings=True)
        cfg = transformers.LlamaConfig(**tiny)
        _run_family(llama, transformers.LlamaForCausalLM(cfg), cfg)


class TestQwen2:

    def test_logits_match_hf(self):
        torch.manual_seed(3)
        cfg = transformers.Qwen2Config(**TINY, rope_theta=1000000.0)
        _run_family(qwen2, transformers.Qwen2ForCausalLM(cfg), cfg)


class TestQwen3:

    def test_logits_match_hf(self):
        """Qwen3: per-head q/k RMSNorm + decoupled head_dim (96 ≠
        hidden/num_heads)."""
        torch.manual_seed(4)
        cfg = transformers.Qwen3Config(**TINY, head_dim=24,
                                       rope_theta=1000000.0)
        _run_family(qwen3, transformers.Qwen3ForCausalLM(cfg), cfg)


class TestMixtral:

    def test_logits_match_hf(self):
        torch.manual_seed(5)
        cfg = transformers.MixtralConfig(
            **TINY, num_local_experts=4, num_experts_per_tok=2,
            rope_theta=1000000.0)
        # Router logits amplify tiny numeric differences through expert
        # selection; looser tolerance but verify top-1 agreement too.
        _run_family(mixtral, transformers.MixtralForCausalLM(cfg), cfg,
                    rtol=5e-4, atol=5e-4, check_argmax=True, ids_seed=6)
