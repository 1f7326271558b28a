"""SwiftKV model tests (CPU, jnp attention path).

Correctness criteria:
1. K == L degenerates to plain Llama (same weights -> same outputs).
2. Self-consistency: chunked prefill + decode must reproduce the
   one-shot prefill hidden states (paged-cache correctness for the
   projected-KV layers).
3. Engine integration: SwiftKV config generates end to end.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                        ModelConfig, SchedulerConfig)
from arcticinference_tpu.engine.llm import LLM
from arcticinference_tpu.engine.request import SamplingParams
from arcticinference_tpu.models import llama, llama_swiftkv as sw
from arcticinference_tpu.ops.kv_cache import KVCacheSpec, allocate_kv_cache
from arcticinference_tpu.ops.pallas.ragged_attention import build_work_items

ARCH = sw.LlamaSwiftKVArch(
    vocab_size=97, hidden_size=64, intermediate_size=128,
    num_layers=4, num_heads=4, num_kv_heads=2, head_dim=16,
    num_key_value_layers=2)


def kv_spec():
    return KVCacheSpec(num_layers=4, num_blocks=16, num_kv_heads=2,
                       block_size=4, head_dim=16, dtype=jnp.float32)


def simple_inputs(prompt, block_table, sample_rows, ctx=0):
    """Single request: feed prompt[ctx:] with context ctx."""
    toks = prompt[ctx:]
    t = len(toks)
    bs = 4
    slots = [block_table[(ctx + i) // bs] * bs + (ctx + i) % bs
             for i in range(t)]
    inputs = dict(
        input_ids=jnp.asarray(toks, jnp.int32),
        positions=jnp.asarray(np.arange(ctx, ctx + t), jnp.int32),
        req_idx=jnp.zeros(t, jnp.int32),
        slot_mapping=jnp.asarray(slots, jnp.int32),
        block_tables=jnp.asarray([block_table], jnp.int32),
        seq_lens=jnp.asarray([ctx + t], jnp.int32),
        logits_indices=jnp.asarray(sample_rows, jnp.int32),
    )
    return inputs


@pytest.fixture(scope="module")
def swift_params():
    return sw.init_params(ARCH, jax.random.PRNGKey(3), jnp.float32)


def test_degenerates_to_llama():
    arch_full = dataclasses.replace(ARCH, num_key_value_layers=4)
    params = sw.init_params(arch_full, jax.random.PRNGKey(0), jnp.float32)
    llama_params = {
        "embed": params["embed"], "final_norm": params["final_norm"],
        "lm_head": params["lm_head"], "layers": params["layers_a"],
    }
    prompt = [5, 6, 7, 8, 9, 10]
    inputs = simple_inputs(prompt, [1, 2, 0, 0], [5])
    kv1, hrows = sw.forward(params, arch_full, allocate_kv_cache(kv_spec()),
                            inputs)
    base_arch = llama.LlamaArch(**{
        f.name: getattr(arch_full, f.name)
        for f in llama.LlamaArch.__dataclass_fields__.values()})
    kv2, h = llama.forward(llama_params, base_arch,
                           allocate_kv_cache(kv_spec()), inputs)
    np.testing.assert_allclose(np.asarray(hrows[0]), np.asarray(h[5]),
                               rtol=1e-5, atol=1e-5)


def test_prefill_equals_decode(swift_params):
    """One-shot prefill == chunked prefill + decode for sampled rows."""
    prompt = [5, 6, 7, 8, 9, 10, 11, 12]
    bt = [1, 2, 3, 0]
    full = simple_inputs(prompt, bt, [7])
    kv_a, rows_a = sw.forward(swift_params, ARCH,
                              allocate_kv_cache(kv_spec()), full)

    # Chunked: first 5 tokens, then 3 more one at a time.
    kv = allocate_kv_cache(kv_spec())
    inp = simple_inputs(prompt[:5], bt, [4])
    kv, rows = sw.forward(swift_params, ARCH, kv, inp)
    for i in range(5, 8):
        inp = simple_inputs(prompt[:i + 1], bt, [0], ctx=i)
        kv, rows = sw.forward(swift_params, ARCH, kv, inp)
    np.testing.assert_allclose(np.asarray(rows[0]), np.asarray(rows_a[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(kv_a),
                               rtol=2e-4, atol=2e-4)


def test_token_drop_only_affects_dropped_rows(swift_params):
    """Sampled-row outputs must be independent of which OTHER rows are
    in the sample set (row gather must not leak)."""
    prompt = [5, 6, 7, 8, 9, 10]
    bt = [1, 2, 0, 0]
    a = simple_inputs(prompt, bt, [5, 5])
    kv_a, rows_a = sw.forward(swift_params, ARCH,
                              allocate_kv_cache(kv_spec()), a)
    b = simple_inputs(prompt, bt, [3, 5])
    kv_b, rows_b = sw.forward(swift_params, ARCH,
                              allocate_kv_cache(kv_spec()), b)
    np.testing.assert_allclose(np.asarray(rows_a[1]), np.asarray(rows_b[1]),
                               rtol=1e-5, atol=1e-5)


def test_engine_end_to_end_swiftkv():
    cfg = EngineConfig(
        model=ModelConfig(
            model="llama_swiftkv",
            hf_overrides=dict(
                vocab_size=97, hidden_size=64, intermediate_size=128,
                num_hidden_layers=4, num_attention_heads=4,
                num_key_value_heads=2, head_dim=16,
                num_key_value_layers=2),
            max_model_len=256, dtype="float32"),
        cache=CacheConfig(block_size=8, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64),
    )
    llm = LLM(cfg)
    rng = np.random.default_rng(0)
    prompts = [[int(x) for x in rng.integers(1, 97, 20)] for _ in range(3)]
    outs = llm.generate(prompt_token_ids=prompts,
                        sampling_params=SamplingParams(max_tokens=8))
    assert all(len(o.token_ids) == 8 for o in outs)

    # Determinism: same prompts again -> same outputs.
    outs2 = llm.generate(prompt_token_ids=prompts,
                         sampling_params=SamplingParams(max_tokens=8))
    for a, b in zip(outs, outs2):
        assert a.token_ids == b.token_ids


def test_hf_state_loading():
    arch = sw.LlamaSwiftKVArch(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_layers=4, num_heads=2, num_kv_heads=1, head_dim=16,
        num_key_value_layers=2)
    rng = np.random.default_rng(0)
    state = {
        "model.embed_tokens.weight": rng.standard_normal((64, 32)),
        "model.norm.weight": np.ones(32),
        "model.norm_swiftkv.weight": np.ones(32),
        "lm_head.weight": rng.standard_normal((64, 32)),
    }
    for l in range(2):
        p = f"model.layers.{l}."
        state[p + "self_attn.q_proj.weight"] = rng.standard_normal((32, 32))
        state[p + "self_attn.k_proj.weight"] = rng.standard_normal((16, 32))
        state[p + "self_attn.v_proj.weight"] = rng.standard_normal((16, 32))
        state[p + "self_attn.o_proj.weight"] = rng.standard_normal((32, 32))
        state[p + "mlp.gate_proj.weight"] = rng.standard_normal((48, 32))
        state[p + "mlp.up_proj.weight"] = rng.standard_normal((48, 32))
        state[p + "mlp.down_proj.weight"] = rng.standard_normal((32, 48))
        state[p + "input_layernorm.weight"] = np.ones(32)
        state[p + "post_attention_layernorm.weight"] = np.ones(32)
    for l in range(2, 4):
        p = f"model.layers.{l}."
        state[p + "self_attn.q_proj_swiftkv.weight"] = \
            rng.standard_normal((32, 32))
        state[p + "self_attn.kv_proj_swiftkv.weight"] = \
            rng.standard_normal((32, 32))
        state[p + "self_attn.o_proj.weight"] = rng.standard_normal((32, 32))
        state[p + "mlp.gate_proj.weight"] = rng.standard_normal((48, 32))
        state[p + "mlp.up_proj.weight"] = rng.standard_normal((48, 32))
        state[p + "mlp.down_proj.weight"] = rng.standard_normal((32, 48))
        state[p + "input_layernorm.weight"] = np.ones(32)
        state[p + "post_attention_layernorm.weight"] = np.ones(32)
    params = sw.load_hf_state(arch, state, jnp.float32)
    assert params["layers_a"]["wq"].shape == (2, 32, 32)
    assert params["layers_b"]["wq"].shape == (2, 32, 32)
    assert params["wk_swift"].shape == (2, 32, 16)
    assert params["wv_swift"].shape == (2, 32, 16)
    assert "wk" not in params["layers_b"]


def test_swiftkv_plus_suffix_combined():
    """The reference's 'all-combined' config: SwiftKV model + suffix
    decoding must stay deterministic and accept drafts."""
    from arcticinference_tpu.config import SpeculativeConfig

    def mk(spec):
        return EngineConfig(
            model=ModelConfig(
                model="llama_swiftkv",
                hf_overrides=dict(
                    vocab_size=97, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=4, num_attention_heads=4,
                    num_key_value_heads=2, head_dim=16,
                    num_key_value_layers=2),
                max_model_len=256, dtype="float32"),
            cache=CacheConfig(block_size=8, num_blocks=64),
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=64),
            speculative=spec,
        )

    base = LLM(mk(None))
    spec = LLM(mk(SpeculativeConfig(method="suffix",
                                    suffix_cache_max_depth=16)))
    prompt = [3, 14, 15, 92, 65, 35]
    want = base.generate(prompt_token_ids=[prompt],
                         sampling_params=SamplingParams(max_tokens=24))
    got = spec.generate(prompt_token_ids=[prompt],
                        sampling_params=SamplingParams(max_tokens=24))
    assert want[0].token_ids == got[0].token_ids
    assert got[0].num_accepted_draft_tokens > 0
