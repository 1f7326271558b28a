"""Mixtral MoE + expert parallelism correctness (CPU mesh).

Oracles:
- the ragged-dot routed MLP == a per-token/per-expert python loop;
- EP-sharded forward (SP and shift modes) == single-chip forward;
- capacity-compressed EP == dropless when assignments are balanced.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                        ModelConfig, ParallelConfig,
                                        SchedulerConfig)
from arcticinference_tpu.models import mixtral
from arcticinference_tpu.ops.kv_cache import KVCacheSpec, allocate_kv_cache
from arcticinference_tpu.parallel import mesh as mesh_lib
from arcticinference_tpu.parallel.ulysses import (ParallelContext,
                                                  make_sharded_forward)

ARCH = mixtral.MixtralArch(
    vocab_size=64, hidden_size=64, intermediate_size=96,
    num_layers=2, num_heads=8, num_kv_heads=8, head_dim=16,
    num_experts=8, num_experts_per_tok=2)


def make_moe_layer(rng, d, f, e, dtype=jnp.float32):
    keys = jax.random.split(rng, 4)
    s = 0.2
    return {
        "w_router": jax.random.normal(keys[0], (d, e), dtype) * s,
        "w_gate": jax.random.normal(keys[1], (e, d, f), dtype) * s,
        "w_up": jax.random.normal(keys[2], (e, d, f), dtype) * s,
        "w_down": jax.random.normal(keys[3], (e, f, d), dtype) * s,
    }


def moe_oracle(x, lp, k):
    """Per-token loop: softmax over top-k experts, dense SwiGLU each."""
    x = np.asarray(x, np.float64)
    wr = np.asarray(lp["w_router"], np.float64)
    wg = np.asarray(lp["w_gate"], np.float64)
    wu = np.asarray(lp["w_up"], np.float64)
    wd = np.asarray(lp["w_down"], np.float64)
    out = np.zeros_like(x)
    for t in range(x.shape[0]):
        logits = x[t] @ wr
        top = np.argsort(-logits)[:k]
        w = np.exp(logits[top] - logits[top].max())
        w /= w.sum()
        for wi, e in zip(w, top):
            g = x[t] @ wg[e]
            u = x[t] @ wu[e]
            silu = g / (1 + np.exp(-g))
            out[t] += wi * ((silu * u) @ wd[e])
    return out


def test_moe_mlp_matches_per_token_loop():
    d, f, e, k, t = 32, 48, 8, 2, 13
    rng = jax.random.PRNGKey(0)
    lp = make_moe_layer(rng, d, f, e)
    x = jax.random.normal(jax.random.PRNGKey(1), (t, d), jnp.float32)
    arch = dataclasses.replace(ARCH, hidden_size=d, intermediate_size=f,
                               num_experts=e, num_experts_per_tok=k)
    got = mixtral._moe_mlp(x, lp, arch, None)
    want = moe_oracle(x, lp, k)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_moe_mlp_top1():
    d, f, e, t = 16, 24, 4, 9
    lp = make_moe_layer(jax.random.PRNGKey(2), d, f, e)
    x = jax.random.normal(jax.random.PRNGKey(3), (t, d), jnp.float32)
    arch = dataclasses.replace(ARCH, hidden_size=d, intermediate_size=f,
                               num_experts=e, num_experts_per_tok=1)
    got = mixtral._moe_mlp(x, lp, arch, None)
    want = moe_oracle(x, lp, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


# --------------------------------------------------------------------- #
# Sharded forward == single chip
# --------------------------------------------------------------------- #

def build_inputs(T=16):
    inputs = dict(
        input_ids=jnp.asarray(np.arange(1, T + 1) % 60, jnp.int32),
        positions=jnp.asarray(
            np.concatenate([np.arange(11), np.arange(5)]), jnp.int32),
        req_idx=jnp.asarray([0] * 11 + [1] * 5, jnp.int32),
        slot_mapping=jnp.asarray(
            np.concatenate([np.arange(4, 15), np.arange(16, 21)]),
            jnp.int32),
        block_tables=jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32),
        seq_lens=jnp.asarray([11, 5], jnp.int32),
    )
    return inputs


def kv_spec(num_blocks=8, block_size=4):
    return KVCacheSpec(num_layers=ARCH.num_layers, num_blocks=num_blocks,
                      num_kv_heads=ARCH.num_kv_heads, block_size=block_size,
                      head_dim=ARCH.head_dim, dtype=jnp.float32)


@pytest.fixture(scope="module")
def setup():
    params = mixtral.init_params(ARCH, jax.random.PRNGKey(1), jnp.float32)
    inputs = build_inputs()
    kv0 = allocate_kv_cache(kv_spec())
    kv_ref, h_ref = mixtral.forward(params, ARCH, kv0, inputs)
    return params, inputs, kv_ref, h_ref


@pytest.mark.parametrize("sp,tp", [(1, 4), (2, 2), (2, 4), (1, 8)])
@pytest.mark.parametrize("mode", ["sp", "shift"])
def test_sharded_moe_matches_single_chip(setup, sp, tp, mode):
    params, inputs, kv_ref, h_ref = setup
    cfg = ParallelConfig(tensor_parallel_size=tp,
                         ulysses_sequence_parallel_size=sp)
    mesh = mesh_lib.build_mesh(cfg)
    fn = make_sharded_forward(mixtral, ARCH, mesh, cfg, mode)
    sharded = mesh_lib.shard_params(params, mesh, mixtral.param_specs())
    kv = allocate_kv_cache(kv_spec())
    kv_out, h = jax.jit(fn)(sharded, kv, inputs)
    np.testing.assert_allclose(
        np.asarray(h), np.asarray(h_ref), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(kv_out), np.asarray(kv_ref), rtol=5e-4, atol=5e-4)


def test_ep_capacity_balanced_exact():
    """With a router forcing a perfectly balanced assignment, capacity
    factor 1.0 loses nothing and the compressed EP path is exact."""
    d, f, e, k, t, tp = 32, 48, 8, 2, 16, 4
    lp = make_moe_layer(jax.random.PRNGKey(4), d, f, e)
    # Deterministic balanced routing: token i picks experts i%e, (i+3)%e.
    wr = np.zeros((d, e), np.float32)
    wr[:e, :e] = np.eye(e, dtype=np.float32) * 8.0
    lp = dict(lp, w_router=jnp.asarray(wr))
    x = np.array(
        jax.random.normal(jax.random.PRNGKey(5), (t, d), jnp.float32))
    x[:, :e] *= 0.01
    for i in range(t):
        x[i, i % e] += 2.0
        x[i, (i + 3) % e] += 1.0
    x = jnp.asarray(x)

    arch = dataclasses.replace(ARCH, hidden_size=d, intermediate_size=f,
                               num_experts=e, num_experts_per_tok=k)
    dropless = mixtral._moe_mlp(x, lp, arch, None)

    arch_c = dataclasses.replace(arch, moe_capacity_factor=1.0)
    cfg = ParallelConfig(tensor_parallel_size=tp)
    mesh = mesh_lib.build_mesh(cfg)
    pctx = ParallelContext(cfg, "sp")

    def body(x, wr, wg, wu, wd):
        lp_l = {"w_router": wr, "w_gate": wg, "w_up": wu, "w_down": wd}
        y = mixtral._moe_mlp(x, lp_l, arch_c, pctx)
        return jax.lax.psum(y, "tp")

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P("tp"), P("tp"), P("tp")),
        out_specs=P(), check_vma=False)
    got = fn(x, lp["w_router"], lp["w_gate"], lp["w_up"], lp["w_down"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(dropless),
                               rtol=2e-4, atol=2e-4)


# --------------------------------------------------------------------- #
# HF checkpoint mapping
# --------------------------------------------------------------------- #

def test_load_hf_state_mixtral():
    rng = np.random.default_rng(0)
    d, f, e, lL, v = ARCH.hidden_size, 96, 8, 2, 64
    hq = ARCH.num_heads * ARCH.head_dim
    hkv = ARCH.num_kv_heads * ARCH.head_dim
    tensors = {
        "model.embed_tokens.weight": rng.standard_normal((v, d)).astype(
            np.float32),
        "model.norm.weight": np.ones(d, np.float32),
        "lm_head.weight": rng.standard_normal((v, d)).astype(np.float32),
    }
    for l in range(lL):
        p = f"model.layers.{l}."
        tensors[p + "self_attn.q_proj.weight"] = rng.standard_normal(
            (hq, d)).astype(np.float32)
        tensors[p + "self_attn.k_proj.weight"] = rng.standard_normal(
            (hkv, d)).astype(np.float32)
        tensors[p + "self_attn.v_proj.weight"] = rng.standard_normal(
            (hkv, d)).astype(np.float32)
        tensors[p + "self_attn.o_proj.weight"] = rng.standard_normal(
            (d, hq)).astype(np.float32)
        tensors[p + "input_layernorm.weight"] = np.ones(d, np.float32)
        tensors[p + "post_attention_layernorm.weight"] = np.ones(
            d, np.float32)
        tensors[p + "block_sparse_moe.gate.weight"] = rng.standard_normal(
            (e, d)).astype(np.float32)
        for ei in range(e):
            ep = p + f"block_sparse_moe.experts.{ei}."
            tensors[ep + "w1.weight"] = rng.standard_normal(
                (f, d)).astype(np.float32)
            tensors[ep + "w2.weight"] = rng.standard_normal(
                (d, f)).astype(np.float32)
            tensors[ep + "w3.weight"] = rng.standard_normal(
                (f, d)).astype(np.float32)

    params = mixtral.load_hf_state(ARCH, tensors, jnp.float32)
    layers = params["layers"]
    assert layers["w_gate"].shape == (lL, e, d, f)
    assert layers["w_down"].shape == (lL, e, f, d)
    assert layers["w_router"].shape == (lL, d, e)
    np.testing.assert_array_equal(
        np.asarray(layers["w_gate"][1, 3]),
        tensors["model.layers.1.block_sparse_moe.experts.3.w1.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(layers["w_down"][0, 5]),
        tensors["model.layers.0.block_sparse_moe.experts.5.w2.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(layers["w_router"][1]),
        tensors["model.layers.1.block_sparse_moe.gate.weight"].T)

    missing = dict(tensors)
    missing.pop("model.layers.1.block_sparse_moe.experts.3.w1.weight")
    with pytest.raises(ValueError, match="missing experts"):
        mixtral.load_hf_state(ARCH, missing, jnp.float32)


def test_hf_config_roundtrip():
    arch = mixtral.MixtralArch.from_hf_config({
        "vocab_size": 32000, "hidden_size": 4096,
        "intermediate_size": 14336, "num_hidden_layers": 32,
        "num_attention_heads": 32, "num_key_value_heads": 8,
        "num_local_experts": 8, "num_experts_per_tok": 2,
        "rope_theta": 1e6})
    assert arch.num_experts == 8
    assert arch.num_experts_per_tok == 2
    assert arch.num_kv_heads == 8


# --------------------------------------------------------------------- #
# Engine end to end
# --------------------------------------------------------------------- #

def _moe_engine_cfg(num_layers=2, **parallel_kw):
    hf = dict(vocab_size=97, hidden_size=64, intermediate_size=96,
              num_hidden_layers=num_layers, num_attention_heads=4,
              num_key_value_heads=2, head_dim=16,
              num_local_experts=4, num_experts_per_tok=2)
    return EngineConfig(
        model=ModelConfig(model="mixtral", hf_overrides=hf,
                          max_model_len=128, dtype="float32"),
        cache=CacheConfig(block_size=8, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64),
        parallel=ParallelConfig(**parallel_kw),
    )


def test_engine_generates_with_moe():
    from arcticinference_tpu.engine.llm import LLM
    from arcticinference_tpu.engine.request import SamplingParams

    llm = LLM(_moe_engine_cfg())
    outs = llm.generate(
        prompt_token_ids=[[1, 5, 9, 2], [3, 3, 7]],
        sampling_params=SamplingParams(max_tokens=8, temperature=0.0))
    assert len(outs) == 2
    for o in outs:
        assert len(o.token_ids) == 8


# --------------------------------------------------------------------- #
# MoE × pipeline parallelism (each stage holds its layers' experts)
# --------------------------------------------------------------------- #

MOE_PP_PROMPTS = [[1, 5, 9, 2, 11, 8], [3, 3, 7], [12, 4, 4, 9, 2]]


@pytest.fixture(scope="module")
def moe_single_outputs():
    from arcticinference_tpu.engine.llm import LLM
    from arcticinference_tpu.engine.request import SamplingParams

    llm = LLM(_moe_engine_cfg(num_layers=4))
    return llm.generate(prompt_token_ids=MOE_PP_PROMPTS,
                        sampling_params=SamplingParams(max_tokens=10))


@pytest.mark.parametrize("pp,sp,tp", [(2, 1, 1), (2, 1, 2), (4, 1, 2),
                                      (2, 2, 1), (2, 2, 2)])
def test_engine_moe_pp_matches_single(moe_single_outputs, pp, sp, tp):
    """Mixtral under PP(×SP×TP): stage-local expert stacks + ragged_dot,
    outputs must match single chip exactly."""
    from arcticinference_tpu.engine.llm import LLM
    from arcticinference_tpu.engine.request import SamplingParams

    cfg = _moe_engine_cfg(num_layers=4, pipeline_parallel_size=pp,
                          ulysses_sequence_parallel_size=sp,
                          tensor_parallel_size=tp)
    llm = LLM(cfg)
    runner = llm.engine.runner
    assert runner.mesh.shape["pp"] == pp
    # Stage-sharded expert stacks: local shard holds L/pp layers.
    wg = runner.params["layers"]["w_gate"]
    assert wg.addressable_shards[0].data.shape[0] == wg.shape[0] // pp
    outs = llm.generate(prompt_token_ids=MOE_PP_PROMPTS,
                        sampling_params=SamplingParams(max_tokens=10))
    for o, ref in zip(outs, moe_single_outputs):
        assert o.token_ids == ref.token_ids
    assert {k[3] for k in runner._step_fns} == {"pp"}


def test_engine_moe_fused_spec_matches_no_spec():
    """Mixtral rides the fused spec-decode loop (greedy verification is
    draft-invariant): outputs match the no-spec engine exactly."""
    from arcticinference_tpu.config import SpeculativeConfig
    from arcticinference_tpu.engine.llm import LLM
    from arcticinference_tpu.engine.request import SamplingParams

    import numpy as np
    rng = np.random.default_rng(33)
    base = [int(x) for x in rng.integers(1, 97, 5)]
    prompts = [(base * 4)[:18], [int(x) for x in rng.integers(1, 97, 9)]]
    sp = SamplingParams(max_tokens=14)
    want = LLM(_moe_engine_cfg()).generate(prompt_token_ids=prompts,
                                           sampling_params=sp)
    cfg = _moe_engine_cfg()
    cfg = cfg.replace(speculative=SpeculativeConfig(
        method="suffix", enable_fused_decode=True))
    llm = LLM(cfg)
    assert llm.engine._fused is not None
    got = llm.generate(prompt_token_ids=prompts, sampling_params=sp)
    for w, g in zip(want, got):
        assert g.token_ids == w.token_ids
    assert llm.engine.spec_stats.num_drafts > 0


def test_engine_moe_pp_shift_switches_modes(moe_single_outputs):
    from arcticinference_tpu.engine.llm import LLM
    from arcticinference_tpu.engine.request import SamplingParams

    cfg = _moe_engine_cfg(num_layers=4, pipeline_parallel_size=2,
                          ulysses_sequence_parallel_size=2,
                          tensor_parallel_size=2,
                          enable_shift_parallel=True,
                          shift_parallel_threshold=8)
    llm = LLM(cfg)
    outs = llm.generate(prompt_token_ids=MOE_PP_PROMPTS,
                        sampling_params=SamplingParams(max_tokens=10))
    for o, ref in zip(outs, moe_single_outputs):
        assert o.token_ids == ref.token_ids
    modes = {k[3] for k in llm.engine.runner._step_fns}
    assert "pp_shift" in modes and "pp" in modes
