"""Qwen2 (qkv bias) and Qwen3 (qk norm) family tests.

Same guarantees as the Llama suite: engine decode matches the naive
full-context oracle, and every sharded layout (incl. shift mode bias
re-slicing and GQA kv-head replication) matches the single chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcticinference_tpu.config import ParallelConfig
from arcticinference_tpu.engine.llm import LLM
from arcticinference_tpu.engine.request import SamplingParams
from arcticinference_tpu.models import llama, qwen2, qwen3
from arcticinference_tpu.ops.kv_cache import KVCacheSpec, allocate_kv_cache
from arcticinference_tpu.parallel import mesh as mesh_lib
from arcticinference_tpu.parallel.ulysses import make_sharded_forward

from tests.test_engine import naive_greedy, tiny_config


def _arch(mod, **kw):
    base = dict(vocab_size=64, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=8, num_kv_heads=8, head_dim=16)
    base.update(kw)
    return mod.Arch(**base)


def _inputs(T=16):
    return dict(
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


def _kv(arch, dtype=jnp.float32, eff_kv_heads=None):
    return allocate_kv_cache(KVCacheSpec(
        num_layers=arch.num_layers, num_blocks=8,
        num_kv_heads=eff_kv_heads or arch.num_kv_heads, block_size=4,
        head_dim=arch.head_dim, dtype=dtype))


class TestArchFlags:

    def test_qwen2_config_defaults(self):
        a = qwen2.Arch.from_hf_config({"hidden_size": 64,
                                       "num_attention_heads": 8})
        assert a.attention_bias and not a.qk_norm
        assert isinstance(a, qwen2.Qwen2Arch)

    def test_qwen3_config_defaults(self):
        a = qwen3.Arch.from_hf_config({"hidden_size": 64,
                                       "num_attention_heads": 8,
                                       "head_dim": 32})
        assert a.qk_norm and not a.attention_bias
        assert a.head_dim == 32   # explicit head_dim != hidden/heads

    def test_bias_changes_output(self):
        """Same weights, nonzero bias => different hidden states (the
        bias actually feeds the matmuls)."""
        arch_l = _arch(llama)
        arch_q = _arch(qwen2, attention_bias=True)
        params = llama.init_params(arch_l, jax.random.PRNGKey(0),
                                   jnp.float32)
        qparams = {**params, "layers": dict(params["layers"])}
        qparams["layers"]["bq"] = jnp.full((2, 128), 0.1, jnp.float32)
        qparams["layers"]["bk"] = jnp.full((2, 128), -0.1, jnp.float32)
        qparams["layers"]["bv"] = jnp.full((2, 128), 0.05, jnp.float32)
        ins = _inputs()
        _, h0 = llama.forward(params, arch_l, _kv(arch_l), ins)
        _, h1 = qwen2.forward(qparams, arch_q, _kv(arch_q), ins)
        assert not np.allclose(np.asarray(h0), np.asarray(h1))

    def test_qk_norm_changes_output(self):
        arch_l = _arch(llama)
        arch_q = _arch(qwen3, qk_norm=True)
        params = llama.init_params(arch_l, jax.random.PRNGKey(0),
                                   jnp.float32)
        qparams = {**params, "layers": dict(params["layers"])}
        qparams["layers"]["q_norm"] = jnp.full((2, 16), 2.0, jnp.float32)
        qparams["layers"]["k_norm"] = jnp.ones((2, 16), jnp.float32)
        ins = _inputs()
        _, h0 = llama.forward(params, arch_l, _kv(arch_l), ins)
        _, h1 = qwen3.forward(qparams, arch_q, _kv(arch_q), ins)
        assert not np.allclose(np.asarray(h0), np.asarray(h1))


class TestEngineOracle:

    @pytest.mark.parametrize("model", ["qwen2", "qwen3"])
    def test_engine_matches_naive_decode(self, model):
        cfg = tiny_config()   # hardcodes model="llama"; swap the family
        cfg.model.model = model
        llm = LLM(cfg)
        prompt = [3, 14, 15, 9, 2, 6]
        out = llm.generate(prompt_token_ids=[prompt],
                           sampling_params=SamplingParams(max_tokens=8))
        want = naive_greedy(llm, prompt, 8)
        assert out[0].token_ids == want


class TestShardedQwen:

    @pytest.fixture(scope="class")
    def qwen2_setup(self):
        arch = _arch(qwen2, attention_bias=True, num_kv_heads=4)
        params = qwen2.init_params(arch, jax.random.PRNGKey(1),
                                   jnp.float32)
        ins = _inputs()
        kv_ref, h_ref = qwen2.forward(params, arch, _kv(arch), ins)
        return arch, params, ins, kv_ref, h_ref

    @pytest.mark.parametrize("sp,tp", [(2, 2), (4, 2), (2, 4), (1, 4)])
    @pytest.mark.parametrize("mode", ["sp", "shift"])
    def test_qwen2_sharded_matches_single_chip(self, qwen2_setup, sp, tp,
                                               mode):
        # num_kv_heads=4 < sp*tp for the (4,2)/(2,4) layouts => exercises
        # the head-granular BIAS slice under GQA kv replication.
        arch, params, ins, kv_ref, h_ref = qwen2_setup
        cfg = ParallelConfig(tensor_parallel_size=tp,
                             ulysses_sequence_parallel_size=sp)
        mesh = mesh_lib.build_mesh(cfg)
        sharded = mesh_lib.shard_params(params, mesh)
        fn = make_sharded_forward(qwen2, arch, mesh, cfg, mode,
                                  params=sharded)
        # kv replication (kv_heads < sp*tp) stores each head sp*tp/Hkv
        # times — the cache layout then differs from the single chip, so
        # compare hidden states only (engine/runner.py eff_kv_heads).
        eff = max(arch.num_kv_heads, sp * tp)
        kv_out, h = jax.jit(fn)(sharded, _kv(arch, eff_kv_heads=eff), ins)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                                   rtol=2e-4, atol=2e-4)
        if eff == arch.num_kv_heads:
            np.testing.assert_allclose(
                np.asarray(kv_out), np.asarray(kv_ref),
                rtol=2e-4, atol=2e-4)

    def test_qwen3_sharded_matches_single_chip(self):
        arch = _arch(qwen3, qk_norm=True)
        params = qwen3.init_params(arch, jax.random.PRNGKey(2),
                                   jnp.float32)
        ins = _inputs()
        kv_ref, h_ref = qwen3.forward(params, arch, _kv(arch), ins)
        cfg = ParallelConfig(tensor_parallel_size=2,
                             ulysses_sequence_parallel_size=2)
        mesh = mesh_lib.build_mesh(cfg)
        sharded = mesh_lib.shard_params(params, mesh)
        for mode in ("sp", "shift"):
            fn = make_sharded_forward(qwen3, arch, mesh, cfg, mode,
                                      params=sharded)
            kv_out, h = jax.jit(fn)(sharded, _kv(arch), ins)
            np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                                       rtol=2e-4, atol=2e-4)
            np.testing.assert_allclose(
                np.asarray(kv_out), np.asarray(kv_ref),
                rtol=2e-4, atol=2e-4)


class TestLoader:

    def test_load_hf_state_maps_bias_and_norms(self):
        arch = _arch(qwen2, attention_bias=True)
        rng = np.random.default_rng(0)
        d, hq = 64, 128
        tensors = {}
        tensors["model.embed_tokens.weight"] = rng.normal(
            size=(64, d)).astype(np.float32)
        tensors["model.norm.weight"] = np.ones(d, np.float32)
        tensors["lm_head.weight"] = rng.normal(size=(64, d)).astype(
            np.float32)
        for l in range(2):
            p = f"model.layers.{l}."
            for name, shape in [
                    ("self_attn.q_proj.weight", (hq, d)),
                    ("self_attn.k_proj.weight", (hq, d)),
                    ("self_attn.v_proj.weight", (hq, d)),
                    ("self_attn.o_proj.weight", (d, hq)),
                    ("mlp.gate_proj.weight", (128, d)),
                    ("mlp.up_proj.weight", (128, d)),
                    ("mlp.down_proj.weight", (d, 128)),
            ]:
                tensors[p + name] = rng.normal(size=shape).astype(
                    np.float32)
            tensors[p + "input_layernorm.weight"] = np.ones(d, np.float32)
            tensors[p + "post_attention_layernorm.weight"] = np.ones(
                d, np.float32)
            for b in ("q", "k", "v"):
                tensors[p + f"self_attn.{b}_proj.bias"] = rng.normal(
                    size=(hq,)).astype(np.float32)
        params = qwen2.load_hf_state(arch, tensors, jnp.float32)
        assert params["layers"]["bq"].shape == (2, hq)
        np.testing.assert_allclose(
            np.asarray(params["layers"]["bk"][1]),
            tensors["model.layers.1.self_attn.k_proj.bias"], rtol=1e-6)
        # And the forward runs with the loaded tree.
        kv, h = qwen2.forward(params, arch, _kv(arch), _inputs())
        assert h.shape == (16, 64)

    def test_llama_checkpoint_has_no_bias_keys(self):
        arch = _arch(llama)
        params = llama.init_params(arch, jax.random.PRNGKey(0),
                                   jnp.float32)
        assert "bq" not in params["layers"]
