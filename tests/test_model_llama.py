"""Llama functional-model tests on the CPU backend (jnp attention path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcticinference_tpu.models import llama
from arcticinference_tpu.ops.kv_cache import (KVCacheSpec, allocate_kv_cache)


@pytest.fixture(scope="module")
def small():
    arch = llama.LlamaArch(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16)
    params = llama.init_params(arch, jax.random.PRNGKey(0), jnp.float32)
    spec = KVCacheSpec(num_layers=2, num_blocks=8, num_kv_heads=2,
                       block_size=4, head_dim=16, dtype=jnp.float32)
    return arch, params, spec


def _prefill_inputs():
    return dict(
        input_ids=jnp.array([5, 6, 7, 8, 9, 11, 12, 13], jnp.int32),
        positions=jnp.array([0, 1, 2, 3, 4, 0, 1, 2], jnp.int32),
        req_idx=jnp.array([0] * 5 + [1] * 3, jnp.int32),
        slot_mapping=jnp.array([4, 5, 6, 7, 8, 12, 13, 14], jnp.int32),
        block_tables=jnp.array([[1, 2, 0], [3, 0, 0]], jnp.int32),
        seq_lens=jnp.array([5, 3], jnp.int32),
    )


def test_forward_shapes(small):
    arch, params, spec = small
    kv = allocate_kv_cache(spec)
    kv, h = llama.forward(params, arch, kv, _prefill_inputs())
    assert h.shape == (8, 64)
    assert bool(jnp.isfinite(h).all())
    logits = llama.compute_logits(params, h[jnp.array([4, 7])])
    assert logits.shape == (2, 128)
    assert logits.dtype == jnp.float32


def test_prefill_equals_decode(small):
    """Incremental decode must reproduce prefill hidden states exactly."""
    arch, params, spec = small
    kv = allocate_kv_cache(spec)
    inputs = _prefill_inputs()
    kv, h = llama.forward(params, arch, kv, inputs)

    kv2 = allocate_kv_cache(spec)
    outs = []
    for i in range(5):
        inp = dict(
            input_ids=inputs["input_ids"][i:i + 1],
            positions=jnp.array([i], jnp.int32),
            req_idx=jnp.array([0], jnp.int32),
            slot_mapping=jnp.array([4 + i], jnp.int32),
            block_tables=jnp.array([[1, 2, 0]], jnp.int32),
            seq_lens=jnp.array([i + 1], jnp.int32),
        )
        kv2, hh = llama.forward(params, arch, kv2, inp)
        outs.append(hh[0])
    diff = float(jnp.max(jnp.abs(jnp.stack(outs) - h[:5])))
    assert diff < 2e-4, diff


def test_padding_tokens_are_inert(small):
    """Padding rows (req_idx=-1) must not change real rows' outputs."""
    arch, params, spec = small
    inputs = _prefill_inputs()
    kv, h = llama.forward(params, arch, allocate_kv_cache(spec), inputs)

    padded = dict(inputs)
    padded["input_ids"] = jnp.concatenate(
        [inputs["input_ids"], jnp.array([1, 2], jnp.int32)])
    padded["positions"] = jnp.concatenate(
        [inputs["positions"], jnp.array([0, 0], jnp.int32)])
    padded["req_idx"] = jnp.concatenate(
        [inputs["req_idx"], jnp.array([-1, -1], jnp.int32)])
    padded["slot_mapping"] = jnp.concatenate(
        [inputs["slot_mapping"], jnp.array([-1, -1], jnp.int32)])
    kv2, h2 = llama.forward(params, arch, allocate_kv_cache(spec), padded)
    diff = float(jnp.max(jnp.abs(h2[:8] - h)))
    assert diff < 1e-5, diff


def test_fp8_quantized_forward_close(small):
    arch, params, spec = small
    qparams = llama.quantize_params(params)
    inputs = _prefill_inputs()
    _, h = llama.forward(params, arch, allocate_kv_cache(spec), inputs)
    _, hq = llama.forward(qparams, arch, allocate_kv_cache(spec), inputs)
    # fp8 weight quantization error should stay moderate on random weights.
    rel = float(jnp.max(jnp.abs(hq - h)) /
                (float(jnp.max(jnp.abs(h))) + 1e-9))
    assert rel < 0.15, rel


@pytest.mark.parametrize("mode,tol", [("int8", 0.05), ("int4", 0.25)])
def test_int_quantized_forward_close(small, mode, tol):
    """int8 (per-out-channel) and int4 (group-128) weight-only paths run
    the same forward; error bounded on random weights (int8 tighter than
    fp8 per-tensor, int4 looser)."""
    arch, params, spec = small
    qparams = llama.quantize_params(params, mode)
    inputs = _prefill_inputs()
    _, h = llama.forward(params, arch, allocate_kv_cache(spec), inputs)
    _, hq = llama.forward(qparams, arch, allocate_kv_cache(spec), inputs)
    rel = float(jnp.max(jnp.abs(hq - h)) /
                (float(jnp.max(jnp.abs(h))) + 1e-9))
    assert rel < tol, rel


def test_int_quantize_roundtrip_granularity():
    """Scale ranks encode granularity: int8 -> per-out-channel, int4 ->
    group-128; dequant reconstructs within quantization step error."""
    from arcticinference_tpu.ops.fp8 import fp8_dequantize, int_quantize

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((2, 256, 64)), jnp.float32)
    q8 = int_quantize(w, bits=8)
    assert q8.weight.dtype == jnp.int8 and q8.scale.shape == (2, 64)
    err8 = float(jnp.max(jnp.abs(fp8_dequantize(q8, jnp.float32) - w)))
    assert err8 <= float(jnp.max(q8.scale)) * 0.51

    q4 = int_quantize(w, bits=4)
    # Packed two-per-byte along the input dim: int8 [2, 128, 64].
    assert q4.weight.dtype == jnp.int8 and q4.weight.shape == (2, 128, 64)
    assert q4.scale.shape == (2, 2, 64)
    err4 = float(jnp.max(jnp.abs(fp8_dequantize(q4, jnp.float32) - w)))
    assert err4 <= float(jnp.max(q4.scale)) * 0.51

    # matmul agrees with explicit dequant for both granularities.
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    from arcticinference_tpu.ops.fp8 import QuantizedLinear, matmul
    for q in (q8, q4):
        lq = QuantizedLinear(q.weight[0], q.scale[0])
        want = np.asarray(x @ fp8_dequantize(lq, jnp.float32), np.float32)
        got = np.asarray(matmul(x, lq), np.float32)
        # bf16 rounding differs between the fused path and the oracle;
        # bound the error relative to the output magnitude.
        assert np.max(np.abs(got - want)) < 2e-2 * np.max(np.abs(want))


def test_engine_generates_int4():
    """End to end: the engine runs an int4-quantized model."""
    from arcticinference_tpu.engine.llm import LLM
    from arcticinference_tpu.engine.request import SamplingParams
    from tests.test_engine import tiny_config

    cfg = tiny_config(model_kw=dict(quantization="int4"),
                      hf=dict(hidden_size=256, intermediate_size=256))
    llm = LLM(cfg)
    outs = llm.generate(prompt_token_ids=[[1, 5, 9, 2], [3, 3, 7]],
                        sampling_params=SamplingParams(max_tokens=8))
    for o in outs:
        assert len(o.token_ids) == 8


def test_hf_config_parse():
    arch = llama.LlamaArch.from_hf_config({
        "vocab_size": 1000, "hidden_size": 256,
        "num_attention_heads": 8, "num_key_value_heads": 2,
        "num_hidden_layers": 3, "rope_scaling": {
            "type": "llama3", "factor": 8.0,
            "original_max_position_embeddings": 8192},
    })
    assert arch.head_dim == 32
    assert arch.rope_scaling["rope_type"] == "llama3"


def test_hf_state_loading():
    arch = llama.LlamaArch(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_layers=2, num_heads=2, num_kv_heads=1, head_dim=16)
    rng = np.random.default_rng(0)
    state = {
        "model.embed_tokens.weight": rng.standard_normal((64, 32)),
        "model.norm.weight": np.ones(32),
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
    params = llama.load_hf_state(arch, state, jnp.float32)
    assert params["layers"]["wq"].shape == (2, 32, 32)
    assert params["layers"]["wk"].shape == (2, 32, 16)
    assert params["lm_head"].shape == (32, 64)
    # Transposition check: wq[l] == q_proj.T
    np.testing.assert_allclose(
        np.asarray(params["layers"]["wq"][0]),
        state["model.layers.0.self_attn.q_proj.weight"].T, rtol=1e-5)


@pytest.mark.parametrize("quant", [None, "fp8", "int8", "int4"])
def test_fused_weights_exact_parity(quant):
    """fuse_params (wqkv / w_gateup one-dot layout) must be value-exact
    vs the unfused layout for every quantization mode: per-segment
    scales are broadcast per-out-channel, not re-derived."""
    arch = llama.LlamaArch(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16)
    params = llama.init_params(arch, jax.random.PRNGKey(1), jnp.float32,
                               quantization=quant)
    fused = jax.jit(llama.fuse_params)(params)
    assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
    assert "w_gateup" in fused["layers"]
    spec = KVCacheSpec(num_layers=2, num_blocks=8, num_kv_heads=2,
                       block_size=4, head_dim=16, dtype=jnp.float32)
    inputs = _prefill_inputs()

    def run(p):
        kv = allocate_kv_cache(spec)
        kv, h = llama.forward(p, arch, kv, inputs)
        return llama.compute_logits(p, h)

    a = jax.jit(run)(params)
    b = jax.jit(run)(fused)
    tol = 1e-5 if quant is None else 0.0
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol)


def test_fused_weights_qwen2_bias_parity():
    """Qwen2-style attention biases fuse into bqkv with exact parity."""
    arch = llama.LlamaArch(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        attention_bias=True)
    params = llama.init_params(arch, jax.random.PRNGKey(2), jnp.float32)
    fused = jax.jit(llama.fuse_params)(params)
    assert "bqkv" in fused["layers"] and "bq" not in fused["layers"]
    spec = KVCacheSpec(num_layers=2, num_blocks=8, num_kv_heads=2,
                       block_size=4, head_dim=16, dtype=jnp.float32)
    inputs = _prefill_inputs()

    def run(p):
        kv = allocate_kv_cache(spec)
        kv, h = llama.forward(p, arch, kv, inputs)
        return llama.compute_logits(p, h)

    np.testing.assert_allclose(np.asarray(jax.jit(run)(params)),
                               np.asarray(jax.jit(run)(fused)), atol=1e-5)
