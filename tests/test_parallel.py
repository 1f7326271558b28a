"""Sharded-forward correctness on the virtual 8-device CPU mesh.

Both SPMD modes (Ulysses SP and shift/full-TP) must reproduce the
single-chip forward bit-for-bit (up to fp32 reduction reordering), and
their KV cache layouts must agree with each other — the invariance that
makes per-step mode switching legal.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcticinference_tpu.config import ParallelConfig
from arcticinference_tpu.models import llama
from arcticinference_tpu.ops.fp8 import QuantizedLinear
from arcticinference_tpu.ops.kv_cache import KVCacheSpec, allocate_kv_cache
from arcticinference_tpu.parallel import mesh as mesh_lib
from arcticinference_tpu.parallel.ulysses import make_sharded_forward

ARCH = llama.LlamaArch(
    vocab_size=64, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=8, num_kv_heads=8, head_dim=16)


def build_inputs(T=16):
    # Two requests: prefill 11 tokens + prefill 5 tokens (T=16, sp-friendly)
    qlens = [11, 5]
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
    params = llama.init_params(ARCH, jax.random.PRNGKey(1), jnp.float32)
    inputs = build_inputs()
    kv0 = allocate_kv_cache(kv_spec())
    kv_ref, h_ref = llama.forward(params, ARCH, kv0, inputs)
    return params, inputs, kv_ref, h_ref


@pytest.mark.parametrize("dp,sp,tp", [(1, 2, 4), (1, 4, 2), (1, 2, 2),
                                      (2, 2, 2), (1, 1, 8)])
@pytest.mark.parametrize("mode", ["sp", "shift"])
def test_sharded_forward_matches_single_chip(setup, dp, sp, tp, mode):
    params, inputs, kv_ref, h_ref = setup
    cfg = ParallelConfig(tensor_parallel_size=tp,
                         ulysses_sequence_parallel_size=sp,
                         data_parallel_size=dp)
    mesh = mesh_lib.build_mesh(cfg)
    fn = make_sharded_forward(llama, ARCH, mesh, cfg, mode)
    sharded_params = mesh_lib.shard_params(params, mesh)
    kv = allocate_kv_cache(kv_spec())
    kv_out, h = jax.jit(fn)(sharded_params, kv, inputs)
    np.testing.assert_allclose(
        np.asarray(h), np.asarray(h_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(kv_out), np.asarray(kv_ref), rtol=2e-4, atol=2e-4)


def test_sp_and_shift_share_kv_layout(setup):
    """The same global KV array must be produced by both modes, so a step
    in one mode can read pages written by the other."""
    params, inputs, kv_ref, _ = setup
    cfg = ParallelConfig(tensor_parallel_size=2,
                         ulysses_sequence_parallel_size=2)
    mesh = mesh_lib.build_mesh(cfg)
    sharded_params = mesh_lib.shard_params(params, mesh)
    kv_a, _ = jax.jit(make_sharded_forward(llama, ARCH, mesh, cfg, "sp"))(
        sharded_params, allocate_kv_cache(kv_spec()), inputs)
    kv_b, _ = jax.jit(make_sharded_forward(llama, ARCH, mesh, cfg,
                                           "shift"))(
        sharded_params, allocate_kv_cache(kv_spec()), inputs)
    np.testing.assert_allclose(np.asarray(kv_a), np.asarray(kv_b),
                               rtol=2e-4, atol=2e-4)


def test_mode_handoff_mid_sequence(setup):
    """Prefill in SP mode, decode the next token in shift mode: the shift
    program must correctly consume SP-written pages (the actual shift-
    parallel serving pattern, reference model_runner.py:236-239)."""
    params, inputs, _, _ = setup
    cfg = ParallelConfig(tensor_parallel_size=2,
                         ulysses_sequence_parallel_size=2)
    mesh = mesh_lib.build_mesh(cfg)
    sp_fn = jax.jit(make_sharded_forward(llama, ARCH, mesh, cfg, "sp"))
    shift_fn = jax.jit(make_sharded_forward(llama, ARCH, mesh, cfg,
                                            "shift"))
    sharded_params = mesh_lib.shard_params(params, mesh)

    kv, _ = sp_fn(sharded_params, allocate_kv_cache(kv_spec()), inputs)

    # Single-chip oracle for the same prefix.
    kv_ref, _ = llama.forward(params, ARCH, allocate_kv_cache(kv_spec()),
                              inputs)

    decode = dict(
        input_ids=jnp.asarray([7, 9, 0, 0], jnp.int32),
        positions=jnp.asarray([11, 5, 0, 0], jnp.int32),
        req_idx=jnp.asarray([0, 1, -1, -1], jnp.int32),
        slot_mapping=jnp.asarray([15, 21, -1, -1], jnp.int32),
        block_tables=jnp.asarray([[1, 2, 3, 0], [4, 5, 6, 0]], jnp.int32),
        seq_lens=jnp.asarray([12, 6], jnp.int32),
    )
    kv2, h2 = shift_fn(sharded_params, kv, decode)
    kv2_ref, h2_ref = llama.forward(params, ARCH, kv_ref, decode)
    np.testing.assert_allclose(np.asarray(h2[:2]), np.asarray(h2_ref[:2]),
                               rtol=2e-4, atol=2e-4)


def test_quantized_sharded_forward():
    params = llama.init_params(ARCH, jax.random.PRNGKey(1), jnp.float32)
    qparams = llama.quantize_params(params)
    inputs = build_inputs()
    _, h_ref = llama.forward(qparams, ARCH,
                             allocate_kv_cache(kv_spec()), inputs)
    cfg = ParallelConfig(tensor_parallel_size=2,
                         ulysses_sequence_parallel_size=2)
    mesh = mesh_lib.build_mesh(cfg)
    sharded = mesh_lib.shard_params(qparams, mesh)
    fn = make_sharded_forward(llama, ARCH, mesh, cfg, "sp", quantized=True,
                              embed_quantized=isinstance(
                                  qparams["embed"], QuantizedLinear))
    _, h = jax.jit(fn)(sharded, allocate_kv_cache(kv_spec()), inputs)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=2e-3, atol=2e-3)
