"""Pallas kernel numerics vs jnp references (CPU interpreter mode).

On real TPU the same checks run via benchmarks/check_attention_kernel.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from arcticinference_tpu.ops.attention import (
    ragged_paged_attention_reference)
from arcticinference_tpu.ops.pallas.ragged_attention import (
    build_work_items, ragged_paged_attention_kernel)
from arcticinference_tpu.ops.fp8 import (fp8_dequantize, fp8_quantize)
from arcticinference_tpu.ops.pallas.fp8_matmul import fp8_matmul_kernel


def make_case(qlens, ctx, Hq=4, Hkv=2, D=128, Bs=32, MaxBlk=8, seed=0):
    rng = np.random.default_rng(seed)
    B = len(qlens)
    T = sum(qlens)
    block_tables = np.zeros((B, MaxBlk), np.int32)
    nb = 1
    for r in range(B):
        total = ctx[r] + qlens[r]
        for i in range((total + Bs - 1) // Bs):
            block_tables[r, i] = nb
            nb += 1
    kv_cache = jnp.asarray(
        rng.standard_normal((nb + 1, 2, Bs, Hkv * D)), jnp.float32)
    positions = np.zeros(T, np.int32)
    req_idx = np.full(T, -1, np.int32)
    t = 0
    for r in range(B):
        for i in range(qlens[r]):
            positions[t] = ctx[r] + i
            req_idx[t] = r
            t += 1
    seq_lens = np.array([ctx[r] + qlens[r] for r in range(B)], np.int32)
    q = jnp.asarray(rng.standard_normal((T, Hq, D)), jnp.float32)
    return (q, kv_cache, jnp.asarray(positions), jnp.asarray(req_idx),
            jnp.asarray(block_tables), jnp.asarray(seq_lens)), req_idx


@pytest.mark.parametrize("qlens,ctx", [
    ([10, 1], [0, 37]),
    ([1, 1, 1], [5, 64, 31]),
    ([40, 3], [0, 100]),
])
def test_ragged_attention_kernel_interpret(qlens, ctx):
    inputs, req_np = make_case(qlens, ctx)
    ref = ragged_paged_attention_reference(*inputs)
    with pltpu.force_tpu_interpret_mode():
        out = ragged_paged_attention_kernel(*inputs, qb=8)
    valid = req_np >= 0
    diff = float(jnp.max(jnp.abs((out - ref)[valid])))
    assert diff < 0.02, diff


def test_work_items_cover_all_tokens():
    qlens = np.array([10, 1, 20, 0, 3])
    last = np.array([9, 100, 50, 0, 7])
    n_items = -(-34 // 8) + 5
    (req, qstart, qlen, pages, pos_base, tok_item,
     tok_off) = build_work_items(qlens, last, 8, 32, n_items, 34)
    # Every token maps to an item owning it.
    t = 0
    for r, ql in enumerate(qlens):
        for _ in range(ql):
            it = tok_item[t]
            assert req[it] == r
            # Row tok_off within the window corresponds to this token.
            assert qstart[it] + tok_off[t] == t
            t += 1
    # qstart aligned; real rows within window.
    assert all(s % 8 == 0 for s in qstart)


def test_fp8_quant_dequant_roundtrip():
    w = jnp.asarray(np.random.default_rng(0).standard_normal((4, 64, 32)),
                    jnp.float32)
    q = fp8_quantize(w)
    wd = fp8_dequantize(q, jnp.float32)
    rel = float(jnp.max(jnp.abs(wd - w)) / jnp.max(jnp.abs(w)))
    assert rel < 0.1  # e4m3 has ~2 decimal digits


def test_fp8_matmul_interpret():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
    q = fp8_quantize(w)
    ref = x @ fp8_dequantize(q, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = fp8_matmul_kernel(x.astype(jnp.bfloat16), q.weight, q.scale,
                                out_dtype=jnp.float32)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.05, rel


def test_decode_kernel_interpret_matches_oracle():
    """Experimental decode-shaped kernel vs the dense oracle (CPU
    interpreter).  The engine uses the ragged kernel (measured faster);
    this keeps the alternative honest."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from arcticinference_tpu.ops.attention import (
        ragged_paged_attention_reference)
    from arcticinference_tpu.ops.pallas.ragged_attention import (
        decode_paged_attention_kernel)

    rng = np.random.default_rng(3)
    B, ctx, qlen, Hq, Hkv, D, Bs = 3, 40, 4, 8, 2, 32, 8
    MaxBlk = (ctx + qlen + Bs - 1) // Bs + 1
    bt = np.zeros((B, MaxBlk), np.int32)
    nb = 1
    for r in range(B):
        for i in range((ctx + qlen + Bs - 1) // Bs):
            bt[r, i] = nb
            nb += 1
    kv = jnp.asarray(rng.standard_normal((nb + 1, 2, Bs, Hkv * D)),
                     jnp.float32)
    pos_base = np.full(B, ctx, np.int32)
    sl = np.full(B, ctx + qlen, np.int32)
    q = jnp.asarray(rng.standard_normal((B * qlen, Hq, D)), jnp.float32)
    positions = np.concatenate(
        [np.arange(ctx, ctx + qlen) for _ in range(B)]).astype(np.int32)
    req = np.repeat(np.arange(B), qlen).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        out = decode_paged_attention_kernel(
            q, kv, pos_base, jnp.asarray(bt), jnp.asarray(sl), qlen)
    ref = ragged_paged_attention_reference(
        q, kv, jnp.asarray(positions), jnp.asarray(req),
        jnp.asarray(bt), jnp.asarray(sl))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_grouped_decode_kernel_interpret_matches_oracle():
    """Grouped decode kernel (gsz sequences per program — the engine's
    pure-decode fast path) vs the dense oracle: mixed dead slots,
    contiguous and scattered page tables, fp8 KV with per-layer scales."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from arcticinference_tpu.ops.attention import (
        ragged_paged_attention_reference)
    from arcticinference_tpu.ops.pallas.ragged_attention import (
        grouped_decode_attention_kernel)

    rng = np.random.default_rng(5)
    L, NB, Bs, Hkv, D, Hq = 2, 64, 8, 2, 32, 8
    B = 6
    seq_lens = np.asarray([17, 0, 40, 3, 25, 8], np.int32)
    MaxBlk = 8
    bt = np.zeros((B, MaxBlk), np.int32)
    # seq 0/2: contiguous runs (fast path); others scattered.
    bt[0, :3] = [10, 11, 12]
    bt[2, :5] = [20, 21, 22, 23, 24]
    bt[3, :1] = [40]
    bt[4, :4] = [50, 33, 7, 48]
    bt[5, :1] = [60]
    kv_f32 = rng.standard_normal((L, NB, 2, Bs, Hkv * D)) * 0.5
    kv8 = jnp.asarray(kv_f32, jnp.float32).astype(jnp.float8_e4m3fn)
    kv_scale = jnp.asarray([[1.0, 1.0], [0.5, 2.0]], jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    pos_base = np.maximum(seq_lens - 1, 0).astype(np.int32)
    layer = jnp.asarray(1, jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = grouped_decode_attention_kernel(
            q, kv8, pos_base, jnp.asarray(bt), jnp.asarray(seq_lens),
            qlen=1, gsz=4, kv_scale=kv_scale, layer=layer)
    kv_l = kv8[1]
    ref = ragged_paged_attention_reference(
        q, kv_l, jnp.asarray(pos_base), jnp.arange(B, dtype=jnp.int32),
        jnp.asarray(bt), jnp.asarray(seq_lens), kv_scale=kv_scale[1])
    live = seq_lens > 0
    np.testing.assert_allclose(np.asarray(out)[live],
                               np.asarray(ref)[live],
                               rtol=5e-2, atol=5e-2)


def test_grouped_decode_kernel_qlen_matches_oracle():
    """qlen>1 (the fused speculative-verify shape: K+1 uniform rows per
    sequence) vs the dense oracle, mixed contexts + a dead slot."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from arcticinference_tpu.ops.attention import (
        ragged_paged_attention_reference)
    from arcticinference_tpu.ops.pallas.ragged_attention import (
        grouped_decode_attention_kernel)

    rng = np.random.default_rng(11)
    L, NB, Bs, Hkv, D, Hq, qlen = 2, 64, 8, 2, 32, 8, 3
    B = 4
    n_comp = np.asarray([17, 0, 38, 5], np.int32)   # slot 1 dead
    seq_lens = np.where(n_comp > 0, n_comp + qlen, 0).astype(np.int32)
    MaxBlk = 8
    bt = np.zeros((B, MaxBlk), np.int32)
    nb = 1
    for r in range(B):
        for i in range((int(seq_lens[r]) + Bs - 1) // Bs):
            bt[r, i] = nb
            nb += 1
    kv_f32 = rng.standard_normal((L, NB, 2, Bs, Hkv * D)) * 0.5
    kv = jnp.asarray(kv_f32, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B * qlen, Hq, D)), jnp.float32)
    pos_base = np.maximum(seq_lens - qlen, 0).astype(np.int32)
    layer = jnp.asarray(0, jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = grouped_decode_attention_kernel(
            q, kv, pos_base, jnp.asarray(bt), jnp.asarray(seq_lens),
            qlen=qlen, gsz=2, layer=layer)
    positions = (pos_base[:, None]
                 + np.arange(qlen)[None, :]).reshape(-1).astype(np.int32)
    req = np.repeat(np.arange(B), qlen).astype(np.int32)
    ref = ragged_paged_attention_reference(
        q, kv[0], jnp.asarray(positions), jnp.asarray(req),
        jnp.asarray(bt), jnp.asarray(seq_lens))
    live = np.repeat(seq_lens > 0, qlen)
    np.testing.assert_allclose(np.asarray(out)[live],
                               np.asarray(ref)[live],
                               rtol=2e-2, atol=2e-2)


def test_engine_grouped_decode_matches_ragged():
    """Engine-level parity: the pure-decode grouped path produces the
    same outputs as the work-item ragged kernel (interpret mode)."""
    import os

    os.environ["ARCTIC_TPU_FORCE_PALLAS_INTERPRET"] = "1"
    try:
        from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                                ModelConfig,
                                                SchedulerConfig)
        from arcticinference_tpu.engine.llm import LLM
        from arcticinference_tpu.engine.request import SamplingParams

        tiny = dict(vocab_size=211, hidden_size=128,
                    intermediate_size=256, num_hidden_layers=2,
                    num_attention_heads=8, num_key_value_heads=2,
                    head_dim=16)
        rng = np.random.default_rng(1)
        prompts = [[int(x) for x in rng.integers(1, 200, int(n))]
                   for n in (12, 5, 33, 20)]

        def run(disable):
            os.environ["ARCTIC_TPU_DISABLE_GROUPED_DECODE"] = \
                "1" if disable else "0"
            llm = LLM(EngineConfig(
                model=ModelConfig(model="llama", hf_overrides=dict(tiny),
                                  max_model_len=256, dtype="float32"),
                cache=CacheConfig(block_size=8, num_blocks=64),
                scheduler=SchedulerConfig(max_num_seqs=4,
                                          max_num_batched_tokens=64)))
            outs = llm.generate(
                prompt_token_ids=prompts,
                sampling_params=SamplingParams(max_tokens=16,
                                               ignore_eos=True))
            return [o.token_ids for o in outs]

        assert run(False) == run(True)
    finally:
        os.environ.pop("ARCTIC_TPU_FORCE_PALLAS_INTERPRET", None)
        os.environ.pop("ARCTIC_TPU_DISABLE_GROUPED_DECODE", None)


def test_int4_matmul_kernel_interpret():
    """int4-dequant matmul kernel vs the explicit unpack+dot oracle
    (split-half packing, group-128 scales)."""
    from jax.experimental.pallas import tpu as pltpu

    from arcticinference_tpu.ops.fp8 import int_quantize
    from arcticinference_tpu.ops.pallas.int4_matmul import (
        int4_matmul_kernel, int4_matmul_reference, int4_shapes_ok)

    rng = np.random.default_rng(0)
    K, N = 2048, 256
    assert int4_shapes_ok(K, N)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    q = int_quantize(w, bits=4)
    assert q.weight.shape == (K // 2, N)
    x = jnp.asarray(rng.standard_normal((12, K)), jnp.float32)
    want = np.asarray(int4_matmul_reference(x, q.weight, q.scale),
                      np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(int4_matmul_kernel(x, q.weight, q.scale),
                         np.float32)
    # The kernel applies f32 scales on the accumulator (more precise
    # than the oracle's bf16-rounded dequant); bound relative error.
    rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert rel < 0.02, rel


def _grouped_parity_run(cfg_factory, prompts, max_tokens=12, sp_kw=None):
    """Generate twice (grouped kernel on/off) under Pallas interpret mode
    and return both token lists."""
    import os

    from arcticinference_tpu.engine.llm import LLM
    from arcticinference_tpu.engine.request import SamplingParams

    os.environ["ARCTIC_TPU_FORCE_PALLAS_INTERPRET"] = "1"
    try:
        outs = []
        for disable in (False, True):
            os.environ["ARCTIC_TPU_DISABLE_GROUPED_DECODE"] = \
                "1" if disable else "0"
            llm = LLM(cfg_factory())
            res = llm.generate(
                prompt_token_ids=prompts,
                sampling_params=SamplingParams(max_tokens=max_tokens,
                                               ignore_eos=True,
                                               **(sp_kw or {})))
            outs.append([o.token_ids for o in res])
        return outs
    finally:
        os.environ.pop("ARCTIC_TPU_FORCE_PALLAS_INTERPRET", None)
        os.environ.pop("ARCTIC_TPU_DISABLE_GROUPED_DECODE", None)


def test_engine_grouped_decode_on_tp_mesh():
    """Grouped decode kernel inside the shard_map forward (tp=2 mesh):
    post-dispatch attention sees the full token axis with local heads,
    so the kernel's request-major contract holds per shard."""
    from arcticinference_tpu.config import ParallelConfig
    from tests.test_engine import tiny_config

    hf = dict(num_attention_heads=8, num_key_value_heads=8, head_dim=8)
    rng = np.random.default_rng(3)
    prompts = [[int(x) for x in rng.integers(1, 90, int(n))]
               for n in (9, 17, 4)]

    def cfg():
        return tiny_config(hf=dict(hf)).replace(
            parallel=ParallelConfig(tensor_parallel_size=2))

    on, off = _grouped_parity_run(cfg, prompts)
    assert on == off


def test_engine_grouped_decode_on_sp_shift_mesh():
    """Grouped kernel under sp=2 with shift switching: decode steps run
    the full-TP shift program; the kernel reads the sp-sliced local kv
    heads either way."""
    from arcticinference_tpu.config import ParallelConfig
    from tests.test_engine import tiny_config

    hf = dict(num_attention_heads=8, num_key_value_heads=8, head_dim=8)
    rng = np.random.default_rng(4)
    prompts = [[int(x) for x in rng.integers(1, 90, int(n))]
               for n in (12, 6)]

    def cfg():
        return tiny_config(hf=dict(hf)).replace(
            parallel=ParallelConfig(tensor_parallel_size=2,
                                    ulysses_sequence_parallel_size=2,
                                    enable_shift_parallel=True,
                                    shift_parallel_threshold=4))

    on, off = _grouped_parity_run(cfg, prompts)
    assert on == off


def test_fused_loop_grouped_matches_workitem():
    """The fused speculative step's K+1-row verify rides the grouped
    kernel (qlen=K+1); output must match the non-grouped fused path."""
    from arcticinference_tpu.config import SpeculativeConfig
    from tests.test_engine import tiny_config

    rng = np.random.default_rng(5)
    prompts = [[int(x) for x in rng.integers(1, 90, int(n))]
               for n in (8, 15, 5, 22)]

    def cfg():
        return tiny_config(speculative=SpeculativeConfig(
            method="arctic", num_speculative_tokens=3,
            enable_fused_decode=True))

    on, off = _grouped_parity_run(cfg, prompts)
    assert on == off


def test_swiftkv_grouped_decode_matches():
    """SwiftKV pure-decode steps (both layer halves) through the grouped
    kernel match the work-item path."""
    from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                            ModelConfig, SchedulerConfig)

    def cfg():
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
        )

    rng = np.random.default_rng(6)
    prompts = [[int(x) for x in rng.integers(1, 90, int(n))]
               for n in (10, 7)]

    on, off = _grouped_parity_run(cfg, prompts)
    assert on == off


def test_engine_grouped_decode_under_dp():
    """Sync dp decode steps route to the grouped kernel per shard."""
    from arcticinference_tpu.config import ParallelConfig
    from tests.test_engine import tiny_config

    hf = dict(num_attention_heads=8, num_key_value_heads=8, head_dim=8)
    rng = np.random.default_rng(9)
    prompts = [[int(x) for x in rng.integers(1, 90, int(n))]
               for n in (11, 6, 19)]

    def cfg():
        return tiny_config(hf=dict(hf)).replace(
            parallel=ParallelConfig(data_parallel_size=2,
                                    tensor_parallel_size=2))

    on, off = _grouped_parity_run(cfg, prompts)
    assert on == off


def test_grouped_decode_injection_parity():
    """Opt-in deferred-KV injection: the grouped kernel fed knew/vnew
    operands (cache dtype) must match scatter-then-attend exactly
    (same flash accumulation inputs, one extra merge step)."""
    import os

    from arcticinference_tpu.ops.pallas.ragged_attention import (
        grouped_decode_attention_kernel)
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    for qlen, hkv, group, headpack in ((1, 4, 2, True), (1, 4, 2, False),
                                       (4, 2, 2, True), (4, 1, 4, False)):
        os.environ["ARCTIC_TPU_ATTN_HEADPACK"] = "1" if headpack else "0"
        B, d, bs = 4, 32, 4
        hq = hkv * group
        old = rng.integers(1, 10, B)
        maxp = int(max((o + qlen + bs - 1) // bs for o in old)) + 1
        bt = np.zeros((B, maxp), np.int32)
        nxt = 1
        for i in range(B):
            for j in range((old[i] + qlen + bs - 1) // bs):
                bt[i, j] = nxt
                nxt += 1
        cache = jnp.asarray(rng.normal(size=(2, nxt + 1, 2, bs, hkv * d)),
                            jnp.bfloat16)
        slot = np.full((B * qlen,), -1, np.int64)
        for i in range(B):
            for j in range(qlen):
                s = old[i] + j
                slot[i * qlen + j] = bt[i, s // bs] * bs + s % bs
        q = jnp.asarray(rng.normal(size=(B * qlen, hq, d)), jnp.bfloat16)
        knew = jnp.asarray(rng.normal(size=(B * qlen, hkv * d)),
                           jnp.bfloat16)
        vnew = jnp.asarray(rng.normal(size=(B * qlen, hkv * d)),
                           jnp.bfloat16)
        seq_lens = jnp.asarray(old + qlen, jnp.int32)
        pos_base = jnp.asarray(old, jnp.int32)
        layer = jnp.asarray(1, jnp.int32)
        blk = slot // bs
        off = slot % bs
        cache_ref = cache.at[1, blk, 0, off, :].set(knew) \
                         .at[1, blk, 1, off, :].set(vnew)
        with pltpu.force_tpu_interpret_mode():
            ref = grouped_decode_attention_kernel(
                q, cache_ref, pos_base, jnp.asarray(bt), seq_lens,
                qlen=qlen, layer=layer)
            out = grouped_decode_attention_kernel(
                q, cache, pos_base, jnp.asarray(bt), seq_lens, qlen=qlen,
                layer=layer, knew=knew, vnew=vnew,
                slot_mapping=jnp.asarray(slot))
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=0.05, rtol=0.05)
