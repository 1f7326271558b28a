"""A/B check + microbenchmark: Pallas ragged attention vs jnp reference.

Usage:
  python benchmarks/check_attention_kernel.py            # real TPU
  python benchmarks/check_attention_kernel.py --interpret  # CPU interpreter
"""

import argparse
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--interpret", action="store_true")
parser.add_argument("--bench", action="store_true")
args = parser.parse_args()

import jax

if args.interpret:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from arcticinference_tpu.ops.attention import (
    ragged_paged_attention_reference)
from arcticinference_tpu.ops.pallas.ragged_attention import (
    ragged_paged_attention_kernel)


def make_case(qlens, ctx, Hq=8, Hkv=2, D=128, Bs=32, MaxBlk=16, pad_to=None,
              seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    B = len(qlens)
    T = sum(qlens)
    if pad_to:
        T = max(T, pad_to)
    block_tables = np.zeros((B, MaxBlk), np.int32)
    nb = 1
    for r in range(B):
        total = ctx[r] + qlens[r]
        for i in range((total + Bs - 1) // Bs):
            block_tables[r, i] = nb
            nb += 1
    N = nb + 1
    kv_cache = jnp.asarray(rng.standard_normal((N, 2, Bs, Hkv * D)), dtype)
    positions = np.zeros(T, np.int32)
    req_idx = np.full(T, -1, np.int32)
    t = 0
    for r in range(B):
        for i in range(qlens[r]):
            positions[t] = ctx[r] + i
            req_idx[t] = r
            t += 1
    seq_lens = np.array([ctx[r] + qlens[r] for r in range(B)], np.int32)
    q = jnp.asarray(rng.standard_normal((T, Hq, D)), dtype)
    return (q, kv_cache, jnp.asarray(positions),
            jnp.asarray(req_idx), jnp.asarray(block_tables),
            jnp.asarray(seq_lens)), req_idx


CASES = [
    ("mixed", [40, 1, 20, 1], [0, 37, 30, 5]),
    ("pure-decode", [1] * 8, [5, 37, 64, 100, 3, 17, 250, 31]),
    ("long-prefill", [200], [0]),
    ("chunked", [64, 64], [100, 256]),
]


def check_fp8_kv():
    """fp8 KV cache path vs a dequantized-cache oracle."""
    import jax.numpy as jnp

    inputs, req_np = make_case([40, 1, 20, 1], [0, 37, 30, 5])
    q, kv, positions, req_idx, bt, sl = inputs
    scale = 0.06
    kv_fp8 = (kv.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
    kv_deq = (kv_fp8.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    ref = ragged_paged_attention_reference(q, kv_deq, positions, req_idx,
                                           bt, sl)
    out = ragged_paged_attention_kernel(
        q, kv_fp8, positions, req_idx, bt, sl, qb=8,
        kv_scale=jnp.full((1,), scale, jnp.float32))
    valid = req_np >= 0
    diff = float(jnp.max(jnp.abs((out - ref)[valid].astype(jnp.float32))))
    print(f"fp8-KV vs dequant oracle: max|diff|={diff:.5f}")
    assert diff < 0.03, diff


def main():
    for name, qlens, ctx in CASES:
        inputs, req_np = make_case(qlens, ctx)
        ref = ragged_paged_attention_reference(*inputs)
        for qb in (8, 32):
            t0 = time.time()
            if args.interpret:
                with pltpu.force_tpu_interpret_mode():
                    out = ragged_paged_attention_kernel(*inputs, qb=qb)
            else:
                out = ragged_paged_attention_kernel(*inputs, qb=qb)
            out.block_until_ready()
            valid = req_np >= 0
            diff = float(jnp.max(jnp.abs(
                (out - ref)[valid].astype(jnp.float32))))
            print(f"{name:14s} qb={qb:3d}: {time.time()-t0:5.1f}s "
                  f"max|diff|={diff:.5f}", flush=True)
            assert diff < 0.03, (name, qb, diff)
    if not args.interpret:
        check_fp8_kv()
    print("ALL OK")

    if args.bench and not args.interpret:
        # Decode-shaped microbench: 64 requests, 1 token each, 2k context.
        # Schedule is prebuilt (as the engine does once per step) and the
        # iteration loop is fused into ONE jit with a data dependency so
        # neither host dispatch nor the tunnel RPC pollutes the number.
        from arcticinference_tpu.ops.pallas.ragged_attention import (
            build_work_items)

        qlens = [1] * 64
        ctx = [2048] * 64
        inputs, _ = make_case(qlens, ctx, Hq=32, Hkv=8, MaxBlk=80)
        q, kv_cache, positions, req_idx, block_tables, seq_lens = inputs
        b, t = 64, 64
        qb = 8
        sched = build_work_items(
            np.asarray(qlens, np.int64),
            np.asarray([c for c in seq_lens]) - 1, qb,
            kv_cache.shape[2], -(-t // qb) + b, t)
        # The axon tunnel costs ~30 ms per jit invocation (arg/result
        # transfer), so the loop must be LONG to amortize it — at
        # iters=20 the kernel measures 3x slower than it runs.
        iters = 400

        import functools

        @functools.partial(jax.jit, static_argnames=())
        def many(q, kv_cache):
            def body(i, q):
                o = ragged_paged_attention_kernel(
                    q, kv_cache, positions, req_idx, block_tables,
                    seq_lens, qb=qb, schedule=sched)
                # negligible but DCE/CSE-proof dependency
                return q + o * jnp.float32(1e-12).astype(q.dtype)
            return jax.lax.fori_loop(0, iters, body, q)

        np.asarray(many(q, kv_cache))          # compile + warm
        t0 = time.time()
        np.asarray(many(q, kv_cache))
        dt = (time.time() - t0) / iters
        kv_bytes = 64 * 2048 * 8 * 128 * 2 * 2
        print(f"decode 64x2048ctx: {dt*1e3:.3f} ms/call, "
              f"KV read {kv_bytes/1e6:.0f} MB -> "
              f"{kv_bytes/dt/1e9:.0f} GB/s effective")


main()
