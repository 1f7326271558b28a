"""Microbenchmark the grouped decode attention kernel on the real chip.

Times N back-to-back kernel calls (one layer) at the bench decode shape
(batch 64, ctx 160 by default) and prints effective KV-read bandwidth.
Variants via env/flags: gsz, G_CHUNK_PAGES (ARCTIC_TPU_ATTN_GCHUNK_PAGES),
head-packed dots (ARCTIC_TPU_ATTN_HEADPACK).
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/arctic_tpu_jax_cache")
# The checked-in tensorboard profile protos predate the installed
# protobuf; pure-Python parsing sidesteps the descriptor version gate.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def _device_per_call(logdir: str, n_calls: int):
    """Mean device-side duration of the attention custom calls in the
    trace, seconds — None when the xplane can't be parsed."""
    import glob
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:
        return None
    xs = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb")))
    if not xs:
        return None
    space = xplane_pb2.XSpace()
    space.ParseFromString(open(xs[-1], "rb").read())
    total_ps = 0
    count = 0
    for p in space.planes:
        if "TPU" not in p.name:
            continue
        for line in p.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = p.event_metadata[ev.metadata_id].name
                if "decode_call" in name or "attention_call" in name \
                        or "ragged" in name:
                    total_ps += ev.duration_ps
                    count += 1
    if count == 0:
        return None
    return total_ps / 1e12 / count


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=160)
    ap.add_argument("--qlen", type=int, default=1)
    ap.add_argument("--gsz", type=int, default=8)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--hq", type=int, default=32)
    ap.add_argument("--hkv", type=int, default=8)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--workitem", action="store_true",
                    help="bench the work-item ragged kernel instead")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from arcticinference_tpu.ops.pallas.ragged_attention import (
        grouped_decode_attention_kernel, ragged_paged_attention_kernel,
        build_work_items)

    B, ctx, ql = args.batch, args.ctx, args.qlen
    L, Bs, Hkv, Hq, D = args.layers, args.bs, args.hkv, args.hq, args.d
    seq = ctx + ql
    blocks_per = -(-seq // Bs)
    NB = B * blocks_per + 8
    rng = np.random.default_rng(0)
    bt = np.zeros((B, max(blocks_per + 1, 4)), np.int32)
    nb = 1
    for r in range(B):
        for i in range(blocks_per):
            bt[r, i] = nb
            nb += 1
    kv = jnp.asarray(
        rng.standard_normal((L, NB, 2, Bs, Hkv * D)) * 0.1,
        jnp.float32).astype(jnp.float8_e4m3fn)
    kv_scale = jnp.ones((L, 2), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B * ql, Hq, D)) * 0.3,
                    jnp.bfloat16)
    seq_lens = jnp.full((B,), seq, jnp.int32)
    pos_base = jnp.full((B,), seq - ql, jnp.int32)
    btj = jnp.asarray(bt)

    if args.workitem:
        qlens = np.full(B, ql, np.int64)
        lastp = np.full(B, seq - 1, np.int64)
        t = B * ql
        n_items = t // 8 + B
        sched = build_work_items(qlens, lastp, 8, Bs, n_items, t)
        sched = tuple(jnp.asarray(x) for x in sched)
        positions = jnp.asarray(
            np.repeat(np.arange(ctx, seq)[None], B, 0).reshape(-1),
            jnp.int32)
        req_idx = jnp.asarray(np.repeat(np.arange(B), ql), jnp.int32)

        def call(layer, q_, kv_, bt_, sl_, pb_):
            return ragged_paged_attention_kernel(
                q_, kv_, positions, req_idx, bt_, sl_, qb=8,
                schedule=sched, kv_scale=kv_scale,
                layer=jnp.asarray(layer, jnp.int32))
    else:
        def call(layer, q_, kv_, bt_, sl_, pb_):
            return grouped_decode_attention_kernel(
                q_, kv_, pb_, bt_, sl_, qlen=ql, gsz=args.gsz,
                kv_scale=kv_scale, layer=jnp.asarray(layer, jnp.int32))

    # One jitted program running the kernel for all L layers (the model
    # step's structure) — separate dispatches would be dominated by the
    # per-execute tunnel overhead on this backend.  Arrays are ARGUMENTS
    # (closed-over big arrays become program constants and blow the
    # remote-compile request size).
    @jax.jit
    def sweep(q_, kv_, bt_, sl_, pb_):
        acc = jnp.zeros((), jnp.float32)
        for l in range(L):
            acc = acc + call(l, q_, kv_, bt_, sl_, pb_)[0, 0, 0]                 .astype(jnp.float32)
        return acc

    args5 = (q, kv, btj, seq_lens, pos_base)
    out = sweep(*args5)
    np.asarray(out)
    reps = max(1, args.iters // L)
    # Wall clock through the axon tunnel carries ~30 ms per-execute
    # RPC latency, so device time comes from a profiler trace: sum the
    # kernel custom-call durations on the TPU plane.
    import glob
    import shutil
    logdir = "/tmp/arctic_attn_mb_trace"
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        for _ in range(reps):
            out = sweep(*args5)
        np.asarray(out)
    dt = _device_per_call(logdir, reps * L)
    if dt is None:
        t0 = time.perf_counter()
        for _ in range(reps):
            out = sweep(*args5)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / (reps * L)
        print("(wall-clock fallback — includes dispatch overhead)")
    kv_bytes = B * seq * 2 * Hkv * D  # fp8: 1 byte
    print(f"variant={'workitem' if args.workitem else 'grouped'} "
          f"gsz={args.gsz} ck_pages={os.environ.get('ARCTIC_TPU_ATTN_GCHUNK_PAGES', '16')} "
          f"headpack={os.environ.get('ARCTIC_TPU_ATTN_HEADPACK', '0')} "
          f"b={B} ctx={ctx} qlen={ql}")
    print(f"per-call: {dt * 1e6:.1f} us   "
          f"kv={kv_bytes / 1e6:.1f} MB   "
          f"eff-bw={kv_bytes / dt / 1e9:.1f} GB/s")


if __name__ == "__main__":
    main()
