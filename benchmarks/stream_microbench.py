"""Microbenchmarks for the decode weight stream (round-4 item 1).

Methodology (axon tunnel): ``block_until_ready`` is a no-op, per-call
round trips cost ~28 ms, and identical executions are deduped — so a
variant is timed as ONE executable running the 32-layer matmul chain R
times (distinct per-layer weights defeat hoisting; the carried x
defeats CSE), fenced by a host fetch, and reported as the SLOPE
(time(R2) - time(R1)) / ((R2 - R1) * L): per-matmul device time free
of constant tunnel overhead.

Run: python benchmarks/stream_microbench.py [labels...]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 32


def fetch(x):
    return np.asarray(jax.device_get(x))


def timed(fn, *args, iters=3):
    out = fn(*args)
    fetch(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best


def slope(body, x, ws, r1=1, r2=3):
    def make(r):
        @jax.jit
        def run(x, ws):
            for rep in range(r):
                for l in range(L):
                    w = jax.tree.map(lambda a: a[l], ws)
                    y = body(x, w)
                    bump = (jnp.sum(y, dtype=jnp.float32)
                            * jnp.float32(1e-30))
                    x = x + bump.astype(x.dtype)
            return jnp.sum(x, dtype=jnp.float32)
        return run
    t1 = timed(make(r1), x, ws)
    t2 = timed(make(r2), x, ws)
    return (t2 - t1) / ((r2 - r1) * L)


def report(name, per, nbytes):
    print(f"{name}: {per*1e6:7.1f} us/mm  {nbytes/per/1e9:7.1f} GB/s")


# ---------------------------------------------------------------------------

def xla_body(x, w):
    if isinstance(w, tuple):  # (values, scale)
        w = w[0]
    return jnp.dot(x, w.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def xla_body_scaled(x, w):
    wv, s = w
    y = jnp.dot(x, wv.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    return (y * s).astype(jnp.bfloat16)


def xla_body_f16trick(x, w):
    """e4m3 bytes (stored int8) -> f16 via shift-and-scale, XLA-fused.

    f16 = bitcast((sign<<15) | (mag<<7)) * 2^8 is EXACT for e4m3
    normals AND subnormals (the f16 denormal path scales linearly)."""
    u = jax.lax.bitcast_convert_type(w, jnp.uint8).astype(jnp.uint16)
    h = jax.lax.bitcast_convert_type(
        ((u & 0x80) << 8) | ((u & 0x7F) << 7), jnp.float16)
    wt = (h.astype(jnp.float32) * 256.0).astype(jnp.bfloat16)
    return jnp.dot(x, wt,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def _mm_kernel_f16trick(x_ref, w_ref, o_ref, acc_ref, *, n_k):
    """Pallas version of the f16 shift-and-scale e4m3 dequant."""
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
    u = pltpu.bitcast(w_ref[...], jnp.uint8).astype(jnp.uint16)
    h = pltpu.bitcast(((u & 0x80) << 8) | ((u & 0x7F) << 7), jnp.float16)
    wt = (h.astype(jnp.float32) * 256.0).astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], wt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _mm_kernel_astype(x_ref, w_ref, o_ref, acc_ref, *, n_k):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
    wt = w_ref[...].astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], wt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _mm_kernel_bittrick_i32(x_ref, w_ref, o_ref, acc_ref, *, n_k):
    """e4m3 bytes (stored int8) -> f32 via integer bit surgery in i32:
    bits = sign<<31 | ((eemm)<<20 + 120<<23); bitcast f32; bf16 for MXU.
    Subnormals (eeee==0) handled by a select: value = mmm * 2^-9."""
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
    u = w_ref[...].astype(jnp.int32) & 0xFF
    mag = u & 0x7F
    sign = (u & 0x80) << 24
    normal = pltpu.bitcast(sign | ((mag << 20) + (120 << 23)), jnp.float32)
    sub = jnp.where(u >= 0x80, -1.0, 1.0) * (mag.astype(jnp.float32)
                                             * jnp.float32(2.0 ** -9))
    wt = jnp.where(mag < 8, sub, normal).astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], wt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def make_pallas_body(kernel, m, k, n, bk, bn, vmem_mb=None):
    n_k = k // bk
    grid = (n // bn, n_k)
    params = {}
    if vmem_mb:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 2 ** 20)

    def call(x, w):
        if isinstance(w, tuple):
            w = w[0]
        return pl.pallas_call(
            functools.partial(kernel, n_k=n_k),
            grid=grid,
            in_specs=[
                pl.BlockSpec((m, bk), lambda j, kk: (0, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda j, kk: (kk, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda j, kk: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * m * n * k,
                bytes_accessed=k * n * w.dtype.itemsize + m * k * 2
                + m * n * 2,
                transcendentals=0),
            **params,
        )(x, w)
    return call


def gen_ws(key, k, n, dt):
    @jax.jit
    def g(key):
        w = jax.random.normal(key, (L, k, n), jnp.bfloat16) * 0.02
        if dt == "fp8":
            return w.astype(jnp.float8_e4m3fn)
        if dt == "fp8asint8":
            q = w.astype(jnp.float8_e4m3fn)
            return jax.lax.bitcast_convert_type(q, jnp.int8)
        if dt == "int8":
            return jnp.clip(jnp.round(w.astype(jnp.float32) / 0.001),
                            -127, 127).astype(jnp.int8)
        return w
    return g(key)


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    key = jax.random.PRNGKey(0)
    m = 64
    which = set(sys.argv[1:])

    cases = [
        ("gateup", 4096, 14336),
        ("down", 14336, 4096),
        ("qo", 4096, 4096),
        ("gateup-fused", 4096, 28672),   # gate+up as one dot
        ("qkv-fused", 4096, 6144),       # q+k+v as one dot
    ]
    for label, k, n in cases:
        if which and label not in which:
            continue
        x = jax.random.normal(key, (m, k), jnp.bfloat16)
        nbytes = k * n

        for dt in ("fp8", "int8", "bf16"):
            ws = gen_ws(key, k, n, dt)
            nb = nbytes * ws.dtype.itemsize
            per = slope(xla_body, x, ws)
            report(f"[{label} {k}x{n} {dt}] XLA fused dot", per, nb)
            del ws
        # bit-trick pallas kernel on int8-typed e4m3 bytes
        ws = gen_ws(key, k, n, "fp8asint8")
        for bk, bn in ((512, 512), (512, 2048), (1024, 1024)):
            if k % bk or n % bn:
                continue
            body = make_pallas_body(_mm_kernel_bittrick_i32, m, k, n,
                                    bk, bn, vmem_mb=64)
            try:
                per = slope(body, x, ws)
                report(f"[{label} e4m3-bittrick] pallas bk={bk} bn={bn}",
                       per, nbytes)
            except Exception as e:
                print(f"[{label} e4m3-bittrick] bk={bk} bn={bn}: FAIL "
                      f"{str(e)[:90]}")
        del ws
        # int8 astype pallas (best candidate for int8 path)
        ws = gen_ws(key, k, n, "int8")
        for bk, bn in ((512, 512), (512, 2048), (1024, 1024)):
            if k % bk or n % bn:
                continue
            body = make_pallas_body(_mm_kernel_astype, m, k, n, bk, bn,
                                    vmem_mb=64)
            try:
                per = slope(body, x, ws)
                report(f"[{label} int8] pallas astype bk={bk} bn={bn}",
                       per, nbytes)
            except Exception as e:
                print(f"[{label} int8] pallas bk={bk} bn={bn}: FAIL "
                      f"{str(e)[:90]}")
        del ws


def main_fp8():
    """Focused fp8 dequant-variant study (round-4 item 1)."""
    print(f"device: {jax.devices()[0].device_kind} (fp8 variants)")
    key = jax.random.PRNGKey(0)
    m = 64
    cases = [("gateup-fused", 4096, 28672), ("qkv-fused", 4096, 6144),
             ("down", 14336, 4096), ("qo", 4096, 4096)]
    for label, k, n in cases:
        x = jax.random.normal(key, (m, k), jnp.bfloat16)
        nbytes = k * n
        ws8 = gen_ws(key, k, n, "fp8asint8")
        per = slope(xla_body_f16trick, x, ws8)
        report(f"[{label} {k}x{n}] XLA f16trick", per, nbytes)
        wsq = gen_ws(key, k, n, "fp8")
        per = slope(xla_body, x, wsq)
        report(f"[{label} {k}x{n}] XLA builtin convert", per, nbytes)
        for bk, bn in ((512, 1024), (512, 2048), (1024, 1024),
                       (1024, 2048)):
            if k % bk or n % bn:
                continue
            body = make_pallas_body(_mm_kernel_f16trick, m, k, n, bk, bn,
                                    vmem_mb=96)
            try:
                per = slope(body, x, ws8)
                report(f"[{label}] pallas f16trick bk={bk} bn={bn}",
                       per, nbytes)
            except Exception as e:
                print(f"[{label}] pallas f16trick bk={bk} bn={bn}: FAIL "
                      f"{str(e)[:90]}")
            body = make_pallas_body(_mm_kernel_astype, m, k, n, bk, bn,
                                    vmem_mb=96)
            try:
                per = slope(body, x, wsq)
                report(f"[{label}] pallas fp8-astype bk={bk} bn={bn}",
                       per, nbytes)
            except Exception as e:
                print(f"[{label}] pallas fp8-astype bk={bk} bn={bn}: "
                      f"FAIL {str(e)[:90]}")
        del ws8, wsq


if __name__ == "__main__" and "--fp8" in sys.argv:
    main_fp8()
elif __name__ == "__main__" and "--transpose" not in sys.argv:
    main()


def xla_body_T(x, wT):
    """Weight stored transposed [n, k]; contract k = dim 1 of both."""
    if isinstance(wT, tuple):
        wT = wT[0]
    y = jax.lax.dot_general(
        x, wT.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y.astype(jnp.bfloat16)


def main_T():
    print(f"device: {jax.devices()[0].device_kind} (transpose study)")
    key = jax.random.PRNGKey(0)
    m = 64
    cases = [("gateup", 4096, 14336), ("down", 14336, 4096),
             ("qo", 4096, 4096), ("qkv-fused", 4096, 6144),
             ("lmhead", 4096, 128256)]
    for label, k, n in cases:
        x = jax.random.normal(key, (m, k), jnp.bfloat16)
        for dt in ("fp8", "int8"):
            ws = gen_ws(key, k, n, dt)          # [L, k, n]
            nb = k * n * ws.dtype.itemsize
            per = slope(xla_body, x, ws)
            report(f"[{label} {k}x{n} {dt}] XLA [k,n]", per, nb)
            per = slope(xla_body, x, ws)
            report(f"[{label} {k}x{n} {dt}] XLA [k,n] (repeat)", per, nb)
            del ws
            wsT = gen_ws(key, n, k, dt)         # [L, n, k] transposed
            per = slope(xla_body_T, x, wsT)
            report(f"[{label} {k}x{n} {dt}] XLA [n,k]T", per, nb)
            del wsT


if __name__ == "__main__" and "--transpose" in sys.argv:
    main_T()
