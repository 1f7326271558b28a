"""Batch-128 e2e stall diagnosis (round-4 item 4).

Round-3 left the batch-128 pathology half-diagnosed: the DEVICE step is
fixed (21.9 ms/step) but end-to-end generate showed multi-second random
stalls whose cause ("host/tunnel jitter") was a hypothesis, not a
measurement.  This script runs the REAL e2e generate at batch 128 with
every host-side phase of the engine loop timestamped:

  schedule | prepare | dispatch | drain(np.asarray) | commit/other

and prints (a) a per-step wall histogram, (b) a full phase timeline for
every step slower than --stall-ms, attributing the stall to the phase
that actually consumed the time.

Usage: python benchmarks/stall_timeline.py [--batch 128] [--gen 64]
       [--stall-ms 200]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/arctic_tpu_jax_cache")

import numpy as np

EVENTS: list = []          # (t_start, dur_s, name)


def timed(name, fn):
    @functools.wraps(fn)
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        EVENTS.append((t0, time.perf_counter() - t0, name))
        return out
    return wrap


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--gen", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=1600)
    ap.add_argument("--stall-ms", type=float, default=200.0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    if os.environ.get("ARCTIC_TPU_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from bench import LLAMA_8B, make_prompts
    from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                            ModelConfig, SchedulerConfig)
    from arcticinference_tpu.engine.llm import LLM
    from arcticinference_tpu.engine.request import SamplingParams

    on_tpu = jax.default_backend() == "tpu"
    overrides = dict(LLAMA_8B)
    if not on_tpu:
        overrides.update(hidden_size=256, intermediate_size=512,
                         num_hidden_layers=2, num_attention_heads=8,
                         num_key_value_heads=8, head_dim=32,
                         vocab_size=1024)
    cfg = EngineConfig(
        model=ModelConfig(model="llama", hf_overrides=overrides,
                          quantization="fp8" if on_tpu else None,
                          max_model_len=4096 if on_tpu else 256),
        cache=CacheConfig(block_size=32,
                          num_blocks=args.blocks if on_tpu else 64),
        scheduler=SchedulerConfig(max_num_seqs=args.batch,
                                  max_num_batched_tokens=2048
                                  if on_tpu else 64),
    )
    t0 = time.time()
    llm = LLM(cfg)
    print(f"engine up in {time.time() - t0:.1f}s", flush=True)
    eng = llm.engine
    runner = eng.runner

    # Instrument the host phases of the engine loop.
    eng.scheduler.schedule = timed("schedule", eng.scheduler.schedule)
    runner.prepare_inputs = timed("prepare", runner.prepare_inputs)
    runner.dispatch = timed("dispatch", runner.dispatch)
    real_asarray = np.asarray

    def drain_asarray(x, *a, **k):
        if hasattr(x, "addressable_shards"):  # device array: real drain
            t1 = time.perf_counter()
            out = real_asarray(x, *a, **k)
            EVENTS.append((t1, time.perf_counter() - t1, "drain"))
            return out
        return real_asarray(x, *a, **k)

    import arcticinference_tpu.engine.engine as eng_mod
    eng_mod.np.asarray = drain_asarray

    step_real = eng.step

    def step_wrap():
        t1 = time.perf_counter()
        out = step_real()
        EVENTS.append((t1, time.perf_counter() - t1, "STEP"))
        return out
    eng.step = step_wrap

    vocab = overrides.get("vocab_size", 128256)
    prompts = make_prompts(3, args.batch, args.prompt_len, vocab)
    sp = SamplingParams(max_tokens=4, ignore_eos=True)
    llm.generate(prompt_token_ids=prompts, sampling_params=sp)  # warm
    EVENTS.clear()

    sp = SamplingParams(max_tokens=args.gen, ignore_eos=True)
    t0 = time.perf_counter()
    llm.generate(prompt_token_ids=prompts, sampling_params=sp)
    wall = time.perf_counter() - t0
    toks = args.batch * args.gen
    print(f"e2e: {toks} tokens in {wall:.2f}s = {toks / wall:.0f} tok/s "
          f"aggregate", flush=True)

    steps = [(t, d) for (t, d, n) in EVENTS if n == "STEP"]
    durs = np.array([d for _, d in steps]) * 1e3
    print(f"steps: n={len(durs)} p50={np.percentile(durs, 50):.1f}ms "
          f"p90={np.percentile(durs, 90):.1f}ms "
          f"p99={np.percentile(durs, 99):.1f}ms max={durs.max():.1f}ms")

    stalls = [(t, d) for (t, d) in steps if d * 1e3 >= args.stall_ms]
    print(f"stall steps (>{args.stall_ms:.0f}ms): {len(stalls)}")
    phases = [e for e in EVENTS if e[2] != "STEP"]
    for t, d in stalls[:12]:
        inner = [(p0 - t, pd, nm) for (p0, pd, nm) in phases
                 if t <= p0 < t + d]
        inner.sort()
        acct = {}
        for _, pd, nm in inner:
            acct[nm] = acct.get(nm, 0.0) + pd
        gap = d - sum(acct.values())
        print(f"  stall {d * 1e3:8.1f}ms  " +
              "  ".join(f"{k}={v * 1e3:.1f}ms"
                        for k, v in sorted(acct.items(),
                                           key=lambda kv: -kv[1])) +
              f"  other={gap * 1e3:.1f}ms")
    # Phase totals over the whole run.
    tot = {}
    for _, pd, nm in phases:
        tot[nm] = tot.get(nm, 0.0) + pd
    print("phase totals: " + json.dumps(
        {k: round(v, 3) for k, v in sorted(tot.items(),
                                           key=lambda kv: -kv[1])}))


if __name__ == "__main__":
    main()
