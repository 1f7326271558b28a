"""Diagnose the batch-128 decode pathology (ROADMAP item 1).

Builds the 8B fp8 engine at max_num_seqs=128, then:
  1. tries the unrolled decode step at batch 128 and captures the OOM
     allocation breakdown (if any);
  2. optionally (--no-unroll) compiles the scan path instead;
  3. prints device step time if the step runs.

Usage: python benchmarks/diagnose_b128.py [--batch 128] [--ctx 160]
       [--no-unroll] [--blocks 900]
"""
import argparse
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/arctic_tpu_jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--ctx", type=int, default=160)
    ap.add_argument("--blocks", type=int, default=900)
    ap.add_argument("--no-unroll", action="store_true")
    ap.add_argument("--analyze", action="store_true",
                    help="lower+compile the step and print the XLA "
                         "memory analysis instead of executing")
    args = ap.parse_args()

    if args.no_unroll:
        os.environ["ARCTIC_TPU_NO_UNROLL"] = "1"

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from bench import LLAMA_8B, measure_device_step, step_bytes
    from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                            ModelConfig, SchedulerConfig)
    from arcticinference_tpu.engine.llm import LLM

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
    print(f"engine up in {time.time() - t0:.1f}s "
          f"(unroll={'off' if args.no_unroll else 'on'})", flush=True)

    if args.analyze:
        analyze(llm, args.batch, args.ctx)
        return

    t0 = time.time()
    try:
        step_s = measure_device_step(llm, args.batch, args.ctx, iters=20)
    except Exception:
        print(f"step FAILED after {time.time() - t0:.1f}s:", flush=True)
        tb = traceback.format_exc()
        # The OOM text carries the allocation breakdown — keep the
        # relevant tail.
        print(tb[-8000:])
        return
    sbytes = step_bytes(llm, args.batch, args.ctx)
    print(f"compile+first-runs: {time.time() - t0:.1f}s")
    print(f"device step: {step_s * 1e3:.2f} ms   "
          f"bytes={sbytes / 1e9:.2f} GB   "
          f"achieved={sbytes / step_s / 1e9:.1f} GB/s   "
          f"tok/s={args.batch / step_s:.0f}")


def analyze(llm, batch: int, ctx: int):
    """Lower + compile the decode step WITHOUT executing and print the
    XLA memory analysis (temp/output/argument bytes) — shows whether the
    unrolled program materialises per-layer weight-slice copies."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from arcticinference_tpu.engine.request import Request, SamplingParams
    from arcticinference_tpu.engine.scheduler import (ScheduledRequest,
                                                      SchedulerOutput)

    eng = llm.engine
    runner = eng.runner
    bm = eng.scheduler.block_manager
    rng_np = np.random.default_rng(7)
    sched = SchedulerOutput()
    reqs = []
    t0 = time.time()
    try:
        for i in range(batch):
            ids = [int(x) for x in
                   rng_np.integers(1, runner.arch.vocab_size - 1, ctx)]
            req = Request(req_id=f"an{i}", prompt_token_ids=ids,
                          sampling=SamplingParams(max_tokens=4))
            req.num_computed_tokens = ctx - 1
            bm.grow_to(req.block_ids, ctx)
            reqs.append(req)
            sched.scheduled.append(ScheduledRequest(req, 1, []))
        si = runner.prepare_inputs(sched)
        i32, f32, shapes = runner._pack(si.arrays)
        mode = runner._choose_mode(si.total_tokens)
        fn = runner._get_step_fn(si.attn_qb, False, shapes, mode,
                                 si.t_pad, False)
        rng = jax.random.PRNGKey(0)
        prev = jnp.zeros(2, jnp.int32)
        lowered = fn.lower(runner.params, runner.kv, jnp.asarray(i32),
                           jnp.asarray(f32), runner.kv_scale, rng, prev)
        print(f"lowered in {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        compiled = lowered.compile()
        print(f"compiled in {time.time() - t0:.1f}s", flush=True)
        ma = compiled.memory_analysis()
        print("memory analysis:", ma)
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                print(f"  {k}: {v / 1e9:.3f} GB")
    finally:
        for req in reqs:
            bm.free(req.block_ids)


if __name__ == "__main__":
    main()
