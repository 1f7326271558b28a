"""Profile the batch-N decode step on the real chip and print an op-level
time breakdown (attention kernel vs weight-streaming fusions vs the rest).

Usage:  python benchmarks/profile_decode.py [--batch 64] [--ctx 160]
Writes an xplane trace under /tmp/arctic_profile and summarises it with
tensorboard_plugin_profile's converter (available in this image).
"""
import argparse
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/arctic_tpu_jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=160)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--logdir", default="/tmp/arctic_profile")
    ap.add_argument("--no-grouped", action="store_true")
    args = ap.parse_args()

    if args.no_grouped:
        os.environ["ARCTIC_TPU_DISABLE_GROUPED_DECODE"] = "1"

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
                          num_blocks=900 if on_tpu else 64),
        scheduler=SchedulerConfig(max_num_seqs=args.batch,
                                  max_num_batched_tokens=2048
                                  if on_tpu else 64),
    )
    t0 = time.time()
    llm = LLM(cfg)
    print(f"engine up in {time.time() - t0:.1f}s", flush=True)

    # Warm + measure plain step time first.
    step_s = measure_device_step(llm, args.batch, args.ctx, iters=30)
    sbytes = step_bytes(llm, args.batch, args.ctx)
    print(f"device step: {step_s * 1e3:.2f} ms  "
          f"bytes={sbytes / 1e9:.2f} GB  "
          f"achieved={sbytes / step_s / 1e9:.1f} GB/s", flush=True)

    # Trace a few steps.
    from arcticinference_tpu.engine.request import Request, SamplingParams
    from arcticinference_tpu.engine.scheduler import (ScheduledRequest,
                                                      SchedulerOutput)
    eng = llm.engine
    runner = eng.runner
    bm = eng.scheduler.block_manager
    rng_np = np.random.default_rng(7)
    sched = SchedulerOutput()
    reqs = []
    for i in range(args.batch):
        ids = [int(x) for x in
               rng_np.integers(1, runner.arch.vocab_size - 1, args.ctx)]
        req = Request(req_id=f"p{i}", prompt_token_ids=ids,
                      sampling=SamplingParams(max_tokens=4))
        req.num_computed_tokens = args.ctx - 1
        bm.grow_to(req.block_ids, args.ctx)
        reqs.append(req)
        sched.scheduled.append(ScheduledRequest(req, 1, []))
    si = runner.prepare_inputs(sched)
    rng = jax.random.PRNGKey(0)
    tokens, _ = runner.dispatch(si, rng)
    np.asarray(tokens)

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            tokens, _ = runner.dispatch(si, rng)
        np.asarray(tokens)
    for req in reqs:
        bm.free(req.block_ids)
    print("trace written", flush=True)

    summarize(args.logdir, args.steps)


def summarize(logdir: str, steps: int):
    xs = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb")))
    if not xs:
        print("no xplane found")
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([xs[-1]], "framework_op_stats", {})
    import json
    try:
        rows = json.loads(data)
    except Exception:
        # gviz csv fallback
        print(data[:2000])
        return
    print(json.dumps(rows, indent=1)[:400])


if __name__ == "__main__":
    main()
