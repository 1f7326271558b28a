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
    ap.add_argument("--quant", default="fp8",
                    choices=["fp8", "int8", "int4", "none"])
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
                          quantization=(None if args.quant == "none"
                                        else args.quant)
                          if on_tpu else None,
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
    import re

    xs = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb")))
    if not xs:
        print("no xplane found")
        return
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                          "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    space.ParseFromString(open(xs[-1], "rb").read())
    for p in space.planes:
        if p.name != "/device:TPU:0":
            continue
        for line in p.lines:
            if line.name != "XLA Ops":
                continue
            total, cnt, cat = {}, {}, {}
            for ev in line.events:
                name = p.event_metadata[ev.metadata_id].name
                op = name.split(" = ")[0].lstrip("%")
                base = re.sub(r"[.\d]+$", "", op)
                total[base] = total.get(base, 0) + ev.duration_ps
                cnt[base] = cnt.get(base, 0) + 1
            tot = sum(total.values())
            print(f"total XLA-op time {tot / 1e9 / steps:.3f} ms/step")
            attn = sum(v for k, v in total.items()
                       if "decode_call" in k or "attention" in k
                       or "ragged" in k)
            print(f"attention kernels: {attn / 1e9 / steps:.3f} ms/step")
            for name, ps in sorted(total.items(),
                                   key=lambda kv: -kv[1])[:12]:
                print(f"{ps / 1e9 / steps:8.3f} ms/step "
                      f"{100 * ps / tot:5.1f}%  x{cnt[name]:6d}  "
                      f"{name[:70]}")
            # Individual-op breakdown (exact HLO names, to be matched
            # against --xla_dump_to output): top 30 by total time.
            itotal, icnt = {}, {}
            for ev in line.events:
                name = p.event_metadata[ev.metadata_id].name
                op = name.split(" = ")[0].lstrip("%")
                itotal[op] = itotal.get(op, 0) + ev.duration_ps
                icnt[op] = icnt.get(op, 0) + 1
            print("--- top individual ops ---")
            for name, ps in sorted(itotal.items(),
                                   key=lambda kv: -kv[1])[:30]:
                print(f"{ps / 1e9 / steps:8.3f} ms/step "
                      f"x{icnt[name] // steps:5d}/step  {name[:70]}")


if __name__ == "__main__":
    main()
