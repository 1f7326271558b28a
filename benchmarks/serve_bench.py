"""Serving benchmark harness.

Mirror of the reference's pytest benchmark harness
(``tests/benchmarks/conftest.py`` + ``benchmark_utils.py:17-97``): a
matrix of engine configs is launched (in-process here — one chip, one
tenant), a synthetic random workload with configurable prompt/output
lengths is replayed at a given concurrency, and throughput / TTFT / TPOT
are reported per config.

Usage:
  python benchmarks/serve_bench.py --configs baseline suffix \
      --num-prompts 64 --input-len 256 --output-len 64
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


LLAMA_8B = dict(
    vocab_size=128256, hidden_size=4096, intermediate_size=14336,
    num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
    head_dim=128, rope_theta=500000.0)

TINY = dict(
    vocab_size=512, hidden_size=256, intermediate_size=512,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
    head_dim=32)


def build_config(name: str, on_tpu: bool, vocab_size=None,
                 no_fused=False, suffix_spec_len=None):
    from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                            ModelConfig, SchedulerConfig,
                                            SpeculativeConfig)

    overrides = dict(LLAMA_8B if on_tpu else TINY)
    if vocab_size:
        overrides["vocab_size"] = vocab_size
    model = "llama"
    spec = None
    swift_blocks = False
    sk = {}
    if suffix_spec_len:
        sk["fused_suffix_spec_len"] = suffix_spec_len
    if name == "suffix":
        spec = SpeculativeConfig(method="suffix", suffix_cache_max_depth=64,
                                 enable_fused_decode=not no_fused, **sk)
        # Fused-loop programs live alongside the sync spec buckets;
        # trade KV capacity for compiled-program + activation headroom.
        swift_blocks = True
    elif name == "spec":
        spec = SpeculativeConfig(method="arctic", num_speculative_tokens=3,
                                 enable_fused_decode=not no_fused)
        swift_blocks = True
    elif name == "swiftkv":
        model = "llama_swiftkv"
        overrides["num_key_value_layers"] = \
            overrides["num_hidden_layers"] // 2
        # The per-layer projected-KV write keeps peak HBM flat: 8B fp8
        # SwiftKV runs the full 800-block cache at 2048-token prefill
        # buckets (900 measured OK on a 16 GB chip).
    elif name == "all":
        # The reference's "all-combined" config (benchmark_utils.py:
        # 17-70): SwiftKV + arctic speculator + suffix decoding, riding
        # the fused decode loop.
        model = "llama_swiftkv"
        overrides["num_key_value_layers"] = \
            overrides["num_hidden_layers"] // 2
        spec = SpeculativeConfig(method="arctic", num_speculative_tokens=3,
                                 enable_suffix_decoding=True,
                                 enable_fused_decode=not no_fused)
        swift_blocks = True
    elif name != "baseline":
        raise ValueError(f"unknown config {name}")
    return EngineConfig(
        model=ModelConfig(model=model, hf_overrides=overrides,
                          quantization="fp8" if on_tpu else None,
                          max_model_len=4096 if on_tpu else 512),
        cache=CacheConfig(block_size=32,
                          num_blocks=(650 if swift_blocks else 800)
                          if on_tpu else 128),
        scheduler=SchedulerConfig(
            max_num_seqs=32 if on_tpu else 8,
            max_num_batched_tokens=2048 if on_tpu else 256),
        speculative=spec,
    )


def run_one(name: str, num_prompts: int, input_len: int, output_len: int,
            on_tpu: bool, vocab_size=None, no_fused=False,
            workload: str = "random", suffix_spec_len=None) -> dict:
    import jax

    from arcticinference_tpu.engine.llm import LLM
    from arcticinference_tpu.engine.request import SamplingParams

    cfg = build_config(name, on_tpu, vocab_size, no_fused,
                       suffix_spec_len=suffix_spec_len)
    llm = LLM(cfg)
    vocab = cfg.model.hf_overrides["vocab_size"]

    def make_prompts(seed):
        r = np.random.default_rng(seed)
        return [[int(x) for x in r.integers(1, vocab - 1, input_len)]
                for _ in range(num_prompts)]

    sp = SamplingParams(max_tokens=output_len, ignore_eos=True)

    eng = llm.engine

    def one_pass(tag, prompts):
        for i, p in enumerate(prompts):
            eng.add_request(f"bench-{name}-{tag}-{i}", p, sp)
        t0 = time.perf_counter()
        first_token_t: dict[str, float] = {}
        finished = []
        while eng.has_unfinished:
            done = eng.step()
            now = time.perf_counter()
            for r in eng.scheduler.running:
                # PENDING placeholders (async path) are not host-visible
                # tokens yet; TTFT counts only synced values.
                if r.req_id not in first_token_t and any(
                        t >= 0 for t in r.output_token_ids[:1]):
                    first_token_t[r.req_id] = now
            for r in done:
                if r.req_id not in first_token_t:
                    first_token_t[r.req_id] = now
                finished.append(r)
        dt = time.perf_counter() - t0
        ttfts = [first_token_t[r.req_id] - t0 for r in finished]
        return dt, ttfts, finished

    # Pass 1 compiles every bucket the workload touches; pass 2 is the
    # steady-state measurement.  workload=random uses FRESH prompts (the
    # default-on prefix cache must not skip the measured prefill);
    # workload=repeat re-sends the warm pass's prompts — the agentic
    # re-query pattern and the reference's suffix-decoding sweet spot
    # (docs/suffix-decoding.rst:65-88: responses repeat text the cache
    # has seen, so the global response tree drafts whole continuations);
    # workload=mixed interleaves both IN ONE BATCH (even slots re-sent =
    # suffix-hot, odd slots fresh = dry) — the realistic serving case a
    # batch-global wide/narrow program choice cannot serve per-slot by
    # construction (round-4 verdict item 3's oracle-loss measurement).
    # Every config runs the same workload, so prefix-cache prefill hits
    # benefit baseline and suffix alike; the suffix win is decode-side.
    one_pass("warm", make_prompts(0))
    if workload in ("repeat", "mixed"):
        # The repeat half hits the prefix cache, which lands in DIFFERENT
        # (small catch-up) shape buckets than the full prefill — warm
        # those too so the measured pass is compile-free.
        one_pass("warm2", make_prompts(0))
    if workload == "mixed":
        # A mixed pass admits the repeat-hot half to the decode
        # frontier FIRST (catch-up prefill is one chunk), so the fused
        # loop enters at the HALF-batch bucket before the fresh half
        # arrives — a program shape the all-hot/all-fresh warm passes
        # never touch.  Warm it with a sacrificial mixed pass whose
        # fresh half (seed 2) differs from the measured fresh half
        # (seed 1), keeping the measured prefills real.
        warm, fresh_w = make_prompts(0), make_prompts(2)
        one_pass("warm3", [warm[i] if i % 2 == 0 else fresh_w[i]
                           for i in range(num_prompts)])
        fresh = make_prompts(1)
        run_prompts = [warm[i] if i % 2 == 0 else fresh[i]
                       for i in range(num_prompts)]
    else:
        run_prompts = make_prompts(0 if workload == "repeat" else 1)
    width_before = (dict(eng._fused.width_stats)
                    if eng._fused is not None else None)
    dt, ttfts, finished = one_pass("run", run_prompts)

    gen_tokens = sum(len(r.output_token_ids) for r in finished)
    tpots = [(dt - ttft) / max(len(r.output_token_ids) - 1, 1)
             for r, ttft in zip(finished, ttfts)]
    out = {
        "config": name,
        "workload": workload,
        "num_prompts": num_prompts,
        "input_len": input_len,
        "output_len": output_len,
        "total_time_s": round(dt, 3),
        "output_tokens_per_s": round(gen_tokens / dt, 2),
        "total_tokens_per_s": round(
            (gen_tokens + num_prompts * input_len) / dt, 2),
        "ttft_p50_ms": round(float(np.percentile(ttfts, 50)) * 1e3, 1),
        "ttft_p99_ms": round(float(np.percentile(ttfts, 99)) * 1e3, 1),
        "tpot_mean_ms": round(float(np.mean(tpots)) * 1e3, 2),
        "spec": eng.spec_stats.summary(),
        "engine_steps": eng.engine_stats.num_steps,
    }
    if eng._fused is not None:
        out["fused_width_steps"] = dict(eng._fused.width_stats)
        out["fused_width_steps_run"] = {
            k: eng._fused.width_stats[k] - width_before[k]
            for k in eng._fused.width_stats}
    import os
    if os.environ.get("ARCTIC_TPU_FUSED_FORCE_WIDTH"):
        out["force_width"] = os.environ["ARCTIC_TPU_FUSED_FORCE_WIDTH"]
    if workload == "mixed":
        # Per-class TPOT: even run slots are repeat-hot, odd are fresh.
        def cls_tpot(parity):
            vals = [t for r, t in zip(finished, tpots)
                    if int(r.req_id.rsplit("-", 1)[1]) % 2 == parity]
            return round(float(np.mean(vals)) * 1e3, 2) if vals else None
        out["tpot_hot_ms"] = cls_tpot(0)
        out["tpot_fresh_ms"] = cls_tpot(1)
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", nargs="+",
                        default=["baseline", "suffix"],
                        choices=["baseline", "suffix", "spec", "swiftkv",
                                 "all"])
    parser.add_argument("--num-prompts", type=int, default=32)
    parser.add_argument("--input-len", type=int, default=128)
    parser.add_argument("--output-len", type=int, default=64)
    parser.add_argument("--no-fused-decode", action="store_true",
                        help="force the synchronous spec path")
    parser.add_argument("--vocab-size", type=int, default=None,
                        help="override vocab (small vocab => looping "
                             "outputs => demonstrates spec acceptance "
                             "with random weights)")
    parser.add_argument("--workload", default="random",
                        choices=["random", "repeat", "mixed"],
                        help="repeat = re-send the warm pass's prompts "
                             "(agentic re-query; suffix sweet spot); "
                             "mixed = half repeat-hot + half fresh in "
                             "one batch (per-slot width oracle study)")
    parser.add_argument("--suffix-spec-len", type=int, default=None,
                        help="fused_suffix_spec_len override (per-step "
                             "path-consumption cap K for the fused "
                             "suffix loop)")
    parser.add_argument("--force-width", default=None,
                        choices=["wide", "narrow"],
                        help="pin the fused suffix loop's program "
                             "(ARCTIC_TPU_FUSED_FORCE_WIDTH): the "
                             "always-wide / always-narrow endpoints the "
                             "width policy is judged against")
    args = parser.parse_args()

    import os
    if args.force_width:
        os.environ["ARCTIC_TPU_FUSED_FORCE_WIDTH"] = args.force_width
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/arctic_tpu_jax_cache")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    # The axon TPU plugin prepends itself to jax_platforms even when
    # JAX_PLATFORMS=cpu is exported; re-pin explicitly for CPU smoke
    # runs (same as bench.py / subprocess servers).
    if os.environ.get("ARCTIC_TPU_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    elif os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    on_tpu = jax.default_backend() == "tpu"
    if len(args.configs) > 1:
        # One engine per process: HBM is only reliably released at
        # process exit.
        import subprocess
        results = []
        for name in args.configs:
            print(f"== running {name} ==", flush=True)
            cmd = [sys.executable, __file__, "--configs", name,
                   "--num-prompts", str(args.num_prompts),
                   "--input-len", str(args.input_len),
                   "--output-len", str(args.output_len)]
            if args.vocab_size:
                cmd += ["--vocab-size", str(args.vocab_size)]
            if args.no_fused_decode:
                cmd += ["--no-fused-decode"]
            if args.workload != "random":
                cmd += ["--workload", args.workload]
            if args.force_width:
                cmd += ["--force-width", args.force_width]
            if args.suffix_spec_len:
                cmd += ["--suffix-spec-len", str(args.suffix_spec_len)]
            proc = subprocess.run(cmd, capture_output=True, text=True)
            sys.stderr.write(proc.stderr[-2000:])
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    results.append(json.loads(line))
                    print(line, flush=True)
        print("\n=== summary ===")
        for r in results:
            print(f"{r['config']:10s} {r['output_tokens_per_s']:10.1f} "
                  f"tok/s  ttft p50 {r['ttft_p50_ms']:8.1f} ms  "
                  f"tpot {r['tpot_mean_ms']:6.2f} ms")
        return
    name = args.configs[0]
    r = run_one(name, args.num_prompts, args.input_len,
                args.output_len, on_tpu, args.vocab_size,
                no_fused=args.no_fused_decode, workload=args.workload,
                suffix_spec_len=args.suffix_spec_len)
    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
