"""Headline benchmark: Llama-3.1-8B FP8 greedy decode tokens/s on one chip.

Runs the full engine (continuous batching, paged KV cache, Pallas ragged
attention, fused FP8 matmuls) with randomly-initialised 8B weights (token
throughput does not depend on weight values; no checkpoint egress in this
environment).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}
vs_baseline compares against the reference's published no-spec greedy
decode rate (76.0 tok/s, ShareGPT table, reference
docs/arctic-speculator.rst:89-94).
"""

import json
import time

import numpy as np

BASELINE_TOKS = 76.0  # reference vLLM v0.8.4 greedy decode (ShareGPT)

LLAMA_8B = dict(
    vocab_size=128256, hidden_size=4096, intermediate_size=14336,
    num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
    head_dim=128, rope_theta=500000.0, max_position_embeddings=131072,
)


def main():
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/arctic_tpu_jax_cache")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                            ModelConfig, SchedulerConfig)
    from arcticinference_tpu.engine.llm import LLM
    from arcticinference_tpu.engine.request import SamplingParams

    on_tpu = jax.default_backend() == "tpu"
    overrides = dict(LLAMA_8B)
    if not on_tpu:  # tiny CPU smoke config so bench.py always runs
        overrides.update(hidden_size=256, intermediate_size=512,
                         num_hidden_layers=2, num_attention_heads=8,
                         num_key_value_heads=8, head_dim=32,
                         vocab_size=1024)

    # Sweep knobs for perf exploration (defaults are the recorded config).
    batch = int(os.environ.get("ARCTIC_BENCH_BATCH", 64 if on_tpu else 4))
    prompt_len = int(os.environ.get("ARCTIC_BENCH_PROMPT",
                                    128 if on_tpu else 16))
    gen_len = int(os.environ.get("ARCTIC_BENCH_GEN", 64 if on_tpu else 8))

    cfg = EngineConfig(
        model=ModelConfig(model="llama", hf_overrides=overrides,
                          quantization="fp8" if on_tpu else None,
                          max_model_len=4096 if on_tpu else 256),
        cache=CacheConfig(block_size=32,
                          num_blocks=900 if on_tpu else 64),
        scheduler=SchedulerConfig(max_num_seqs=batch,
                                  max_num_batched_tokens=2048
                                  if on_tpu else 64),
    )
    llm = LLM(cfg)

    rng = np.random.default_rng(0)

    def make_prompts(seed):
        r = np.random.default_rng(seed)
        return [[int(x) for x in
                 r.integers(1, overrides["vocab_size"] - 1, prompt_len)]
                for _ in range(batch)]

    sp = SamplingParams(max_tokens=gen_len, ignore_eos=True)

    # Warmup covers the same shape buckets as the measured run (prefill
    # bucket + decode bucket) so compile time stays out of the timing.
    # The measured pass uses FRESH prompts so the default-on prefix
    # cache cannot skip its prefill (keeps the metric comparable).
    llm.generate(prompt_token_ids=make_prompts(0),
                 sampling_params=SamplingParams(max_tokens=2,
                                                ignore_eos=True))
    prompts = make_prompts(1)

    t0 = time.perf_counter()
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp)
    dt = time.perf_counter() - t0
    gen_tokens = sum(len(o.token_ids) for o in outs)
    toks_per_s = gen_tokens / dt

    if os.environ.get("ARCTIC_BENCH_STEP_TIMES"):
        import sys
        print("step times:", llm.engine.step_times.summary(),
              file=sys.stderr)

    print(json.dumps({
        "metric": "llama8b_fp8_greedy_decode_tokens_per_s_per_chip"
                  if on_tpu else "cpu_smoke_tokens_per_s",
        "value": round(toks_per_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(toks_per_s / BASELINE_TOKS, 3),
    }))


if __name__ == "__main__":
    main()
