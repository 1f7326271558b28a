"""Distill an Arctic MLP drafter against the 8B target, on-chip.

Reproduces the reference's drafter-production pipeline in-environment
(reference drafters are distilled offline and shipped as checkpoints,
``docs/arctic-speculator.rst``): capture (hidden, next-K token) pairs from
the running engine on a fixed prompt distribution, train the tied-table
MLP speculator with optax, and save a ``distilled_tied`` checkpoint that
``bench.py`` (spec phase) and the engine load via ``--speculative-config``.

With random target weights the map hidden -> next tokens has no linguistic
structure to generalise from, so the drafter's acceptance is meaningful on
the training prompt distribution (the greedy map is deterministic, so
replayed prompts measure the true speculative speedup of the machinery);
bench.py reports the measured acceptance alongside the speedup.

Usage:  python benchmarks/distill_drafter.py --out checkpoints/drafter-llama8b-fp8
"""

import argparse
import gc
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

LLAMA_8B = dict(
    vocab_size=128256, hidden_size=4096, intermediate_size=14336,
    num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
    head_dim=128, rope_theta=500000.0, max_position_embeddings=131072,
)

TINY = dict(
    vocab_size=1024, hidden_size=256, intermediate_size=512,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
    head_dim=32)


def make_prompts(seed: int, batch: int, prompt_len: int, vocab: int):
    """The canonical bench prompt set — bench.py builds the same one."""
    r = np.random.default_rng(seed)
    return [[int(x) for x in r.integers(1, vocab - 1, prompt_len)]
            for _ in range(batch)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="checkpoints/drafter-llama8b-fp8")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--gen", type=int, default=64)
    ap.add_argument("--n-predict", type=int, default=3)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--train-batch", type=int, default=512)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=2,
                    help="prompt-set seed (bench.py spec phase uses 2)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/arctic_tpu_jax_cache")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if os.environ.get("JAX_PLATFORMS"):
        # The axon TPU plugin prepends itself to jax_platforms even when
        # JAX_PLATFORMS is exported; re-pin explicitly (CPU smoke runs).
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                            ModelConfig, SchedulerConfig,
                                            SpeculativeConfig)
    from arcticinference_tpu.engine.llm import LLM
    from arcticinference_tpu.spec.distill import (capture_pairs,
                                                  distill_mlp,
                                                  init_tied_drafter,
                                                  save_distilled)

    on_tpu = jax.default_backend() == "tpu"
    overrides = dict(LLAMA_8B) if on_tpu else dict(TINY)

    # Spec-shaped capture (see spec/distill.py:capture_pairs): the
    # engine runs the SAME configuration the spec bench measures —
    # verify-shaped fused-loop programs, prefix caching off, identical
    # cache geometry — seeded with a random drafter of the distilled
    # architecture.  On a random-weight target, greedy argmax flips
    # under any program-shape change, so only shape-identical capture
    # transfers to bench-time acceptance.
    seed_dir = str(args.out) + "-seed"
    if not (Path(seed_dir) / "config.json").exists():
        sp, sa = init_tied_drafter(
            (overrides["hidden_size"], overrides["vocab_size"]),
            n_predict=args.n_predict)
        save_distilled(seed_dir, sp, sa, metrics={"seed_drafter": True})

    cfg = EngineConfig(
        model=ModelConfig(model="llama", hf_overrides=overrides,
                          quantization="fp8" if on_tpu else None,
                          max_model_len=4096 if on_tpu else 256),
        cache=CacheConfig(block_size=32,
                          num_blocks=512 if on_tpu else 64,
                          enable_prefix_caching=False),
        scheduler=SchedulerConfig(max_num_seqs=args.batch,
                                  max_num_batched_tokens=2048
                                  if on_tpu else 64,
                                  async_scheduling=False),
        speculative=SpeculativeConfig(
            method="arctic", model=seed_dir,
            num_speculative_tokens=args.n_predict),
    )
    t0 = time.time()
    llm = LLM(cfg)
    prompts = make_prompts(args.seed, args.batch, args.prompt_len,
                           overrides["vocab_size"])
    print(f"[distill] engine up in {time.time()-t0:.1f}s; capturing "
          f"{args.batch}x{args.gen} spec-shaped greedy pairs",
          file=sys.stderr)

    t0 = time.time()
    hidden, tok0, targets, mask = capture_pairs(
        llm, prompts, gen_len=args.gen, n_predict=args.n_predict)
    print(f"[distill] captured {hidden.shape[0]} pairs in "
          f"{time.time()-t0:.1f}s", file=sys.stderr)

    # Free the KV cache + engine machinery; keep params (tied tables).
    target_params = llm.engine.runner.params
    llm.engine.runner.kv = None
    llm.engine = None
    gc.collect()

    t0 = time.time()
    params, arch, acc = distill_mlp(
        target_params, hidden, tok0, targets, mask,
        n_predict=args.n_predict, steps=args.steps,
        batch_size=args.train_batch, lr=args.lr, log_every=100)
    print(f"[distill] trained in {time.time()-t0:.1f}s", file=sys.stderr)

    save_distilled(args.out, params, arch, metrics={
        "train_acc": [float(a) for a in acc],
        "pairs": int(hidden.shape[0]),
        "steps": args.steps,
        "prompt_seed": args.seed,
        "batch": args.batch,
        "prompt_len": args.prompt_len,
        "gen": args.gen,
    })
    print(json.dumps({"drafter": str(args.out),
                      "train_acc": [round(float(a), 4) for a in acc]}))


if __name__ == "__main__":
    main()
