"""Embedding throughput benchmark.

Mirror of reference ``benchmark/embedding/benchmark.py``: sweeps batch
size x concurrency x prompt-length distribution against the gRPC
embedding service (or in-process engine with --local), reporting Ktok/s
and latency percentiles.

  # in-process (one engine, no server):
  python benchmarks/embedding_bench.py --local --batch-sizes 16 64 \
      --len-dist fixed:128

  # against a running replica/manager:
  python benchmarks/embedding_bench.py --target localhost:50050 \
      --batch-sizes 64 --concurrency 8
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def gen_lengths(dist: str, n: int, rng) -> list[int]:
    kind, _, arg = dist.partition(":")
    if kind == "fixed":
        return [int(arg)] * n
    if kind == "uniform":
        lo, hi = (int(x) for x in arg.split(","))
        return [int(x) for x in rng.integers(lo, hi + 1, n)]
    if kind == "normal":
        mu, sd = (float(x) for x in arg.split(","))
        return [max(1, int(x)) for x in rng.normal(mu, sd, n)]
    raise ValueError(f"unknown length distribution {dist}")


def run_local(args) -> None:
    import jax

    from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                            ModelConfig, SchedulerConfig)
    from arcticinference_tpu.engine.llm import LLM

    on_tpu = jax.default_backend() == "tpu"
    overrides = (dict(vocab_size=128256, hidden_size=4096,
                      intermediate_size=14336, num_hidden_layers=32,
                      num_attention_heads=32, num_key_value_heads=8,
                      head_dim=128) if on_tpu else
                 dict(vocab_size=512, hidden_size=256,
                      intermediate_size=512, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=8,
                      head_dim=32))
    cfg = EngineConfig(
        model=ModelConfig(model="llama", hf_overrides=overrides,
                          quantization="fp8" if on_tpu else None,
                          max_model_len=2048),
        cache=CacheConfig(block_size=32, num_blocks=512 if on_tpu else 64),
        scheduler=SchedulerConfig(max_num_seqs=args.max_batch,
                                  max_num_batched_tokens=8192
                                  if on_tpu else 512))
    llm = LLM(cfg)
    rng = np.random.default_rng(0)
    vocab = overrides["vocab_size"]

    for batch in args.batch_sizes:
        lens = gen_lengths(args.len_dist, batch, rng)
        prompts = [[int(x) for x in rng.integers(1, vocab - 1, L)]
                   for L in lens]
        llm.encode(prompt_token_ids=prompts)  # warmup/compile
        times = []
        total_tokens = sum(lens) * args.iters
        t0 = time.perf_counter()
        for _ in range(args.iters):
            t1 = time.perf_counter()
            llm.encode(prompt_token_ids=prompts)
            times.append(time.perf_counter() - t1)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "mode": "local", "batch": batch, "len_dist": args.len_dist,
            "ktok_per_s": round(total_tokens / dt / 1e3, 1),
            "latency_p50_ms": round(float(np.percentile(times, 50)) * 1e3,
                                    1),
            "latency_p99_ms": round(float(np.percentile(times, 99)) * 1e3,
                                    1),
        }), flush=True)


def run_remote(args) -> None:
    from arcticinference_tpu.embedding.client import InferenceClient

    rng = np.random.default_rng(0)
    for batch in args.batch_sizes:
        lens = gen_lengths(args.len_dist, batch, rng)
        prompts = [[int(x) for x in rng.integers(1, 30000, L)]
                   for L in lens]
        results = []
        lock = threading.Lock()

        def worker():
            client = InferenceClient(args.target)
            for _ in range(args.iters):
                t1 = time.perf_counter()
                client.embed(token_ids=prompts)
                with lock:
                    results.append(time.perf_counter() - t1)
            client.close()

        threads = [threading.Thread(target=worker)
                   for _ in range(args.concurrency)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        total_tokens = sum(lens) * args.iters * args.concurrency
        print(json.dumps({
            "mode": "remote", "batch": batch,
            "concurrency": args.concurrency, "len_dist": args.len_dist,
            "ktok_per_s": round(total_tokens / dt / 1e3, 1),
            "latency_p50_ms": round(
                float(np.percentile(results, 50)) * 1e3, 1),
            "latency_p99_ms": round(
                float(np.percentile(results, 99)) * 1e3, 1),
        }), flush=True)


def run_http(args) -> None:
    """HTTP load generator against the OpenAI ``/v1/embeddings`` endpoint
    (mirror of reference ``benchmark/embedding/benchmark_http.py``)."""
    import urllib.request

    rng = np.random.default_rng(0)
    url = args.target if args.target.startswith("http") else \
        f"http://{args.target}"
    for batch in args.batch_sizes:
        lens = gen_lengths(args.len_dist, batch, rng)
        inputs = [[int(x) for x in rng.integers(1, 30000, L)]
                  for L in lens]
        body = json.dumps({"input": inputs, "model": "bench"}).encode()
        results = []
        lock = threading.Lock()

        def worker():
            for _ in range(args.iters):
                req = urllib.request.Request(
                    f"{url}/v1/embeddings", data=body,
                    headers={"Content-Type": "application/json"})
                t1 = time.perf_counter()
                resp = json.loads(urllib.request.urlopen(
                    req, timeout=600).read())
                assert len(resp["data"]) == batch
                with lock:
                    results.append(time.perf_counter() - t1)

        threads = [threading.Thread(target=worker)
                   for _ in range(args.concurrency)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        total_tokens = sum(lens) * args.iters * args.concurrency
        print(json.dumps({
            "mode": "http", "batch": batch,
            "concurrency": args.concurrency, "len_dist": args.len_dist,
            "ktok_per_s": round(total_tokens / dt / 1e3, 1),
            "latency_p50_ms": round(
                float(np.percentile(results, 50)) * 1e3, 1),
            "latency_p99_ms": round(
                float(np.percentile(results, 99)) * 1e3, 1),
        }), flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--local", action="store_true")
    parser.add_argument("--http", action="store_true",
                        help="drive /v1/embeddings over HTTP instead of "
                             "gRPC (--target is then host:port of the "
                             "OpenAI server)")
    parser.add_argument("--target", default="localhost:50050")
    parser.add_argument("--batch-sizes", type=int, nargs="+",
                        default=[16, 64])
    parser.add_argument("--max-batch", type=int, default=64)
    parser.add_argument("--concurrency", type=int, default=4)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--len-dist", default="fixed:128",
                        help="fixed:N | uniform:LO,HI | normal:MU,SD")
    args = parser.parse_args()
    if args.local:
        run_local(args)
    elif args.http:
        run_http(args)
    else:
        run_remote(args)


if __name__ == "__main__":
    main()
