"""Accuracy harness over offline task fixtures, per engine config.

The analogue of the reference's lm_eval + json-mode benchmark matrix
(reference ``tests/benchmarks/test_benchmarks.py:46-76,115-151``): score
multiple-choice (loglikelihood), generation and json-mode tasks for each
precision config, collect a pandas summary, and gate quantized configs
against the bf16 baseline.
"""

import json
import os
import socket
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")
pytest.importorskip("pandas")

REPO = Path(__file__).resolve().parents[2]

# Load the harness by path: `benchmarks` is a script directory, not an
# installed package (and `tests.benchmarks` would shadow the name).
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "accuracy_harness", REPO / "benchmarks" / "accuracy_harness.py")
_mod = importlib.util.module_from_spec(_spec)
sys.modules["accuracy_harness"] = _mod  # dataclasses needs the registry
_spec.loader.exec_module(_mod)
HTTPClient = _mod.HTTPClient
LocalClient = _mod.LocalClient
Task = _mod.Task
load_task = _mod.load_task
run_suite = _mod.run_suite
run_task = _mod.run_task


def _llm(ckpt_dir, quant):
    from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                            ModelConfig, SchedulerConfig)
    from arcticinference_tpu.engine.llm import LLM

    return LLM(EngineConfig(
        model=ModelConfig(model=ckpt_dir, quantization=quant,
                          max_model_len=2048),
        cache=CacheConfig(block_size=16, num_blocks=256),
        scheduler=SchedulerConfig(max_num_seqs=8,
                                  max_num_batched_tokens=512)))


def _make_tasks(heldout, rng) -> list:
    """Build mc / generate / json tasks from the held-out corpus."""
    mc_items = []
    for _ in range(20):
        p = int(rng.integers(0, len(heldout) - 24))
        prompt = heldout[p:p + 12].tolist()
        true = heldout[p + 12:p + 16].tolist()
        wrong = [int(rng.integers(32, 127)) for _ in true]
        answer = int(rng.integers(0, 2))
        choices = [true, wrong] if answer == 0 else [wrong, true]
        mc_items.append(dict(prompt_token_ids=prompt,
                             choices_token_ids=choices, answer=answer))
    gen_items = []
    for _ in range(20):
        p = int(rng.integers(0, len(heldout) - 20))
        gen_items.append(dict(prompt_token_ids=heldout[p:p + 12].tolist(),
                              expected_token_ids=heldout[p + 12:p + 14]
                              .tolist(), max_tokens=2))
    schema = {"type": "object",
              "properties": {"count": {"type": "integer"}},
              "required": ["count"]}
    json_items = [dict(prompt_token_ids=heldout[i:i + 8].tolist(),
                       schema=schema, max_tokens=32) for i in
                  range(0, 40, 8)]
    return [Task("markov_mc", "multiple_choice", mc_items),
            Task("markov_gen", "generate", gen_items),
            Task("json_mode", "json", json_items)]


@pytest.fixture(scope="module")
def summary(trained_checkpoint):
    d, heldout = trained_checkpoint
    rng = np.random.default_rng(5)
    tasks = _make_tasks(np.asarray(heldout), rng)
    clients = {q or "bf16": LocalClient(_llm(d, q))
               for q in (None, "fp8", "int8")}
    frame = run_suite(clients, tasks)
    print("\n", frame.to_string())
    return frame


class TestAccuracyMatrix:

    def test_mc_baseline_quality(self, summary):
        assert summary.loc[("bf16", "markov_mc"), "value"] >= 0.8, summary

    def test_mc_quantized_within_baseline(self, summary):
        base = summary.loc[("bf16", "markov_mc"), "value"]
        for cfg in ("fp8", "int8"):
            got = summary.loc[(cfg, "markov_mc"), "value"]
            assert got >= base - 0.15, summary

    def test_generate_quantized_within_baseline(self, summary):
        base = summary.loc[("bf16", "markov_gen"), "value"]
        assert base >= 0.3, summary
        for cfg in ("fp8", "int8"):
            got = summary.loc[(cfg, "markov_gen"), "value"]
            assert got >= base - 0.25, summary

    def test_json_mode_conformance(self, summary):
        # Guided decoding guarantees schema conformance per config
        # (reference test_json_mode analogue).
        for cfg in ("bf16", "fp8", "int8"):
            assert summary.loc[(cfg, "json_mode"), "value"] == 1.0, summary


class TestTaskFileRoundtrip:

    def test_load_task_file(self, tmp_path, trained_checkpoint):
        d, heldout = trained_checkpoint
        task = _make_tasks(np.asarray(heldout),
                           np.random.default_rng(0))[0]
        p = tmp_path / "task.json"
        p.write_text(json.dumps(dict(name=task.name, type=task.type,
                                     items=task.items)))
        loaded = load_task(p)
        assert loaded.name == task.name
        assert len(loaded.items) == len(task.items)


class TestHTTPParity:
    """The HTTP scoring path (echo prompt logprobs) matches in-process
    scoring — the harness can drive live servers like the reference."""

    def test_echo_scoring_matches_local(self, trained_checkpoint):
        d, heldout = trained_checkpoint
        port = _free_port()
        cfg = {"model": {"model": d, "max_model_len": 2048},
               "cache": {"block_size": 16, "num_blocks": 256},
               "scheduler": {"max_num_seqs": 8,
                             "max_num_batched_tokens": 512}}
        cfg_file = Path(d) / "engine_cfg.json"
        cfg_file.write_text(json.dumps(cfg))
        env = dict(os.environ)
        env["ARCTIC_TPU_FORCE_CPU"] = "1"
        proc = subprocess.Popen(
            [sys.executable, "-m",
             "arcticinference_tpu.serving.openai_server",
             "--port", str(port), "--config", str(cfg_file)],
            env=env, cwd=str(REPO), stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
        try:
            _wait_http(f"http://127.0.0.1:{port}/health", proc)
            http = HTTPClient(f"http://127.0.0.1:{port}")
            local = LocalClient(_llm(d, None))
            prompt = np.asarray(heldout[:12]).tolist()
            cont = np.asarray(heldout[12:16]).tolist()
            a = http.continuation_logprob(prompt, cont)
            b = local.continuation_logprob(prompt, cont)
            assert abs(a - b) < 5e-2, (a, b)
            toks, _ = http.generate(prompt, 4)
            assert len(toks) == 4
        finally:
            proc.terminate()
            proc.wait(timeout=10)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def _wait_http(url, proc, timeout=180):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(f"server exited: {proc.returncode}")
        try:
            with urllib.request.urlopen(url, timeout=2) as r:
                if r.status == 200:
                    return
        except Exception:
            time.sleep(0.5)
    raise TimeoutError(url)
