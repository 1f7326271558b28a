"""Subprocess server spawn tests (CPU-pinned via ARCTIC_TPU_FORCE_CPU).

Exercises the real process entrypoints: the OpenAI server and the
embedding replica + manager flow, end to end over real sockets.
"""

import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

CFG = {
    "model": {"model": "llama", "dtype": "float32", "max_model_len": 128,
              "hf_overrides": {
                  "vocab_size": 97, "hidden_size": 64,
                  "intermediate_size": 128, "num_hidden_layers": 2,
                  "num_attention_heads": 4, "num_key_value_heads": 2,
                  "head_dim": 16}},
    "cache": {"block_size": 8, "num_blocks": 64},
    "scheduler": {"max_num_seqs": 4, "max_num_batched_tokens": 64},
}


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def wait_http(url, proc, timeout=120):
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


@pytest.fixture()
def cfg_file(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(CFG))
    return str(p)


def _env():
    env = dict(os.environ)
    env["ARCTIC_TPU_FORCE_CPU"] = "1"
    return env


def test_openai_server_subprocess(cfg_file):
    port = free_port()
    proc = subprocess.Popen(
        [sys.executable, "-m",
         "arcticinference_tpu.serving.openai_server",
         "--config", cfg_file, "--port", str(port), "--host", "127.0.0.1"],
        env=_env())
    try:
        wait_http(f"http://127.0.0.1:{port}/health", proc)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps({"prompt_token_ids": [3, 14, 15],
                             "max_tokens": 4}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            data = json.loads(r.read())
        assert len(data["choices"][0]["token_ids"]) == 4
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_embedding_replica_subprocess(cfg_file):
    port = free_port()
    proc = subprocess.Popen(
        [sys.executable, "-m", "arcticinference_tpu.embedding.replica",
         "--config", cfg_file, "--port", str(port)],
        env=_env())
    try:
        from arcticinference_tpu.embedding.client import InferenceClient

        deadline = time.time() + 120
        client = InferenceClient(f"localhost:{port}")
        while time.time() < deadline:
            if proc.poll() is not None:
                raise RuntimeError(f"replica exited: {proc.returncode}")
            if client.health():
                break
            time.sleep(0.5)
        assert client.health()
        embs = client.embed(token_ids=[[1, 2, 3]])
        assert embs[0].shape == (64,)
        client.close()
    finally:
        proc.terminate()
        proc.wait(timeout=10)
