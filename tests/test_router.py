"""DP replica router: load balancing, failover, streaming passthrough.

Two real openai_server subprocesses (CPU-pinned) behind an in-process
LLMRouter — the LLM analogue of the reference's embedding replica
manager tests (reference ``embedding/replica_manager.py``).
"""

import asyncio
import json
import subprocess
import sys

import pytest
from aiohttp.test_utils import TestClient, TestServer

from arcticinference_tpu.serving.router import LLMRouter
from tests.test_subprocess_servers import CFG, _env, free_port, wait_http


@pytest.fixture(scope="module")
def cfg_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("router") / "cfg.json"
    p.write_text(json.dumps(CFG))
    return str(p)


@pytest.fixture(scope="module")
def replicas(cfg_path):
    procs, urls = [], []
    for _ in range(2):
        port = free_port()
        proc = subprocess.Popen(
            [sys.executable, "-m",
             "arcticinference_tpu.serving.openai_server",
             "--config", cfg_path, "--port", str(port),
             "--host", "127.0.0.1"],
            env=_env())
        procs.append(proc)
        urls.append(f"http://127.0.0.1:{port}")
    for proc, url in zip(procs, urls):
        wait_http(url + "/health", proc)
    yield procs, urls
    for proc in procs:
        if proc.poll() is None:
            proc.terminate()
    for proc in procs:
        proc.wait(timeout=10)


@pytest.fixture(scope="module")
def loop():
    loop = asyncio.new_event_loop()
    yield loop
    loop.close()


def _run(loop, router, coro_fn):
    async def run():
        client = TestClient(TestServer(router.app))
        async with client:
            await router.wait_ready(min_replicas=1, timeout=60)
            return await coro_fn(client)

    return loop.run_until_complete(run())


def test_round_robin_spreads_load(replicas, loop):
    _, urls = replicas
    router = LLMRouter(urls, policy="round_robin", health_interval=30.0)

    async def go(client):
        for i in range(4):
            r = await client.post("/v1/completions", json={
                "prompt_token_ids": [3 + i, 14, 15], "max_tokens": 3})
            assert r.status == 200
            data = await r.json()
            assert len(data["choices"][0]["token_ids"]) == 3
        r = await client.get("/replicas")
        return await r.json()

    info = _run(loop, router, go)
    counts = [rep["total_requests"] for rep in info["replicas"]]
    assert sum(counts) == 4
    assert counts == [2, 2]          # alternated between both replicas


def test_streaming_proxies_sse(replicas, loop):
    _, urls = replicas
    router = LLMRouter(urls, health_interval=30.0)

    async def go(client):
        r = await client.post("/v1/completions", json={
            "prompt_token_ids": [3, 14, 15], "max_tokens": 4,
            "stream": True})
        assert r.status == 200
        assert "text/event-stream" in r.headers["Content-Type"]
        raw = (await r.read()).decode()
        chunks = [json.loads(line[len("data: "):])
                  for line in raw.splitlines()
                  if line.startswith("data: ") and "[DONE]" not in line]
        toks = [c["choices"][0]["token_ids"] for c in chunks
                if c["choices"][0].get("token_ids")]
        assert sum(len(t) for t in toks) == 4
        return True

    assert _run(loop, router, go)


def test_failover_to_healthy_replica(replicas, loop):
    procs, urls = replicas
    dead_port = free_port()
    # First backend does not exist; router must fail over.
    router = LLMRouter([f"http://127.0.0.1:{dead_port}", urls[0]],
                       policy="round_robin", health_interval=30.0)

    async def go(client):
        ok = 0
        for i in range(3):
            r = await client.post("/v1/completions", json={
                "prompt_token_ids": [5, 6 + i], "max_tokens": 2})
            if r.status == 200:
                ok += 1
        r = await client.get("/replicas")
        return ok, await r.json()

    ok, info = _run(loop, router, go)
    assert ok == 3
    # The dead backend is marked unhealthy after the health check.
    dead = [rep for rep in info["replicas"]
            if str(dead_port) in rep["url"]][0]
    assert not dead["healthy"]


def test_no_healthy_replicas_503(loop):
    router = LLMRouter([f"http://127.0.0.1:{free_port()}"],
                       health_interval=30.0)

    async def run():
        client = TestClient(TestServer(router.app))
        async with client:
            # skip wait_ready: nothing will become healthy
            r = await client.post("/v1/completions", json={
                "prompt_token_ids": [1], "max_tokens": 1})
            h = await client.get("/health")
            return r.status, h.status

    status, health = loop.run_until_complete(run())
    assert status == 503
    assert health == 503
