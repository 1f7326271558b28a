"""OpenAI server tests via aiohttp test client (tiny model, CPU)."""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from arcticinference_tpu.serving.openai_server import OpenAIServer
from tests.test_engine import tiny_config


@pytest.fixture(scope="module")
def loop():
    loop = asyncio.new_event_loop()
    yield loop
    loop.close()


@pytest.fixture(scope="module")
def server(loop):
    srv = OpenAIServer(tiny_config(), served_model_name="tiny-llama")
    yield srv
    srv.engine.close()


async def _client(server):
    return TestClient(TestServer(server.app))


def test_health_and_models(server, loop):
    async def run():
        client = await _client(server)
        async with client:
            r = await client.get("/health")
            assert r.status == 200
            r = await client.get("/v1/models")
            data = await r.json()
            assert data["data"][0]["id"] == "tiny-llama"

    loop.run_until_complete(run())


def test_completions_with_token_ids(server, loop):
    async def run():
        client = await _client(server)
        async with client:
            r = await client.post("/v1/completions", json={
                "prompt_token_ids": [3, 14, 15, 92],
                "max_tokens": 6,
            })
            assert r.status == 200
            data = await r.json()
            choice = data["choices"][0]
            assert len(choice["token_ids"]) == 6
            assert choice["finish_reason"] == "length"
            assert data["usage"]["completion_tokens"] == 6

    loop.run_until_complete(run())


def test_completions_requires_prompt(server, loop):
    async def run():
        client = await _client(server)
        async with client:
            r = await client.post("/v1/completions", json={})
            assert r.status == 400

    loop.run_until_complete(run())


def test_streaming_completion(server, loop):
    async def run():
        client = await _client(server)
        async with client:
            r = await client.post("/v1/completions", json={
                "prompt_token_ids": [5, 6, 7],
                "max_tokens": 5,
                "stream": True,
            })
            assert r.status == 200
            body = await r.text()
            events = [line[6:] for line in body.splitlines()
                      if line.startswith("data: ")]
            assert events[-1] == "[DONE]"
            tok_count = 0
            finish = None
            for e in events[:-1]:
                payload = json.loads(e)
                ch = payload["choices"][0]
                tok_count += len(ch.get("token_ids", []))
                finish = ch.get("finish_reason", finish)
            assert tok_count == 5
            assert finish == "length"

    loop.run_until_complete(run())


def test_concurrent_requests(server, loop):
    async def run():
        client = await _client(server)
        async with client:
            async def one(seed):
                r = await client.post("/v1/completions", json={
                    "prompt_token_ids": [seed, seed + 1, seed + 2],
                    "max_tokens": 4,
                })
                return await r.json()

            results = await asyncio.gather(*[one(s) for s in
                                             (3, 17, 29, 41, 53)])
            for data in results:
                assert len(data["choices"][0]["token_ids"]) == 4

    loop.run_until_complete(run())


def test_chat_completion_fallback_template(server, loop):
    async def run():
        client = await _client(server)
        async with client:
            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4,
            })
            # Tiny model has no tokenizer -> needs encode -> 400.
            assert r.status == 400

    loop.run_until_complete(run())


def test_json_mode_endpoint(server, loop):
    """response_format json_object produces valid JSON (server level)."""
    from tests.test_structured import CharTokenizer

    async def run():
        server.tokenizer = CharTokenizer()
        try:
            client = await _client(server)
            async with client:
                r = await client.post("/v1/completions", json={
                    "prompt_token_ids": [65, 66, 67],
                    "max_tokens": 30,
                    "response_format": {"type": "json_object"},
                })
                assert r.status == 200
                data = await r.json()
                text = "".join(chr(t)
                               for t in data["choices"][0]["token_ids"])
                json.loads(text)
        finally:
            server.tokenizer = None

    loop.run_until_complete(run())


def test_completions_logprobs(server, loop):
    async def run():
        client = await _client(server)
        async with client:
            r = await client.post("/v1/completions", json={
                "prompt_token_ids": [3, 14, 15],
                "max_tokens": 4,
                "logprobs": 3,
            })
            data = await r.json()
            lp = data["choices"][0]["logprobs"]
            assert len(lp["token_logprobs"]) == 4
            assert all(v is not None and v <= 0
                       for v in lp["token_logprobs"])
            assert all(len(d) == 3 for d in lp["top_logprobs"])

    loop.run_until_complete(run())


def test_guided_choice_endpoint(server, loop):
    """guided_choice constrains the HTTP response to one of N strings."""
    from tests.test_structured import CharTokenizer

    async def run():
        server.tokenizer = CharTokenizer()
        try:
            client = await _client(server)
            async with client:
                r = await client.post("/v1/completions", json={
                    "prompt_token_ids": [65, 66, 67],
                    "max_tokens": 20,
                    "guided_choice": ["alpha", "beta", "gamma"],
                })
                assert r.status == 200
                data = await r.json()
                text = "".join(chr(t)
                               for t in data["choices"][0]["token_ids"])
                assert text in ("alpha", "beta", "gamma"), text
        finally:
            server.tokenizer = None

    loop.run_until_complete(run())


def test_guided_regex_endpoint(server, loop):
    import re

    from tests.test_structured import CharTokenizer

    async def run():
        server.tokenizer = CharTokenizer()
        try:
            client = await _client(server)
            async with client:
                r = await client.post("/v1/completions", json={
                    "prompt_token_ids": [65, 66, 67],
                    "max_tokens": 20,
                    "guided_regex": r"id-\d+",
                })
                assert r.status == 200
                data = await r.json()
                text = "".join(chr(t)
                               for t in data["choices"][0]["token_ids"])
                assert re.fullmatch(r"id-\d+", text), text
        finally:
            server.tokenizer = None

    loop.run_until_complete(run())


def test_metrics_and_profile_endpoints(server, loop, tmp_path):
    async def run():
        client = await _client(server)
        async with client:
            # generate something so step timings exist
            r = await client.post("/v1/completions", json={
                "prompt_token_ids": [3, 14, 15],
                "max_tokens": 4,
            })
            assert r.status == 200
            r = await client.get("/metrics")
            assert r.status == 200
            m = await r.json()
            assert m["num_steps"] > 0
            assert m["num_generated_tokens"] >= 4
            assert isinstance(m["step_times"], dict) and m["step_times"]
            for v in m["step_times"].values():
                assert v["count"] > 0 and v["p50_ms"] >= 0
            # profiler trace round trip
            d = str(tmp_path / "trace")
            r = await client.post("/start_profile",
                                  json={"trace_dir": d})
            assert r.status == 200
            r = await client.post("/v1/completions", json={
                "prompt_token_ids": [5, 6, 7],
                "max_tokens": 2,
            })
            assert r.status == 200
            r = await client.post("/stop_profile")
            assert r.status == 200
            import os
            assert any(os.scandir(d)), "no trace output written"

    loop.run_until_complete(run())


class TestEmbeddingsEndpoint:
    """OpenAI /v1/embeddings served from the dense EncoderRunner
    (encoder deployments; reference serves embeddings via vLLM encode,
    ``embedding/replica.py:213-237``)."""

    @pytest.fixture(scope="class")
    def encoder_server(self):
        from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                                ModelConfig,
                                                SchedulerConfig)

        hf = dict(architectures=["BertModel"], vocab_size=128,
                  hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  max_position_embeddings=128, pad_token_id=0,
                  type_vocab_size=2)
        cfg = EngineConfig(
            model=ModelConfig(model="bert", hf_overrides=hf,
                              max_model_len=128, dtype="float32"),
            cache=CacheConfig(block_size=8, num_blocks=16),
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=128))
        return OpenAIServer(cfg)

    def test_embeddings_roundtrip(self, encoder_server, loop):
        async def run():
            client = await _client(encoder_server)
            async with client:
                r = await client.post("/v1/embeddings",
                                      json={"input": [[1, 2, 3],
                                                      [4, 5, 6, 7]]})
                assert r.status == 200
                data = await r.json()
                assert len(data["data"]) == 2
                assert len(data["data"][0]["embedding"]) == 32
                assert data["usage"]["prompt_tokens"] == 7
                # completions must be rejected in encoder mode
                r2 = await client.post("/v1/completions",
                                       json={"prompt_token_ids": [1, 2],
                                             "max_tokens": 2})
                assert r2.status == 400
                r3 = await client.get("/health")
                assert r3.status == 200
                r4 = await client.get("/metrics")
                assert (await r4.json())["mode"] == "encoder"

        loop.run_until_complete(run())

    def test_causal_server_rejects_embeddings(self, server, loop):
        async def run():
            client = await _client(server)
            async with client:
                r = await client.post("/v1/embeddings",
                                      json={"input": [[1]]})
                assert r.status == 400

        loop.run_until_complete(run())


def test_disconnect_aborts_engine_request(server, loop):
    """A cancelled (client-disconnected) non-streaming request must abort
    the engine-side request (reference with_cancellation semantics)."""
    async def run():
        eng = server.engine
        aborted = []
        orig_abort = eng.abort

        async def spy_abort(rid):
            aborted.append(rid)
            await orig_abort(rid)

        eng.abort = spy_abort
        try:
            task = asyncio.ensure_future(server._collect(
                [1, 2, 3, 4],
                server._sampling_from({"max_tokens": 64}), "cmpl-dc"))
            await asyncio.sleep(0.05)   # let the request enter the engine
            task.cancel()
            with pytest.raises(asyncio.CancelledError):
                await task
            assert aborted == ["cmpl-dc"]
        finally:
            eng.abort = orig_abort

    loop.run_until_complete(run())
