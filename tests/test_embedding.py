"""Embedding service tests: encode math + in-process gRPC round trip.

The replica/manager subprocess flow is exercised with an in-process grpc
server (same servicer code) to keep CI fast; the subprocess spawn path is
covered by the manager unit test with spawn=False.
"""

import threading
import time
from concurrent import futures

import grpc
import numpy as np
import pytest

from arcticinference_tpu.embedding import codegen
from arcticinference_tpu.embedding.client import InferenceClient
from arcticinference_tpu.embedding.replica import InferenceServicer
from arcticinference_tpu.embedding.replica_manager import (ManagerServicer,
                                                           Replica,
                                                           ReplicaManager)
from arcticinference_tpu.engine.llm import LLM
from tests.test_engine import tiny_config


@pytest.fixture(scope="module")
def llm():
    return LLM(tiny_config())


@pytest.fixture(scope="module")
def replica_server(llm):
    servicer = InferenceServicer(llm, "tiny")
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=4))
    codegen.add_servicer_to_server(servicer, server)
    port = server.add_insecure_port("localhost:0")
    server.start()
    yield f"localhost:{port}", servicer
    server.stop(0)


class TestEncodeMath:

    def test_mean_pooling_shapes(self, llm):
        embs = llm.encode(prompt_token_ids=[[1, 2, 3], [4] * 10])
        assert len(embs) == 2
        assert embs[0].shape == (64,)

    def test_batch_independence(self, llm):
        one = llm.encode(prompt_token_ids=[[7, 8, 9]])[0]
        many = llm.encode(
            prompt_token_ids=[[1, 2], [7, 8, 9], [5] * 20])[1]
        np.testing.assert_allclose(one, many, atol=1e-5)

    def test_last_pooling_differs(self, llm):
        a = llm.encode(prompt_token_ids=[[1, 2, 3, 4]], pooling="mean")[0]
        b = llm.encode(prompt_token_ids=[[1, 2, 3, 4]], pooling="last")[0]
        assert not np.allclose(a, b)

    def test_causal_normalize(self, llm):
        """L2 normalization on the causal-LM pooled path (device-side)."""
        raw = llm.encode(prompt_token_ids=[[1, 2, 3], [4] * 10])
        unit = llm.encode(prompt_token_ids=[[1, 2, 3], [4] * 10],
                          normalize=True)
        for r, u in zip(raw, unit):
            np.testing.assert_allclose(np.linalg.norm(u), 1.0, atol=1e-5)
            np.testing.assert_allclose(u, r / np.linalg.norm(r), atol=1e-5)


class TestGrpcRoundtrip:

    def test_encode_with_token_ids(self, replica_server):
        target, _ = replica_server
        client = InferenceClient(target)
        embs = client.embed(token_ids=[[1, 2, 3], [9, 8, 7, 6]])
        assert len(embs) == 2
        assert embs[0].shape == (64,)
        assert embs[0].dtype == np.float32
        client.close()

    def test_health_and_info(self, replica_server):
        target, servicer = replica_server
        client = InferenceClient(target)
        assert client.health()
        client.embed(token_ids=[[1, 2]])
        info = client.info()
        assert info.model == "tiny"
        assert info.total_requests >= 1
        assert info.total_tokens >= 2
        client.close()

    def test_encode_matches_local(self, replica_server, llm):
        target, _ = replica_server
        client = InferenceClient(target)
        remote = client.embed(token_ids=[[11, 12, 13]])[0]
        local = llm.encode(prompt_token_ids=[[11, 12, 13]])[0]
        np.testing.assert_allclose(remote, local, atol=1e-6)
        client.close()

    def test_missing_input_rejected(self, replica_server):
        target, _ = replica_server
        client = InferenceClient(target)
        with pytest.raises(Exception):
            client.embed(token_ids=None, prompts=None)
        client.close()


class TestManager:

    def test_routing_and_failover(self, replica_server):
        target, _ = replica_server
        host, port = target.rsplit(":", 1)
        mgr = ReplicaManager(int(port), 1, [], spawn=False,
                             health_interval=0.2)
        # A phantom second replica that is never healthy.
        dead = Replica(port=1)  # nothing listens here
        dead.connect()
        mgr.replicas.append(dead)
        time.sleep(0.6)
        assert mgr.replicas[0].healthy
        assert not mgr.replicas[1].healthy

        pb2 = codegen.load_pb2()
        req = pb2.EncodeRequest(request_id="t1")
        req.token_ids.append(pb2.TokenIds(
            token_id_bytes_i32=np.asarray([1, 2, 3], "<i4").tobytes()))
        # Routed to the healthy replica regardless of policy.
        for _ in range(3):
            resp = mgr.route_encode(req)
            assert len(resp.embeddings) == 1
        mgr._stop = True

    def test_manager_servicer_health(self, replica_server):
        target, _ = replica_server
        host, port = target.rsplit(":", 1)
        mgr = ReplicaManager(int(port), 1, [], spawn=False,
                             health_interval=0.2)
        time.sleep(0.5)
        ms = ManagerServicer(mgr)
        pb2 = codegen.load_pb2()
        assert ms.HealthCheck(pb2.HealthCheckRequest(), None).healthy
        info = ms.GetReplicaInfo(pb2.ReplicaInfoRequest(), None)
        assert info.model == "tiny"
        mgr._stop = True


class TestGrpcGenerate:
    """Streaming Generate RPC (the reference's client exposes generate()
    whose RPC its proto/server never define; ours works end to end)."""

    def test_stream_matches_local(self, replica_server, llm):
        from arcticinference_tpu.engine.request import SamplingParams

        target, _ = replica_server
        client = InferenceClient(target)
        want = llm.generate(
            prompt_token_ids=[[5, 6, 7]],
            sampling_params=SamplingParams(max_tokens=8,
                                           ignore_eos=True))[0].token_ids
        toks = []
        chunks = 0
        finish = None
        for c in client.generate(token_ids=[5, 6, 7], max_tokens=8,
                                 ignore_eos=True):
            toks.extend(c["token_ids"])
            chunks += 1
            if c["finished"]:
                finish = c["finish_reason"]
        assert toks == want
        assert chunks >= 2          # streamed in deltas
        assert finish == "finished_length"
        client.close()

    def test_generate_seeded_reproducible(self, replica_server):
        target, _ = replica_server
        client = InferenceClient(target)

        def run():
            out = []
            for c in client.generate(token_ids=[9, 8, 7], max_tokens=6,
                                     temperature=1.0, seed=5,
                                     ignore_eos=True):
                out.extend(c["token_ids"])
            return out

        assert run() == run()
        client.close()
