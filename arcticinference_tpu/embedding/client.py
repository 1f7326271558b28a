"""Async + sync gRPC clients for the embedding service.

Mirror of reference ``embedding/client.py``: embed / abort / info /
health against a replica or a manager endpoint.
"""

from __future__ import annotations

import uuid
from typing import Optional, Sequence

import numpy as np

from arcticinference_tpu.embedding import codegen


def _encode_request(pb2, prompts, token_ids, pooling, request_id):
    req = pb2.EncodeRequest(
        request_id=request_id or f"emb-{uuid.uuid4().hex[:12]}",
        pooling=pooling)
    if token_ids is not None:
        for ids in token_ids:
            req.token_ids.append(pb2.TokenIds(
                token_id_bytes_i32=np.asarray(ids, "<i4").tobytes()))
    elif prompts is not None:
        req.prompts.extend(prompts)
    else:
        raise ValueError("prompts or token_ids required")
    return req


def _parse_embeddings(resp) -> list[np.ndarray]:
    return [np.frombuffer(b, dtype="<f4") for b in resp.embeddings]


class InferenceClient:
    """Synchronous client."""

    def __init__(self, target: str):
        import grpc

        self.pb2 = codegen.load_pb2()
        self.channel = grpc.insecure_channel(target)
        self.stub = codegen.InferenceStub(self.channel)

    def embed(self, prompts: Optional[Sequence[str]] = None,
              token_ids: Optional[Sequence[Sequence[int]]] = None,
              pooling: str = "mean",
              request_id: Optional[str] = None,
              timeout: float = 300.0) -> list[np.ndarray]:
        req = _encode_request(self.pb2, prompts, token_ids, pooling,
                              request_id)
        return _parse_embeddings(self.stub.Encode(req, timeout=timeout))

    def abort(self, request_id: str) -> bool:
        return self.stub.Abort(
            self.pb2.AbortRequest(request_id=request_id), timeout=10
        ).aborted

    def generate(self, prompt=None, token_ids=None, max_tokens=128,
                 temperature=0.0, top_p=1.0, top_k=0, ignore_eos=False,
                 stop=(), seed=None, request_id=None,
                 timeout: float = 600.0):
        """Stream completions from a decoder replica; yields dicts
        {token_ids, text_delta, finished, finish_reason}."""
        req = _generate_request(self.pb2, prompt, token_ids, max_tokens,
                                temperature, top_p, top_k, ignore_eos,
                                stop, seed, request_id)
        for resp in self.stub.Generate(req, timeout=timeout):
            yield _parse_generate(resp)

    def info(self):
        return self.stub.GetReplicaInfo(
            self.pb2.ReplicaInfoRequest(), timeout=10)

    def health(self) -> bool:
        try:
            return self.stub.HealthCheck(
                self.pb2.HealthCheckRequest(), timeout=5).healthy
        except Exception:
            return False

    def close(self) -> None:
        self.channel.close()


class AsyncInferenceClient:

    def __init__(self, target: str):
        import grpc

        self.pb2 = codegen.load_pb2()
        self.channel = grpc.aio.insecure_channel(target)
        self.stub = codegen.AsyncInferenceStub(self.channel)

    async def embed(self, prompts=None, token_ids=None,
                    pooling: str = "mean", request_id=None,
                    timeout: float = 300.0) -> list[np.ndarray]:
        req = _encode_request(self.pb2, prompts, token_ids, pooling,
                              request_id)
        resp = await self.stub.Encode(req, timeout=timeout)
        return _parse_embeddings(resp)

    async def generate(self, prompt=None, token_ids=None,
                       max_tokens=128, temperature=0.0, top_p=1.0,
                       top_k=0, ignore_eos=False, stop=(), seed=None,
                       request_id=None, timeout: float = 600.0):
        req = _generate_request(self.pb2, prompt, token_ids, max_tokens,
                                temperature, top_p, top_k, ignore_eos,
                                stop, seed, request_id)
        async for resp in self.stub.Generate(req, timeout=timeout):
            yield _parse_generate(resp)

    async def health(self) -> bool:
        try:
            resp = await self.stub.HealthCheck(
                self.pb2.HealthCheckRequest(), timeout=5)
            return resp.healthy
        except Exception:
            return False

    async def close(self) -> None:
        await self.channel.close()


def _generate_request(pb2, prompt, token_ids, max_tokens, temperature,
                      top_p, top_k, ignore_eos, stop, seed, request_id):
    kw = dict(request_id=request_id or "",
              max_tokens=int(max_tokens),
              temperature=float(temperature), top_p=float(top_p),
              top_k=int(top_k), ignore_eos=bool(ignore_eos),
              stop=list(stop),
              seed=int(seed) if seed is not None else -1)
    if token_ids is not None:
        kw["token_id_bytes_i32"] = np.asarray(token_ids,
                                              "<i4").tobytes()
    elif prompt is not None:
        kw["prompt"] = prompt
    else:
        raise ValueError("prompt or token_ids required")
    return pb2.GenerateRequest(**kw)


def _parse_generate(resp) -> dict:
    return {"request_id": resp.request_id,
            "token_ids": list(resp.token_ids),
            "text_delta": resp.text_delta,
            "finished": resp.finished,
            "finish_reason": resp.finish_reason}
