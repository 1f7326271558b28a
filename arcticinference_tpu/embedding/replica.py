"""Embedding replica: a gRPC server wrapping one engine instance.

Mirror of reference ``embedding/replica.py``: batch tokenization happens
server-side (reference ``replica.py:197-210``), embeddings return as raw
little-endian fp32 bytes per prompt (``:235-237``).  Multiple replica
processes per chip are spawned/managed by ``replica_manager.py``.

Run:  python -m arcticinference_tpu.embedding.replica --port 50051 \
          --model <path-or-arch> [--config cfg.json]
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from concurrent import futures
from typing import Optional

import numpy as np

from arcticinference_tpu.config import EngineConfig
from arcticinference_tpu.embedding import codegen


class InferenceServicer:

    def __init__(self, llm, model_name: str):
        self.llm = llm
        self.model_name = model_name
        self.pb2 = codegen.load_pb2()
        self._lock = threading.Lock()   # serialises engine access
        self._meta = threading.Lock()   # counters + abort set (never
        self.active = 0                 # held across engine work, so
        self.total_requests = 0         # Abort can't deadlock a stream)
        self.total_tokens = 0
        self._aborted: set[str] = set()

    def Encode(self, request, context):
        pb2 = self.pb2
        if request.token_ids:
            ids = [np.frombuffer(t.token_id_bytes_i32,
                                 dtype="<i4").tolist()
                   for t in request.token_ids]
        elif request.prompts:
            if self.llm.tokenizer is None:
                context.abort(
                    13, "replica has no tokenizer; send token_ids")
            ids = [self.llm.tokenizer.encode(p) for p in request.prompts]
        else:
            context.abort(3, "prompts or token_ids required")
        pooling = request.pooling or "mean"
        with self._meta:
            if request.request_id in self._aborted:
                self._aborted.discard(request.request_id)
                context.abort(1, "aborted")
            self.active += 1
        try:
            with self._lock:
                embs = self.llm.encode(prompt_token_ids=ids,
                                       pooling=pooling)
        finally:
            with self._meta:
                self.active -= 1
                self.total_requests += 1
                self.total_tokens += sum(len(i) for i in ids)
        return pb2.EncodeResponse(
            request_id=request.request_id,
            embeddings=[np.asarray(e, "<f4").tobytes() for e in embs],
            dim=int(embs[0].shape[-1]) if embs else 0)

    def Generate(self, request, context):
        """Streaming generation (server-streaming RPC).

        The reference's client exposes a generate() API whose RPC its
        proto/server never implement; here the path works: the engine
        steps under the replica lock and each new committed token block
        streams back as a delta."""
        import uuid

        from arcticinference_tpu.engine.engine import PENDING_TOKEN
        from arcticinference_tpu.engine.request import SamplingParams

        pb2 = self.pb2
        eng = getattr(self.llm, "engine", None)
        if eng is None:
            context.abort(13, "encoder-only model: use Encode")
        if request.token_id_bytes_i32:
            ids = np.frombuffer(request.token_id_bytes_i32,
                                dtype="<i4").tolist()
        elif request.prompt:
            if self.llm.tokenizer is None:
                context.abort(13, "no tokenizer; send token_id_bytes_i32")
            ids = self.llm.tokenizer.encode(request.prompt)
        else:
            context.abort(3, "prompt or token ids required")
        sp = SamplingParams(
            max_tokens=request.max_tokens or 128,
            temperature=request.temperature,
            top_p=request.top_p or 1.0,
            top_k=request.top_k,
            ignore_eos=request.ignore_eos,
            stop=tuple(request.stop),
            seed=int(request.seed) if request.seed >= 0 else None)
        rid = request.request_id or f"gen-{uuid.uuid4().hex[:12]}"
        with self._meta:
            self.active += 1
        try:
            with self._lock:
                req = eng.add_request(rid, ids, sp)
            sent = 0
            sent_text = ""
            while not req.status.is_finished:
                with self._meta:
                    aborted = rid in self._aborted
                    self._aborted.discard(rid)
                if aborted:
                    with self._lock:
                        eng.abort_request(rid)
                    yield pb2.GenerateResponse(
                        request_id=rid, finished=True,
                        finish_reason="aborted")
                    return
                with self._lock:
                    eng.step()
                out = req.output_token_ids
                try:
                    known = out.index(PENDING_TOKEN)
                except ValueError:
                    known = len(out)
                new = out[sent:known]
                if new and not req.status.is_finished:
                    delta = ""
                    if self.llm.tokenizer is not None:
                        full = self.llm.tokenizer.decode(out[:known])
                        delta = full[len(sent_text):]
                        sent_text = full
                    yield pb2.GenerateResponse(
                        request_id=rid,
                        token_ids=[int(t) for t in new],
                        text_delta=delta)
                    sent = known
            delta = ""
            if self.llm.tokenizer is not None:
                full = (req.final_text if req.final_text is not None
                        else self.llm.tokenizer.decode(
                            req.output_token_ids))
                delta = full[len(sent_text):]
            yield pb2.GenerateResponse(
                request_id=rid,
                token_ids=[int(t) for t in req.output_token_ids[sent:]],
                text_delta=delta,
                finished=True,
                finish_reason=req.status.name.lower())
        finally:
            with self._meta:
                self.active -= 1
                self.total_requests += 1
                self.total_tokens += len(ids)

    def Abort(self, request, context):
        with self._lock:
            self._aborted.add(request.request_id)
        return self.pb2.AbortResponse(aborted=True)

    def GetReplicaInfo(self, request, context):
        return self.pb2.ReplicaInfoResponse(
            model=self.model_name,
            active_requests=self.active,
            total_requests=self.total_requests,
            total_tokens=self.total_tokens)

    def HealthCheck(self, request, context):
        return self.pb2.HealthCheckResponse(healthy=True)


def serve(config: EngineConfig, port: int,
          max_workers: int = 8) -> "grpc.Server":
    import grpc

    from arcticinference_tpu.engine.llm import LLM

    llm = LLM(config)
    servicer = InferenceServicer(llm, config.model.model)
    server = grpc.server(
        futures.ThreadPoolExecutor(max_workers=max_workers))
    codegen.add_servicer_to_server(servicer, server)
    server.add_insecure_port(f"[::]:{port}")
    server.start()
    return server




def _maybe_force_cpu() -> None:
    """ARCTIC_TPU_FORCE_CPU=1 pins JAX to host CPU (the axon TPU plugin
    overrides JAX_PLATFORMS, so tests/subprocesses need this hook)."""
    import os

    if os.environ.get("ARCTIC_TPU_FORCE_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")

def main() -> None:
    _maybe_force_cpu()
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, required=True)
    parser.add_argument("--model", default=None)
    parser.add_argument("--config", default=None)
    args = parser.parse_args()
    if args.config:
        cfg = EngineConfig.from_dict(json.loads(open(args.config).read()))
    else:
        cfg = EngineConfig()
    if args.model:
        cfg.model.model = args.model
        cfg.model.tokenizer = args.model
    server = serve(cfg, args.port)
    print(f"replica ready on :{args.port}", flush=True)
    server.wait_for_termination()


if __name__ == "__main__":
    main()
