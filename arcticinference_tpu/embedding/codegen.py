"""Lazy protoc codegen + hand-written gRPC glue.

grpc_tools is not available in this environment, but protoc is: messages
are generated with ``protoc --python_out`` at first import (cached by
source hash) and the thin service/stub glue that grpc_tools would emit is
written by hand below (reference builds it in setup.py:161-171).
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import threading
from pathlib import Path

import grpc

_PROTO_DIR = Path(__file__).resolve().parent / "proto"
_GEN_DIR = _PROTO_DIR / "_gen"
_LOCK = threading.Lock()
_pb2 = None

SERVICE_NAME = "arcticinference_tpu.embedding.InferenceService"


def load_pb2():
    """Generate (if needed) and import inference_pb2."""
    global _pb2
    with _LOCK:
        if _pb2 is not None:
            return _pb2
        src = _PROTO_DIR / "inference.proto"
        tag = hashlib.sha256(src.read_bytes()).hexdigest()[:12]
        stamp = _GEN_DIR / f".stamp-{tag}"
        if not stamp.exists():
            _GEN_DIR.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["protoc", f"--python_out={_GEN_DIR}",
                 f"-I{_PROTO_DIR}", str(src)],
                check=True, capture_output=True, text=True)
            stamp.touch()
        sys.path.insert(0, str(_GEN_DIR))
        try:
            import inference_pb2  # noqa: F401
        finally:
            sys.path.remove(str(_GEN_DIR))
        _pb2 = inference_pb2
        return _pb2


_METHODS = ("Encode", "Abort", "GetReplicaInfo", "HealthCheck")
#: server-streaming methods (one request -> a response stream)
_STREAM_METHODS = ("Generate",)
_REQ_TYPES = {
    "Encode": "EncodeRequest", "Abort": "AbortRequest",
    "GetReplicaInfo": "ReplicaInfoRequest",
    "HealthCheck": "HealthCheckRequest",
    "Generate": "GenerateRequest",
}
_RESP_TYPES = {
    "Encode": "EncodeResponse", "Abort": "AbortResponse",
    "GetReplicaInfo": "ReplicaInfoResponse",
    "HealthCheck": "HealthCheckResponse",
    "Generate": "GenerateResponse",
}


def add_servicer_to_server(servicer, server) -> None:
    pb2 = load_pb2()
    handlers = {}
    for m in _METHODS:
        resp = getattr(pb2, _RESP_TYPES[m])
        req = getattr(pb2, _REQ_TYPES[m])
        handlers[m] = grpc.unary_unary_rpc_method_handler(
            getattr(servicer, m),
            request_deserializer=req.FromString,
            response_serializer=resp.SerializeToString)
    for m in _STREAM_METHODS:
        if not hasattr(servicer, m):
            continue
        resp = getattr(pb2, _RESP_TYPES[m])
        req = getattr(pb2, _REQ_TYPES[m])
        handlers[m] = grpc.unary_stream_rpc_method_handler(
            getattr(servicer, m),
            request_deserializer=req.FromString,
            response_serializer=resp.SerializeToString)
    server.add_generic_rpc_handlers(
        (grpc.method_handlers_generic_handler(SERVICE_NAME, handlers),))


class InferenceStub:
    """Sync stub (the async twin lives in client.py)."""

    def __init__(self, channel: grpc.Channel):
        pb2 = load_pb2()
        for m in _METHODS:
            req = getattr(pb2, _REQ_TYPES[m])
            resp = getattr(pb2, _RESP_TYPES[m])
            setattr(self, m, channel.unary_unary(
                f"/{SERVICE_NAME}/{m}",
                request_serializer=req.SerializeToString,
                response_deserializer=resp.FromString))
        for m in _STREAM_METHODS:
            req = getattr(pb2, _REQ_TYPES[m])
            resp = getattr(pb2, _RESP_TYPES[m])
            setattr(self, m, channel.unary_stream(
                f"/{SERVICE_NAME}/{m}",
                request_serializer=req.SerializeToString,
                response_deserializer=resp.FromString))


class AsyncInferenceStub:
    def __init__(self, channel: "grpc.aio.Channel"):
        pb2 = load_pb2()
        for m in _METHODS:
            req = getattr(pb2, _REQ_TYPES[m])
            resp = getattr(pb2, _RESP_TYPES[m])
            setattr(self, m, channel.unary_unary(
                f"/{SERVICE_NAME}/{m}",
                request_serializer=req.SerializeToString,
                response_deserializer=resp.FromString))
        for m in _STREAM_METHODS:
            req = getattr(pb2, _REQ_TYPES[m])
            resp = getattr(pb2, _RESP_TYPES[m])
            setattr(self, m, channel.unary_stream(
                f"/{SERVICE_NAME}/{m}",
                request_serializer=req.SerializeToString,
                response_deserializer=resp.FromString))
