"""Replica manager: spawn N replica processes, health-check, load-balance.

Mirror of reference ``embedding/replica_manager.py:73-447``: replicas run
on consecutive ports, a health loop marks them (un)healthy, routing picks
``round_robin`` / ``least_loaded`` / ``random`` and failed calls retry on
another healthy replica.  The manager itself also exposes the same gRPC
InferenceService, forwarding Encode to the chosen replica.
"""

from __future__ import annotations

import argparse
import json
import random
import subprocess
import sys
import threading
import time
from concurrent import futures
from dataclasses import dataclass, field
from typing import Optional

import grpc

from arcticinference_tpu.embedding import codegen


@dataclass
class Replica:
    port: int
    process: Optional[subprocess.Popen] = None
    healthy: bool = False
    inflight: int = 0
    channel: Optional[grpc.Channel] = None
    stub: Optional[codegen.InferenceStub] = None

    def connect(self) -> None:
        if self.channel is None:
            self.channel = grpc.insecure_channel(f"localhost:{self.port}")
            self.stub = codegen.InferenceStub(self.channel)


class ReplicaManager:

    def __init__(self, base_port: int, num_replicas: int,
                 replica_args: list[str],
                 policy: str = "round_robin",
                 spawn: bool = True,
                 health_interval: float = 2.0,
                 startup_timeout: float = 600.0):
        assert policy in ("round_robin", "least_loaded", "random")
        self.policy = policy
        self.replicas = [Replica(port=base_port + i)
                         for i in range(num_replicas)]
        self._rr = 0
        self._lock = threading.Lock()
        self._stop = False
        self.startup_timeout = startup_timeout
        if spawn:
            for r in self.replicas:
                r.process = subprocess.Popen(
                    [sys.executable, "-m",
                     "arcticinference_tpu.embedding.replica",
                     "--port", str(r.port), *replica_args])
        for r in self.replicas:
            r.connect()
        self._health_thread = threading.Thread(
            target=self._health_loop, args=(health_interval,), daemon=True)
        self._health_thread.start()

    # -- health ---------------------------------------------------------

    def _check(self, r: Replica) -> bool:
        try:
            pb2 = codegen.load_pb2()
            resp = r.stub.HealthCheck(pb2.HealthCheckRequest(), timeout=2)
            return bool(resp.healthy)
        except grpc.RpcError:
            return False

    def _health_loop(self, interval: float) -> None:
        while not self._stop:
            for r in self.replicas:
                if r.process is not None and r.process.poll() is not None:
                    r.healthy = False  # process died
                    continue
                r.healthy = self._check(r)
            time.sleep(interval)

    def wait_ready(self, min_replicas: int = 1) -> None:
        deadline = time.time() + self.startup_timeout
        while time.time() < deadline:
            for r in self.replicas:
                if r.process is not None and r.process.poll() is not None:
                    raise RuntimeError(
                        f"replica :{r.port} exited prematurely "
                        f"(code {r.process.returncode})")
            if sum(self._check(r) for r in self.replicas) >= min_replicas:
                return
            time.sleep(1.0)
        raise TimeoutError("replicas did not become healthy in time")

    # -- routing --------------------------------------------------------

    def select(self) -> Replica:
        with self._lock:
            healthy = [r for r in self.replicas if r.healthy]
            if not healthy:
                raise RuntimeError("no healthy replicas")
            if self.policy == "round_robin":
                r = healthy[self._rr % len(healthy)]
                self._rr += 1
            elif self.policy == "least_loaded":
                r = min(healthy, key=lambda x: x.inflight)
            else:
                r = random.choice(healthy)
            r.inflight += 1
            return r

    def release(self, r: Replica) -> None:
        with self._lock:
            r.inflight = max(0, r.inflight - 1)

    def route_encode(self, request, retries: int = 2):
        last_err = None
        for _ in range(retries + 1):
            r = self.select()
            try:
                return r.stub.Encode(request, timeout=300)
            except grpc.RpcError as e:
                last_err = e
                r.healthy = False
            finally:
                self.release(r)
        raise last_err

    def shutdown(self) -> None:
        self._stop = True
        for r in self.replicas:
            if r.process is not None:
                r.process.terminate()
        for r in self.replicas:
            if r.process is not None:
                try:
                    r.process.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    r.process.kill()


class ManagerServicer:
    """gRPC facade: same InferenceService, requests routed to replicas."""

    def __init__(self, manager: ReplicaManager):
        self.manager = manager
        self.pb2 = codegen.load_pb2()

    def Encode(self, request, context):
        try:
            return self.manager.route_encode(request)
        except grpc.RpcError as e:
            context.abort(e.code().value[0] if e.code() else 13, str(e))
        except RuntimeError as e:
            context.abort(14, str(e))

    def Abort(self, request, context):
        ok = False
        for r in self.manager.replicas:
            if r.healthy:
                try:
                    resp = r.stub.Abort(request, timeout=5)
                    ok = ok or resp.aborted
                except grpc.RpcError:
                    pass
        return self.pb2.AbortResponse(aborted=ok)

    def GetReplicaInfo(self, request, context):
        total_reqs = total_toks = active = 0
        model = ""
        for r in self.manager.replicas:
            if not r.healthy:
                continue
            try:
                info = r.stub.GetReplicaInfo(request, timeout=5)
                model = info.model
                active += info.active_requests
                total_reqs += info.total_requests
                total_toks += info.total_tokens
            except grpc.RpcError:
                pass
        return self.pb2.ReplicaInfoResponse(
            model=model, active_requests=active,
            total_requests=total_reqs, total_tokens=total_toks)

    def HealthCheck(self, request, context):
        healthy = any(r.healthy for r in self.manager.replicas)
        return self.pb2.HealthCheckResponse(healthy=healthy)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, required=True)
    parser.add_argument("--num-replicas", type=int, default=1)
    parser.add_argument("--replica-base-port", type=int, default=None)
    parser.add_argument("--policy", default="round_robin",
                        choices=["round_robin", "least_loaded", "random"])
    parser.add_argument("--model", default=None)
    parser.add_argument("--config", default=None)
    args = parser.parse_args()

    replica_args = []
    if args.model:
        replica_args += ["--model", args.model]
    if args.config:
        replica_args += ["--config", args.config]
    base = args.replica_base_port or args.port + 1
    manager = ReplicaManager(base, args.num_replicas, replica_args,
                             policy=args.policy)
    manager.wait_ready(min_replicas=args.num_replicas)

    server = grpc.server(futures.ThreadPoolExecutor(max_workers=16))
    codegen.add_servicer_to_server(ManagerServicer(manager), server)
    server.add_insecure_port(f"[::]:{args.port}")
    server.start()
    print(f"manager ready on :{args.port} "
          f"({args.num_replicas} replicas)", flush=True)
    try:
        server.wait_for_termination()
    finally:
        manager.shutdown()


if __name__ == "__main__":
    main()
