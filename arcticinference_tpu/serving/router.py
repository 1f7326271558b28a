"""Data-parallel replica router for the LLM serving surface.

Multi-host scaling story, part 1 (DP over hosts): N independent engine
replicas — each an ``openai_server`` process owning its own chips/mesh —
behind one OpenAI-compatible endpoint.  This is the LLM analogue of the
reference's embedding replica manager (health loop, round-robin /
least-loaded / random selection, load accounting, retry-on-failure:
reference ``embedding/replica_manager.py:73-79,305-346``), speaking
HTTP/SSE instead of gRPC because the LLM surface streams tokens.

The router is engine-agnostic: backends can be local subprocesses
(``--spawn N``, one per replica, e.g. one per TPU slice on this host)
or remote hosts (``--backends http://host-a:8000,http://host-b:8000``),
which is how a 2-host DP deployment is assembled — each host runs its
own sharded engine over its own mesh; DCN only carries requests, never
activations (the cheap axis, per the scaling-book recipe).

Streaming requests proxy chunk-by-chunk; failover retries on a
different healthy replica only if no bytes have been forwarded yet.
"""

from __future__ import annotations

import argparse
import asyncio
import itertools
import json
import logging
import os
import random
import subprocess
import sys
import time
from dataclasses import dataclass, field
from typing import Optional

from aiohttp import ClientSession, ClientTimeout, web

logger = logging.getLogger("arcticinference_tpu.router")

_PROXY_ROUTES = ("/v1/completions", "/v1/chat/completions")


@dataclass
class Backend:
    url: str
    healthy: bool = False
    inflight: int = 0
    total_requests: int = 0
    failures: int = 0
    proc: Optional[subprocess.Popen] = None
    last_check: float = field(default=0.0)
    # Wedge detection / restart (spawned replicas only): when a replica
    # stays unhealthy (including "stalled" 503s from a wedged engine
    # thread) past restart_after, the router kills and respawns it
    # (reference embedding manager restarts dead replicas the same way).
    unhealthy_since: float = 0.0
    restarts: int = 0
    spawn_cmd: Optional[list] = None
    spawn_env: Optional[dict] = None


class LLMRouter:

    def __init__(self, backends: list[str], policy: str = "round_robin",
                 health_interval: float = 2.0, retries: int = 2,
                 request_timeout: float = 600.0,
                 restart_after: float = 30.0):
        assert policy in ("round_robin", "least_loaded", "random")
        self.backends = [Backend(url=u.rstrip("/")) for u in backends]
        self.policy = policy
        self.health_interval = health_interval
        self.restart_after = restart_after
        self.retries = retries
        self.request_timeout = request_timeout
        self._rr = itertools.count()
        self._session: Optional[ClientSession] = None
        self.app = web.Application()
        self.app.router.add_get("/health", self.health)
        self.app.router.add_get("/replicas", self.replicas)
        self.app.router.add_get("/v1/models", self.models)
        for route in _PROXY_ROUTES:
            self.app.router.add_post(route, self.proxy)
        self.app.on_startup.append(self._on_startup)
        self.app.on_cleanup.append(self._on_cleanup)

    # -- lifecycle -------------------------------------------------------

    async def _on_startup(self, app) -> None:
        self._session = ClientSession(
            timeout=ClientTimeout(total=self.request_timeout))
        self._health_task = asyncio.create_task(self._health_loop())

    async def _on_cleanup(self, app) -> None:
        self._health_task.cancel()
        if self._session is not None:
            await self._session.close()
        for b in self.backends:
            if b.proc is not None and b.proc.poll() is None:
                b.proc.terminate()

    async def _check(self, b: Backend) -> None:
        try:
            async with self._session.get(
                    b.url + "/health",
                    timeout=ClientTimeout(total=2.0)) as resp:
                ok = resp.status == 200
        except Exception:
            ok = False
        if ok and not b.healthy:
            logger.info("backend %s healthy", b.url)
        if not ok and b.healthy:
            logger.warning("backend %s unhealthy", b.url)
        if not ok and b.unhealthy_since == 0.0:
            b.unhealthy_since = time.time()
        if ok:
            b.unhealthy_since = 0.0
        b.healthy = ok
        b.last_check = time.time()

    def _maybe_restart(self, b: Backend) -> None:
        """Kill + respawn a managed replica that exited or wedged."""
        if b.spawn_cmd is None:
            return
        exited = b.proc is not None and b.proc.poll() is not None
        wedged = (b.unhealthy_since > 0.0
                  and time.time() - b.unhealthy_since > self.restart_after)
        if not (exited or wedged):
            return
        why = "exited" if exited else "wedged"
        logger.error("backend %s %s; restarting", b.url, why)
        if b.proc is not None and b.proc.poll() is None:
            b.proc.kill()
            b.proc.wait()
        b.proc = subprocess.Popen(b.spawn_cmd, env=b.spawn_env)
        b.restarts += 1
        b.healthy = False
        b.unhealthy_since = time.time()  # grace restarts from now

    async def _health_loop(self) -> None:
        while True:
            await asyncio.gather(*(self._check(b) for b in self.backends))
            for b in self.backends:
                if not b.healthy:
                    self._maybe_restart(b)
            await asyncio.sleep(self.health_interval)

    async def wait_ready(self, min_replicas: int = 1,
                         timeout: float = 300.0) -> None:
        deadline = time.time() + timeout
        while time.time() < deadline:
            await asyncio.gather(*(self._check(b) for b in self.backends))
            if sum(b.healthy for b in self.backends) >= min_replicas:
                return
            await asyncio.sleep(1.0)
        raise TimeoutError(
            f"fewer than {min_replicas} healthy replicas after {timeout}s")

    # -- selection (reference replica_manager.py:105-122) ----------------

    def select(self) -> Optional[Backend]:
        healthy = [b for b in self.backends if b.healthy]
        if not healthy:
            return None
        if self.policy == "least_loaded":
            return min(healthy, key=lambda b: b.inflight)
        if self.policy == "random":
            return random.choice(healthy)
        return healthy[next(self._rr) % len(healthy)]

    # -- handlers --------------------------------------------------------

    async def health(self, request: web.Request) -> web.Response:
        n = sum(b.healthy for b in self.backends)
        status = 200 if n else 503
        return web.json_response(
            {"healthy_replicas": n, "total_replicas": len(self.backends)},
            status=status)

    async def replicas(self, request: web.Request) -> web.Response:
        return web.json_response({
            "policy": self.policy,
            "replicas": [{
                "url": b.url, "healthy": b.healthy,
                "inflight": b.inflight,
                "total_requests": b.total_requests,
                "failures": b.failures,
                "restarts": b.restarts,
            } for b in self.backends]})

    async def models(self, request: web.Request) -> web.Response:
        b = self.select()
        if b is None:
            raise web.HTTPServiceUnavailable(text="no healthy replicas")
        async with self._session.get(b.url + "/v1/models") as resp:
            return web.json_response(await resp.json(),
                                     status=resp.status)

    async def proxy(self, request: web.Request) -> web.StreamResponse:
        body = await request.read()
        path = request.path
        tried: set[str] = set()
        for attempt in range(self.retries + 1):
            b = self.select()
            if b is None or (b.url in tried and
                             len(tried) >= sum(x.healthy
                                               for x in self.backends)):
                break
            tried.add(b.url)
            b.inflight += 1
            b.total_requests += 1
            streamed = False
            try:
                async with self._session.post(
                        b.url + path, data=body,
                        headers={"Content-Type": "application/json"}) \
                        as resp:
                    ctype = resp.headers.get("Content-Type", "")
                    if resp.status >= 500:
                        raise RuntimeError(f"backend 5xx: {resp.status}")
                    if "text/event-stream" in ctype:
                        out = web.StreamResponse(
                            status=resp.status,
                            headers={"Content-Type": ctype,
                                     "Cache-Control": "no-cache"})
                        await out.prepare(request)
                        streamed = True
                        async for chunk in resp.content.iter_any():
                            await out.write(chunk)
                        await out.write_eof()
                        return out
                    data = await resp.read()
                    return web.Response(
                        body=data, status=resp.status,
                        content_type="application/json")
            except Exception as exc:  # noqa: BLE001 — retry/failover
                b.failures += 1
                b.healthy = False if not isinstance(exc, web.HTTPException) \
                    else b.healthy
                if streamed:
                    # Bytes already forwarded: cannot replay elsewhere.
                    raise web.HTTPInternalServerError(
                        text="backend failed mid-stream")
                logger.warning("backend %s failed (%s); retrying",
                               b.url, exc)
            finally:
                b.inflight -= 1
        raise web.HTTPServiceUnavailable(text="no healthy replicas")


# ----------------------------------------------------------------------- #
# Replica spawning (local DP: one engine process per replica)
# ----------------------------------------------------------------------- #

def spawn_replicas(config_path: str, num_replicas: int, base_port: int,
                   host: str = "127.0.0.1",
                   extra_env: Optional[dict] = None) -> list[Backend]:
    """Launch N openai_server subprocesses on consecutive ports (the
    reference spawns embedding replicas the same way,
    ``replica_manager.py:241-289``)."""
    backends = []
    for i in range(num_replicas):
        port = base_port + i
        env = dict(os.environ)
        env["ARCTIC_TPU_REPLICA_RANK"] = str(i)
        if extra_env:
            env.update(extra_env)
        cmd = [sys.executable, "-m",
               "arcticinference_tpu.serving.openai_server",
               "--config", config_path, "--port", str(port),
               "--host", host]
        proc = subprocess.Popen(cmd, env=env)
        backends.append(Backend(url=f"http://{host}:{port}", proc=proc,
                                spawn_cmd=cmd, spawn_env=env))
    return backends


def main() -> None:
    parser = argparse.ArgumentParser(
        description="OpenAI-compatible DP replica router")
    parser.add_argument("--backends", default=None,
                        help="comma-separated replica URLs (remote hosts)")
    parser.add_argument("--spawn", type=int, default=0,
                        help="spawn N local replica servers")
    parser.add_argument("--config", default=None,
                        help="EngineConfig JSON for spawned replicas")
    parser.add_argument("--base-port", type=int, default=8100)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--policy", default="round_robin",
                        choices=["round_robin", "least_loaded", "random"])
    parser.add_argument("--health-interval", type=float, default=2.0)
    parser.add_argument("--min-replicas", type=int, default=1)
    args = parser.parse_args()

    urls: list[str] = []
    spawned: list[Backend] = []
    if args.backends:
        urls.extend(u for u in args.backends.split(",") if u)
    if args.spawn:
        if not args.config:
            parser.error("--spawn requires --config")
        spawned = spawn_replicas(args.config, args.spawn, args.base_port)
        urls.extend(b.url for b in spawned)
    if not urls:
        parser.error("need --backends and/or --spawn")

    router = LLMRouter(urls, policy=args.policy,
                       health_interval=args.health_interval)
    for b, sb in zip(router.backends[-len(spawned):] if spawned else [],
                     spawned):
        b.proc = sb.proc

    async def _ready(app):
        await router.wait_ready(args.min_replicas)
    router.app.on_startup.append(_ready)
    web.run_app(router.app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
