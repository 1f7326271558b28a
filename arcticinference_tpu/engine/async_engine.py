"""Async engine: background step loop + per-request token streams.

The role vLLM's AsyncLLMEngine plays for the reference's servers.  The
blocking device step loop runs in a dedicated thread; token deltas are
pushed into per-request asyncio queues via the event loop.
"""

from __future__ import annotations

import asyncio
import threading
import uuid
from dataclasses import dataclass, field
from typing import AsyncIterator, Optional

from arcticinference_tpu.config import EngineConfig
from arcticinference_tpu.engine.engine import LLMEngine, PENDING_TOKEN
from arcticinference_tpu.engine.request import Request, SamplingParams


@dataclass
class StreamChunk:
    req_id: str
    new_token_ids: list[int]
    finished: bool
    finish_reason: Optional[str] = None
    logprobs: Optional[list] = None


class AsyncLLMEngine:

    def __init__(self, config: EngineConfig):
        self.dead = False
        self.dead_reason: Optional[str] = None
        # Engine-loop liveness stamp: a wedged device step stops
        # advancing it, which /health surfaces as "stalled" so routers
        # pull the replica (reference analogue: vLLM's worker monitor).
        self.last_progress = __import__("time").time()
        self.stall_timeout_s = 60.0
        self.engine = LLMEngine(config)
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._queues: dict[str, asyncio.Queue] = {}
        self._sent_len: dict[str, int] = {}
        self._lock = threading.Lock()
        self._engine_lock = threading.Lock()  # serialises engine mutation
        self._wake = threading.Event()
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=5)
        ch = self.engine.runner.mh_channel
        if ch is not None:
            ch.close()  # broadcasts stop so follower processes exit

    # -- background loop (engine thread) --------------------------------

    def mark_dead(self, reason: str) -> None:
        """Fail the engine from outside (e.g. the multihost watchdog):
        reject new requests and error every live stream.  A step blocked
        inside a collective cannot be cancelled, but clients see a clean
        error instead of a silent hang."""
        import logging

        logging.getLogger("arcticinference_tpu").error(
            "engine marked dead: %s", reason)
        self.dead = True
        self.dead_reason = reason
        with self._lock:
            for req_id, q in self._queues.items():
                self._push(q, StreamChunk(req_id, [], True,
                                          "engine_error"))
            self._queues.clear()

    @property
    def stalled(self) -> bool:
        import time as _t

        return (self.engine.has_unfinished
                and _t.time() - self.last_progress > self.stall_timeout_s)

    def _run(self) -> None:
        import time as _t

        while not self._stop:
            self.last_progress = _t.time()
            if not self.engine.has_unfinished:
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            try:
                with self._engine_lock:
                    finished = {r.req_id: r for r in self.engine.step()}
            except Exception:  # noqa: BLE001 — engine died; fail streams
                import logging, traceback

                logging.getLogger("arcticinference_tpu").error(
                    "engine step failed:\n%s", traceback.format_exc())
                self.dead = True
                with self._lock:
                    for req_id, q in self._queues.items():
                        self._push(q, StreamChunk(req_id, [], True,
                                                  "engine_error"))
                    self._queues.clear()
                return
            with self._lock:
                items = list(self._queues.items())
            for req_id, q in items:
                req = finished.get(req_id)
                if req is None:
                    req = self._find_request(req_id)
                    if req is None:
                        continue
                sent = self._sent_len.get(req_id, 0)
                out = req.output_token_ids
                # Only the host-known prefix is streamable (async
                # scheduling leaves device-resident placeholders).
                try:
                    visible = out.index(PENDING_TOKEN)
                except ValueError:
                    visible = len(out)
                new = out[sent:visible]
                done = req.status.is_finished
                if new or done:
                    self._sent_len[req_id] = sent + len(new)
                    chunk = StreamChunk(
                        req_id=req_id, new_token_ids=list(new),
                        finished=done,
                        finish_reason=(req.status.name.lower()
                                       if done else None),
                        logprobs=(list(req.output_logprobs)
                                  if done and req.output_logprobs
                                  else None))
                    self._push(q, chunk)
                if done:
                    with self._lock:
                        self._queues.pop(req_id, None)
                        self._sent_len.pop(req_id, None)

    def _find_request(self, req_id: str) -> Optional[Request]:
        for r in self.engine.scheduler.running:
            if r.req_id == req_id:
                return r
        for r in self.engine.scheduler.waiting:
            if r.req_id == req_id:
                return r
        return None

    def _push(self, q: asyncio.Queue, chunk: StreamChunk) -> None:
        loop = self._loop
        if loop is not None and loop.is_running():
            loop.call_soon_threadsafe(q.put_nowait, chunk)

    # -- client API (event loop) -----------------------------------------

    async def generate(
        self,
        prompt_token_ids: list[int],
        sampling: Optional[SamplingParams] = None,
        req_id: Optional[str] = None,
    ) -> AsyncIterator[StreamChunk]:
        """Submit a request; yields StreamChunks until finished."""
        if self.dead:
            raise RuntimeError("engine is dead (see server logs)")
        self._loop = asyncio.get_running_loop()
        req_id = req_id or f"req-{uuid.uuid4().hex[:12]}"
        q: asyncio.Queue = asyncio.Queue()
        with self._lock:
            self._queues[req_id] = q
            self._sent_len[req_id] = 0
        with self._engine_lock:
            self.engine.add_request(req_id, prompt_token_ids, sampling)
        self._wake.set()
        while True:
            chunk = await q.get()
            yield chunk
            if chunk.finished:
                return

    async def abort(self, req_id: str) -> None:
        with self._engine_lock:
            self.engine.abort_request(req_id)
        with self._lock:
            q = self._queues.pop(req_id, None)
            self._sent_len.pop(req_id, None)
        if q is not None:
            self._push(q, StreamChunk(req_id, [], True, "aborted"))
