"""Dynasor proxy: OpenAI-compatible streaming proxy with CoT early exit.

Mirror of reference ``dynasor/openai_server.py`` + ``cot.py``: streams a
chat completion from the backend while periodically probing it ("...
**Final Answer** \\boxed{" appended to the partial CoT, reference
``cot.py:20-190``); when the last N probe answers agree (certainty
window), the proxy stops the stream, emits the converged answer and
aborts the backend request — cutting reasoning tokens massively on easy
problems.

Backend-agnostic: works against any /v1/completions-speaking server
(including ours).

Run:
  python -m arcticinference_tpu.dynasor.proxy --backend http://...:8000 \
      --port 8001 [--probe-interval 64] [--certainty-window 2]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time
import uuid
from typing import Optional

import aiohttp
from aiohttp import web

from arcticinference_tpu.dynasor.entropy import should_early_exit
from arcticinference_tpu.dynasor.evaluator import extract_answer

PROBE_SUFFIX = "... Oh, I suddenly got the answer to the whole problem, " \
               "**Final Answer**: \\boxed{"


class DynasorProxy:

    def __init__(self, backend: str, probe_interval: int = 64,
                 certainty_window: int = 2, probe_max_tokens: int = 20):
        self.backend = backend.rstrip("/")
        self.probe_interval = probe_interval
        self.certainty_window = certainty_window
        self.probe_max_tokens = probe_max_tokens
        self.app = web.Application()
        self.app.add_routes([
            web.post("/v1/chat/completions", self.chat),
            web.post("/v1/completions", self.completions),
            web.get("/health", self.health),
        ])
        self._session: Optional[aiohttp.ClientSession] = None
        self.app.on_cleanup.append(self._cleanup)

    async def _cleanup(self, app) -> None:
        if self._session is not None:
            await self._session.close()

    def session(self) -> aiohttp.ClientSession:
        if self._session is None or self._session.closed:
            self._session = aiohttp.ClientSession()
        return self._session

    async def health(self, request: web.Request) -> web.Response:
        try:
            async with self.session().get(
                    f"{self.backend}/health", timeout=aiohttp.ClientTimeout(
                        total=5)) as r:
                ok = r.status == 200
        except Exception:
            ok = False
        return web.json_response({"status": "ok" if ok else "backend_down"})

    async def completions(self, request: web.Request) -> web.Response:
        """Plain passthrough for non-chat completions."""
        body = await request.json()
        async with self.session().post(
                f"{self.backend}/v1/completions", json=body) as r:
            if body.get("stream"):
                resp = web.StreamResponse(
                    headers={"Content-Type": "text/event-stream"})
                await resp.prepare(request)
                async for chunk in r.content.iter_any():
                    await resp.write(chunk)
                await resp.write_eof()
                return resp
            return web.json_response(await r.json(), status=r.status)

    # ------------------------------------------------------------------ #
    # Chat with probing
    # ------------------------------------------------------------------ #

    async def _probe(self, prompt_text: str) -> tuple[str, Optional[str]]:
        """Ask the backend to finish the CoT with the probe suffix."""
        body = {
            "prompt": prompt_text + PROBE_SUFFIX,
            "max_tokens": self.probe_max_tokens,
            "temperature": 0.0,
        }
        try:
            async with self.session().post(
                    f"{self.backend}/v1/completions", json=body,
                    timeout=aiohttp.ClientTimeout(total=120)) as r:
                data = await r.json()
            text = data["choices"][0].get("text", "")
        except Exception:
            return "", None
        return text, extract_answer("\\boxed{" + text)

    async def chat(self, request: web.Request) -> web.Response:
        body = await request.json()
        messages = body.get("messages") or []
        stream = bool(body.get("stream"))
        rid = f"chatcmpl-{uuid.uuid4().hex[:16]}"

        prompt_text = "\n".join(
            f"{m.get('role')}: {m.get('content')}" for m in messages
        ) + "\nassistant:"

        backend_body = {
            "prompt": prompt_text,
            "max_tokens": body.get("max_tokens", 2048),
            "temperature": body.get("temperature", 0.0),
            "stream": True,
        }

        resp = None
        if stream:
            resp = web.StreamResponse(headers={
                "Content-Type": "text/event-stream"})
            await resp.prepare(request)

        generated = ""
        probe_answers: list[Optional[str]] = []
        probe_texts: list[str] = []
        probe_task: Optional[asyncio.Task] = None
        exited_early = False
        tokens_seen = 0
        next_probe_at = self.probe_interval

        async def emit(delta: str, finish: Optional[str] = None):
            if resp is None:
                return
            payload = {
                "id": rid, "object": "chat.completion.chunk",
                "created": int(time.time()),
                "choices": [{"index": 0,
                             "delta": {"content": delta},
                             "finish_reason": finish}],
            }
            await resp.write(f"data: {json.dumps(payload)}\n\n".encode())

        # try/finally plays the reference's ``with_cancellation`` role
        # (dynasor/util.py:28-69): a client disconnect cancels this
        # handler mid-stream; the in-flight probe task must not leak.
        try:
            async with self.session().post(
                    f"{self.backend}/v1/completions",
                    json=backend_body) as r:
                async for raw in r.content:
                    line = raw.decode().strip()
                    if not line.startswith("data: "):
                        continue
                    data = line[6:]
                    if data == "[DONE]":
                        break
                    chunk = json.loads(data)
                    text = chunk["choices"][0].get("text", "")
                    ntoks = len(
                        chunk["choices"][0].get("token_ids", [])) or 1
                    generated += text
                    tokens_seen += ntoks
                    await emit(text)

                    if probe_task is not None and probe_task.done():
                        ptext, ans = probe_task.result()
                        probe_texts.append(ptext)
                        probe_answers.append(ans)
                        probe_task = None
                        if should_early_exit(probe_answers, probe_texts,
                                             self.certainty_window):
                            exited_early = True
                            break
                    if tokens_seen >= next_probe_at and probe_task is None:
                        next_probe_at = tokens_seen + self.probe_interval
                        probe_task = asyncio.ensure_future(
                            self._probe(prompt_text + generated))
        finally:
            if probe_task is not None:
                probe_task.cancel()

        final_answer = probe_answers[-1] if exited_early else None
        if exited_early and final_answer:
            suffix = (f"\n\n**Final Answer** (early exit): "
                      f"\\boxed{{{final_answer}}}")
            generated += suffix
            await emit(suffix, finish="stop")
        else:
            await emit("", finish="stop")

        if resp is not None:
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp
        return web.json_response({
            "id": rid, "object": "chat.completion",
            "created": int(time.time()),
            "choices": [{
                "index": 0,
                "message": {"role": "assistant", "content": generated},
                "finish_reason": "stop",
            }],
            "dynasor": {"early_exit": exited_early,
                        "probes": len(probe_answers)},
        })


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--backend", required=True,
                        help="base URL of the OpenAI-compatible backend")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8001)
    parser.add_argument("--probe-interval", type=int, default=64)
    parser.add_argument("--certainty-window", type=int, default=2)
    args = parser.parse_args()
    proxy = DynasorProxy(args.backend, args.probe_interval,
                         args.certainty_window)
    web.run_app(proxy.app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
