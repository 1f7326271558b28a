"""OpenAI-compatible HTTP server (aiohttp).

The reference serves through vLLM's FastAPI server; this engine owns its
own frontend.  Endpoints: /v1/completions, /v1/chat/completions (incl.
SSE streaming), /v1/models, /health, /metrics (JSON engine stats).

Run:  python -m arcticinference_tpu.serving.openai_server --model ... \
          --port 8000 [--config config.json]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
import time
import uuid
from typing import Any, Optional

from aiohttp import web

from arcticinference_tpu.config import EngineConfig, ModelConfig, \
    SpeculativeConfig
from arcticinference_tpu.engine.async_engine import AsyncLLMEngine
from arcticinference_tpu.engine.request import SamplingParams


class OpenAIServer:

    def __init__(self, config: EngineConfig,
                 served_model_name: Optional[str] = None):
        self.config = config
        # Encoder architectures (BERT family) serve /v1/embeddings from
        # the dense EncoderRunner instead of the decode engine —
        # OpenAI-embeddings parity with the reference's vLLM encode mode
        # (reference ``embedding/replica.py:213-237`` over HTTP).
        from arcticinference_tpu.engine.llm import _is_encoder_arch

        self.encoder = None
        self.engine = None
        if _is_encoder_arch(config):
            from arcticinference_tpu.engine.encoder import EncoderRunner

            self.encoder = EncoderRunner(config)
            self._encode_lock = None  # created lazily on the event loop
        else:
            self.engine = AsyncLLMEngine(config)
        self.model_name = served_model_name or config.model.model
        self.tokenizer = self._load_tokenizer()
        if self.engine is not None and self.tokenizer is not None:
            # String stop sequences are detected inside the engine loop.
            self.engine.engine.tokenizer = self.tokenizer
        self.app = web.Application()
        self.app.add_routes([
            web.post("/v1/completions", self.completions),
            web.post("/v1/chat/completions", self.chat_completions),
            web.post("/v1/embeddings", self.embeddings),
            web.get("/v1/models", self.models),
            web.get("/health", self.health),
            web.get("/metrics", self.metrics),
            web.post("/start_profile", self.start_profile),
            web.post("/stop_profile", self.stop_profile),
        ])

    def _load_tokenizer(self):
        from pathlib import Path

        path = Path(self.config.model.tokenizer or self.config.model.model)
        if (path / "tokenizer_config.json").exists() or \
                (path / "tokenizer.json").exists():
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(str(path))
        return None

    # -- helpers ---------------------------------------------------------

    def _sampling_from(self, body: dict[str, Any]) -> SamplingParams:
        eos_ignore = bool(body.get("ignore_eos", False))
        guided = None
        fmt = body.get("response_format") or {}
        spec = None
        if fmt.get("type") == "json_object":
            spec = {"json": True}
        elif fmt.get("type") == "json_schema":
            schema = (fmt.get("json_schema") or {}).get("schema")
            spec = {"json": schema if isinstance(schema, dict) else True}
        elif body.get("guided_regex"):
            spec = {"regex": body["guided_regex"]}
        elif body.get("guided_choice"):
            spec = {"choice": body["guided_choice"]}
        elif body.get("guided_json"):
            spec = {"json": body["guided_json"]}
        if spec is not None:
            if self.tokenizer is None:
                raise web.HTTPBadRequest(
                    text="guided decoding requires a tokenizer")
            from arcticinference_tpu.serving.structured import (
                make_guided_decoder)
            try:   # model logits width (may exceed len(tokenizer))
                vocab = self.engine.engine.runner.arch.vocab_size
            except AttributeError:
                vocab = None
            guided = make_guided_decoder(self.tokenizer, spec,
                                         vocab_size=vocab)
        logprobs = body.get("logprobs")
        stop = body.get("stop") or ()
        if isinstance(stop, str):
            stop = (stop,)
        seed = body.get("seed")
        return SamplingParams(
            max_tokens=int(body.get("max_tokens", 128)),
            temperature=float(body.get("temperature", 0.0)),
            top_p=float(body.get("top_p", 1.0)),
            top_k=int(body.get("top_k", 0)),
            min_p=float(body.get("min_p", 0.0)),
            seed=int(seed) if seed is not None else None,
            repetition_penalty=float(body.get("repetition_penalty", 1.0)),
            presence_penalty=float(body.get("presence_penalty", 0.0)),
            frequency_penalty=float(body.get("frequency_penalty", 0.0)),
            ignore_eos=eos_ignore,
            stop_token_ids=tuple(body.get("stop_token_ids", ())),
            stop=tuple(str(s) for s in stop),
            n=int(body.get("n", 1)),
            guided=guided,
            logprobs=int(logprobs) if logprobs else None,
        )

    @staticmethod
    def _trim_stops(text: str, stops) -> tuple[str, bool]:
        """Cut the completion text just before the first stop sequence
        (OpenAI excludes the stop text from the response)."""
        cut = min((i for i in (text.find(s) for s in stops) if i != -1),
                  default=-1)
        return (text[:cut], True) if cut >= 0 else (text, False)

    def _encode(self, text: str) -> list[int]:
        if self.tokenizer is None:
            raise web.HTTPBadRequest(
                text=json.dumps({"error": "no tokenizer loaded; send "
                                          "prompt_token_ids"}),
                content_type="application/json")
        return self.tokenizer.encode(text)

    def _decode(self, ids: list[int]) -> str:
        if self.tokenizer is None:
            return " ".join(map(str, ids))
        return self.tokenizer.decode(ids, skip_special_tokens=True)

    # -- endpoints -------------------------------------------------------

    async def health(self, request: web.Request) -> web.Response:
        if getattr(self.engine, "dead", False):
            return web.json_response(
                {"status": "engine_error",
                 "reason": getattr(self.engine, "dead_reason", None)},
                status=503)
        if getattr(self.engine, "stalled", False):
            # The engine thread has not progressed while work is queued:
            # a wedged device step.  Routers treat 503 as unhealthy.
            return web.json_response({"status": "stalled"}, status=503)
        return web.json_response({"status": "ok"})

    async def embeddings(self, request: web.Request) -> web.Response:
        """OpenAI /v1/embeddings for encoder models (BERT family)."""
        import asyncio

        if self.encoder is None:
            return web.json_response(
                {"error": "this deployment serves a causal LM; use the "
                          "offline LLM.encode API or the gRPC embedding "
                          "fleet for decoder pooling"}, status=400)
        body = await request.json()
        raw = body.get("input")
        if raw is None:
            return web.json_response({"error": "missing 'input'"},
                                     status=400)
        if isinstance(raw, str):
            raw = [raw]
        if raw and isinstance(raw[0], int):
            raw = [raw]
        token_ids = []
        for item in raw:
            if isinstance(item, str):
                token_ids.append(self._encode(item))
            else:
                token_ids.append([int(t) for t in item])
        if self._encode_lock is None:
            self._encode_lock = asyncio.Lock()
        async with self._encode_lock:   # one device batch at a time
            embs = await asyncio.get_event_loop().run_in_executor(
                None, lambda: self.encoder.encode(token_ids))
        return web.json_response({
            "object": "list",
            "model": self.model_name,
            "data": [{"object": "embedding", "index": i,
                      "embedding": [float(x) for x in e]}
                     for i, e in enumerate(embs)],
            "usage": {"prompt_tokens": sum(len(t) for t in token_ids),
                      "total_tokens": sum(len(t) for t in token_ids)},
        })

    async def models(self, request: web.Request) -> web.Response:
        return web.json_response({
            "object": "list",
            "data": [{"id": self.model_name, "object": "model",
                      "owned_by": "arcticinference-tpu"}],
        })

    async def metrics(self, request: web.Request) -> web.Response:
        if self.engine is None:
            return web.json_response({"mode": "encoder"})
        eng = self.engine.engine
        st = eng.engine_stats
        return web.json_response({
            "num_waiting": len(eng.scheduler.waiting),
            "num_running": len(eng.scheduler.running),
            "num_steps": st.num_steps,
            "num_finished": st.num_finished,
            "num_prompt_tokens": st.num_prompt_tokens,
            "num_generated_tokens": st.num_generated_tokens,
            "num_cached_prompt_tokens":
                eng.scheduler.num_cached_prompt_tokens,
            "generation_tokens_per_s": round(st.tokens_per_second(), 2),
            "step_times": eng.step_times.summary(),
            "spec_decoding": eng.spec_stats.summary(),
        })

    async def start_profile(self, request: web.Request) -> web.Response:
        """Begin a JAX device trace (vLLM /start_profile parity)."""
        body = {}
        if request.can_read_body:
            try:
                body = await request.json()
            except Exception:
                body = {}
        trace_dir = body.get("trace_dir") or "/tmp/arctic_tpu_trace"
        try:
            if self.engine is None:
                return web.json_response({"error": "encoder mode"},
                                         status=400)
            self.engine.engine.start_profile(trace_dir)
        except Exception as e:  # double-start etc.
            return web.json_response({"error": str(e)}, status=400)
        return web.json_response({"status": "profiling",
                                  "trace_dir": trace_dir})

    async def stop_profile(self, request: web.Request) -> web.Response:
        if self.engine is None:
            return web.json_response({"error": "encoder mode"}, status=400)
        self.engine.engine.stop_profile()
        return web.json_response({"status": "ok"})

    async def completions(self, request: web.Request) -> web.Response:
        if self.engine is None:
            return web.json_response(
                {"error": "encoder-only model: use /v1/embeddings"},
                status=400)
        body = await request.json()
        prompt = body.get("prompt")
        prompt_ids = body.get("prompt_token_ids")
        if prompt_ids is None:
            if prompt is None:
                raise web.HTTPBadRequest(text="prompt required")
            if isinstance(prompt, list):
                prompt = prompt[0]
            prompt_ids = self._encode(prompt)
        rid = f"cmpl-{uuid.uuid4().hex[:16]}"
        if body.get("echo") and int(body.get("max_tokens", 128)) == 0:
            # Prompt-logprob scoring (lm_eval loglikelihood): no
            # generation, teacher-forced per-token logprobs.
            lp = await asyncio.to_thread(self._score_sync, prompt_ids)
            return web.json_response({
                "id": rid, "object": "text_completion",
                "created": int(time.time()), "model": self.model_name,
                "choices": [{
                    "index": 0,
                    "text": self._decode(prompt_ids),
                    "token_ids": list(prompt_ids),
                    "logprobs": {
                        "tokens": [self._decode([t]) for t in prompt_ids],
                        "token_logprobs": [None] + [float(x) for x in lp],
                    },
                    "finish_reason": "stop",
                }],
                "usage": _usage(prompt_ids, []),
            })
        sampling = self._sampling_from(body)
        if body.get("stream"):
            if sampling.n > 1:
                raise web.HTTPBadRequest(text="stream with n>1 unsupported")
            return await self._stream_completion(
                request, rid, prompt_ids, sampling, chat=False)
        fans = self._fan_out(body, sampling, rid)
        results = await asyncio.gather(*[
            self._collect(prompt_ids, sp, sub_rid)
            for sub_rid, sp in fans])
        _check_aborted(results)
        choices = []
        all_ids = []
        for i, (token_ids, finish, logprobs) in enumerate(results):
            all_ids.extend(token_ids)
            text = self._decode(token_ids)
            if sampling.stop:
                text, hit = self._trim_stops(text, sampling.stop)
                if hit:
                    finish = "finished_stopped"
            choice = {
                "index": i,
                "text": text,
                "token_ids": token_ids,
                "finish_reason": _reason(finish),
            }
            if logprobs is not None:
                choice["logprobs"] = {
                    "tokens": [self._decode([t]) for t in token_ids],
                    "token_logprobs": [lp.get(t) for t, lp in
                                       zip(token_ids, logprobs)],
                    "top_logprobs": [
                        {self._decode([t]): v for t, v in lp.items()}
                        for lp in logprobs],
                }
            choices.append(choice)
        return web.json_response({
            "id": rid, "object": "text_completion",
            "created": int(time.time()), "model": self.model_name,
            "choices": choices,
            "usage": _usage(prompt_ids, all_ids),
        })

    def _score_sync(self, prompt_ids):
        """Engine-thread-safe scoring (shares the step lock)."""
        with self.engine._engine_lock:
            return self.engine.engine.score([list(prompt_ids)])[0]

    def _fan_out(self, body, sampling, rid):
        """n>1: one engine request per choice.  Each choice gets its own
        guided decoder (stateful) and a distinct derived seed."""
        import dataclasses as _dc
        if sampling.n <= 1:
            return [(rid, sampling)]
        fans = []
        for i in range(sampling.n):
            sp = (self._sampling_from(body) if sampling.guided is not None
                  else _dc.replace(sampling))
            if sp.seed is not None:
                sp.seed = sp.seed + i
            elif sp.temperature == 0:
                pass  # greedy: identical choices, OpenAI semantics
            fans.append((f"{rid}-{i}", sp))
        return fans

    async def chat_completions(self, request: web.Request) -> web.Response:
        if self.engine is None:
            return web.json_response(
                {"error": "encoder-only model: use /v1/embeddings"},
                status=400)
        body = await request.json()
        messages = body.get("messages")
        if not messages:
            raise web.HTTPBadRequest(text="messages required")
        prompt_ids = self._chat_prompt_ids(messages)
        sampling = self._sampling_from(body)
        rid = f"chatcmpl-{uuid.uuid4().hex[:16]}"
        if body.get("stream"):
            if sampling.n > 1:
                raise web.HTTPBadRequest(text="stream with n>1 unsupported")
            return await self._stream_completion(
                request, rid, prompt_ids, sampling, chat=True)
        fans = self._fan_out(body, sampling, rid)
        results = await asyncio.gather(*[
            self._collect(prompt_ids, sp, sub_rid)
            for sub_rid, sp in fans])
        _check_aborted(results)
        choices = []
        all_ids = []
        for i, (token_ids, finish, _) in enumerate(results):
            all_ids.extend(token_ids)
            text = self._decode(token_ids)
            if sampling.stop:
                text, hit = self._trim_stops(text, sampling.stop)
                if hit:
                    finish = "finished_stopped"
            choices.append({
                "index": i,
                "message": {"role": "assistant", "content": text},
                "finish_reason": _reason(finish),
            })
        return web.json_response({
            "id": rid, "object": "chat.completion",
            "created": int(time.time()), "model": self.model_name,
            "choices": choices,
            "usage": _usage(prompt_ids, all_ids),
        })

    def _chat_prompt_ids(self, messages: list[dict]) -> list[int]:
        if self.tokenizer is not None and \
                getattr(self.tokenizer, "chat_template", None):
            return self.tokenizer.apply_chat_template(
                messages, add_generation_prompt=True)
        text = "\n".join(f"{m.get('role')}: {m.get('content')}"
                         for m in messages) + "\nassistant:"
        return self._encode(text)

    async def _collect(self, prompt_ids, sampling, rid):
        token_ids: list[int] = []
        finish = None
        logprobs = None
        try:
            async for chunk in self.engine.generate(prompt_ids, sampling,
                                                    rid):
                token_ids.extend(chunk.new_token_ids)
                if chunk.finished:
                    finish = chunk.finish_reason
                    if chunk.logprobs is not None:
                        logprobs = chunk.logprobs
        except asyncio.CancelledError:
            # Client disconnected mid-request (aiohttp cancels the
            # handler): stop the engine-side request too — the
            # reference's ``with_cancellation`` (dynasor/util.py:28-69).
            await self.engine.abort(rid)
            raise
        return token_ids, finish, logprobs

    async def _stream_completion(self, request, rid, prompt_ids, sampling,
                                 chat: bool):
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
        })
        await resp.prepare(request)
        sent_text = ""
        all_ids: list[int] = []
        obj = "chat.completion.chunk" if chat else "text_completion"
        try:
            async for chunk in self.engine.generate(prompt_ids, sampling,
                                                    rid):
                all_ids.extend(chunk.new_token_ids)
                full = self._decode(all_ids)
                if sampling.stop:
                    full, _stop_hit = self._trim_stops(full, sampling.stop)
                delta_text = full[len(sent_text):]
                # Hold back partial unicode tails.
                if delta_text.endswith("�"):
                    delta_text = ""
                if delta_text:
                    sent_text = full
                payload = {
                    "id": rid, "object": obj,
                    "created": int(time.time()),
                    "model": self.model_name,
                    "choices": [
                        {"index": 0,
                         "delta": {"content": delta_text}}
                        if chat else
                        {"index": 0, "text": delta_text,
                         "token_ids": chunk.new_token_ids}],
                }
                if chunk.finished:
                    payload["choices"][0]["finish_reason"] = _reason(
                        chunk.finish_reason)
                await resp.write(
                    f"data: {json.dumps(payload)}\n\n".encode())
            await resp.write(b"data: [DONE]\n\n")
        except (ConnectionResetError, asyncio.CancelledError):
            await self.engine.abort(rid)
            raise
        await resp.write_eof()
        return resp


def _check_aborted(results) -> None:
    """Engine-aborted generations (e.g. a guided request stranded by a
    device mask inconsistency) must surface as an error response, never
    a silently truncated 200."""
    if any(finish == "finished_aborted" for _, finish, *_ in results):
        raise web.HTTPInternalServerError(
            text="generation aborted by the engine")


def _reason(finish: Optional[str]) -> str:
    if finish == "finished_length":
        return "length"
    if finish in ("finished_aborted", "engine_error"):
        # Never dress an engine abort up as a clean stop — streaming
        # clients must see the failure (non-streaming paths raise 500).
        return "error"
    return "stop"


def _usage(prompt_ids, token_ids) -> dict:
    return {
        "prompt_tokens": len(prompt_ids),
        "completion_tokens": len(token_ids),
        "total_tokens": len(prompt_ids) + len(token_ids),
    }


def build_config(args: argparse.Namespace) -> EngineConfig:
    if args.config:
        cfg = EngineConfig.from_dict(json.loads(open(args.config).read()))
    else:
        cfg = EngineConfig()
    if args.model:
        cfg.model.model = args.model
        cfg.model.tokenizer = args.model
    if args.quantization:
        cfg.model.quantization = args.quantization
    if args.max_model_len:
        cfg.model.max_model_len = args.max_model_len
    if args.max_num_seqs:
        cfg.scheduler.max_num_seqs = args.max_num_seqs
    if args.max_num_batched_tokens:
        cfg.scheduler.max_num_batched_tokens = args.max_num_batched_tokens
    if args.kv_cache_dtype:
        cfg.cache.kv_cache_dtype = args.kv_cache_dtype
    if args.block_size:
        cfg.cache.block_size = args.block_size
    # Parallelism flags mirror the reference CLI (reference args.py:80-96).
    if (args.tensor_parallel_size or args.ulysses_sequence_parallel_size
            or args.enable_shift_parallel):
        from arcticinference_tpu.config import ParallelConfig

        cfg.parallel = ParallelConfig(
            tensor_parallel_size=args.tensor_parallel_size or 1,
            ulysses_sequence_parallel_size=(
                args.ulysses_sequence_parallel_size or 1),
            enable_shift_parallel=args.enable_shift_parallel,
            shift_parallel_threshold=args.shift_parallel_threshold)
    if args.speculative_config:
        cfg.speculative = SpeculativeConfig.from_json(
            args.speculative_config)
    return cfg




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
    parser.add_argument("--model", default=None)
    parser.add_argument("--config", default=None,
                        help="EngineConfig JSON file")
    parser.add_argument("--quantization", default=None)
    parser.add_argument("--speculative-config", default=None,
                        help='JSON, e.g. {"method": "suffix"}')
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max-model-len", type=int, default=None)
    parser.add_argument("--max-num-seqs", type=int, default=None)
    parser.add_argument("--max-num-batched-tokens", type=int, default=None)
    parser.add_argument("--kv-cache-dtype", default=None,
                        choices=[None, "auto", "bfloat16", "fp8"])
    parser.add_argument("--block-size", type=int, default=None)
    parser.add_argument("--tensor-parallel-size", type=int, default=None)
    parser.add_argument("--ulysses-sequence-parallel-size", type=int,
                        default=None)
    parser.add_argument("--enable-shift-parallel", action="store_true")
    parser.add_argument("--shift-parallel-threshold", type=int,
                        default=512)
    # Multi-host sharded serving (one engine over all hosts' chips):
    # run the SAME command on every host with a distinct --multihost-
    # process-id; process 0 serves HTTP, the rest mirror device steps.
    parser.add_argument("--multihost-coordinator", default=None,
                        help="host:port of the jax.distributed "
                        "coordinator (process 0)")
    parser.add_argument("--multihost-num-processes", type=int, default=0)
    parser.add_argument("--multihost-process-id", type=int, default=0)
    parser.add_argument("--multihost-leader", default="127.0.0.1",
                        help="leader host for the step channel")
    parser.add_argument("--multihost-channel-port", type=int,
                        default=8550)
    args = parser.parse_args()

    multihost = None
    if args.multihost_num_processes > 1:
        from arcticinference_tpu.parallel import multihost
        multihost.initialize(args.multihost_coordinator,
                             args.multihost_num_processes,
                             args.multihost_process_id)
        if args.multihost_process_id != 0:
            from arcticinference_tpu.engine.engine import LLMEngine

            engine = LLMEngine(build_config(args))
            channel = multihost.FollowerChannel(
                args.multihost_leader, args.multihost_channel_port)
            try:
                multihost.follower_serve(engine, channel)
            except ConnectionError:
                sys.exit(3)  # leader lost: suicide beats a deadlock
            return

    server = OpenAIServer(build_config(args))
    if multihost is not None:
        channel = multihost.LeaderChannel(
            args.multihost_num_processes - 1,
            args.multihost_channel_port)
        channel.wait_connected()
        server.engine.engine.runner.mh_channel = channel
        channel.start_watchdog(
            lambda idx, reason: server.engine.mark_dead(
                f"follower {idx} {reason}"))
    web.run_app(server.app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
