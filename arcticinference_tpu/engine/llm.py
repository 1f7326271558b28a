"""Offline inference API: the equivalent of ``vllm.LLM`` for this engine.

    from arcticinference_tpu.engine.llm import LLM
    llm = LLM(EngineConfig(...))
    outs = llm.generate(["Hello"], SamplingParams(max_tokens=32))

Works with raw token ids too (``prompt_token_ids=...``) so tests and
benchmarks need no tokenizer/checkpoint.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Sequence, Union

from arcticinference_tpu.config import EngineConfig
from arcticinference_tpu.engine.engine import LLMEngine
from arcticinference_tpu.engine.request import Request, SamplingParams


@dataclass
class RequestOutput:
    req_id: str
    prompt_token_ids: list[int]
    token_ids: list[int]
    text: Optional[str] = None
    finish_reason: str = "stop"
    num_accepted_draft_tokens: int = 0
    num_draft_tokens: int = 0
    logprobs: Optional[list[dict]] = None


class LLM:

    def __init__(self, config: EngineConfig):
        self.config = config
        self.engine = None
        self.encoder = None
        if _is_encoder_arch(config):
            from arcticinference_tpu.engine.encoder import EncoderRunner

            self.encoder = EncoderRunner(config)
        else:
            self.engine = LLMEngine(config)
        self.tokenizer = self._load_tokenizer()
        if self.engine is not None and self.tokenizer is not None:
            self.engine.tokenizer = self.tokenizer
            if self.engine.eos_token_id is None:
                self.engine.eos_token_id = self.tokenizer.eos_token_id
        self._next_id = 0

    def close(self) -> None:
        """Release engine resources (worker threads, pending futures)."""
        if self.engine is not None:
            self.engine.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _load_tokenizer(self):
        path = Path(self.config.model.tokenizer or self.config.model.model)
        if not (path / "tokenizer_config.json").exists() and \
                not (path / "tokenizer.json").exists():
            return None
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(str(path))

    def generate(
        self,
        prompts: Optional[Sequence[str]] = None,
        sampling_params: Union[SamplingParams, Sequence[SamplingParams],
                               None] = None,
        prompt_token_ids: Optional[Sequence[Sequence[int]]] = None,
    ) -> list[RequestOutput]:
        if self.engine is None:
            raise ValueError(
                "encoder-only model: use .encode(), not .generate()")
        if prompts is None and prompt_token_ids is None:
            raise ValueError("provide prompts or prompt_token_ids")
        if prompt_token_ids is None:
            if self.tokenizer is None:
                raise ValueError(
                    "no tokenizer available; pass prompt_token_ids")
            prompt_token_ids = [self.tokenizer.encode(p) for p in prompts]
        n = len(prompt_token_ids)
        if isinstance(sampling_params, SamplingParams) or \
                sampling_params is None:
            sampling_params = [sampling_params or SamplingParams()] * n

        requests: list[Request] = []
        for ids, sp in zip(prompt_token_ids, sampling_params):
            # n > 1: one engine request per completion (vLLM V1 fans n
            # out to n sequences the same way).
            for i in range(sp.n):
                rid = f"req-{self._next_id}"
                self._next_id += 1
                sub = sp
                if sp.n > 1:
                    import dataclasses
                    sub = dataclasses.replace(
                        sp, n=1,
                        seed=sp.seed + i if sp.seed is not None else None)
                    if sub.guided is not None and \
                            hasattr(sub.guided, "clone"):
                        # Guided decoders are stateful: each fanned-out
                        # child tracks its own automaton state.
                        sub = dataclasses.replace(
                            sub, guided=sub.guided.clone())
                requests.append(
                    self.engine.add_request(rid, list(ids), sub))

        done: dict[str, Request] = {}
        while self.engine.has_unfinished:
            for req in self.engine.step():
                done[req.req_id] = req

        outputs = []
        for req in requests:
            fin = done.get(req.req_id, req)
            text = fin.final_text  # set when a string stop truncated
            if text is None and self.tokenizer is not None:
                text = self.tokenizer.decode(fin.output_token_ids)
            outputs.append(RequestOutput(
                req_id=fin.req_id,
                prompt_token_ids=fin.prompt_token_ids,
                token_ids=list(fin.output_token_ids),
                text=text,
                finish_reason=fin.status.name.lower(),
                num_accepted_draft_tokens=fin.num_accepted_draft_tokens,
                num_draft_tokens=fin.num_draft_tokens,
                logprobs=(fin.output_logprobs[:len(fin.output_token_ids)]
                          if fin.output_logprobs else None),
            ))
        return outputs


class KVCalibrationMixin:
    """FP8 KV-cache scale calibration (ROADMAP: amax tracking).

    Static/delayed scaling: run representative prompts once, measure
    per-layer K/V amax from the cache, then freeze ``kv_scale`` so all
    later writes use the calibrated dynamic range.  Mirrors how fp8-KV
    checkpoints ship per-layer k_scale/v_scale (vLLM); for checkpoints
    without them this produces equivalent scales from data."""

    FP8_MAX = 448.0

    def calibrate_kv_scales(self, prompt_token_ids, margin: float = 1.0):
        import jax
        import jax.numpy as jnp
        import numpy as np

        runner = self.engine.runner
        if runner.kv.dtype != jnp.float8_e4m3fn:
            raise ValueError("kv cache is not fp8; nothing to calibrate")
        old = jnp.asarray(runner.kv_scale)          # [L, 2]
        self.generate(prompt_token_ids=prompt_token_ids,
                      sampling_params=SamplingParams(max_tokens=1))

        @jax.jit
        def amax_fn(kv, old):
            a = jnp.max(jnp.abs(kv.astype(jnp.float32)), axis=(1, 3, 4))
            return a * old                           # undo old scaling

        amax = np.asarray(amax_fn(runner.kv, old))   # true K/V amax [L,2]
        scales = np.maximum(amax, 1e-6) / self.FP8_MAX * margin
        runner.kv_scale = jnp.asarray(scales, jnp.float32)
        return scales


LLM.calibrate_kv_scales = KVCalibrationMixin.calibrate_kv_scales
LLM.FP8_MAX = KVCalibrationMixin.FP8_MAX


def _is_encoder_arch(config: EngineConfig) -> bool:
    """True when the configured architecture is a bidirectional encoder
    (module attribute ``IS_ENCODER``), resolved exactly like the loader."""
    from arcticinference_tpu.models import get_model_module
    from arcticinference_tpu.models.loader import read_hf_config

    hf_cfg = read_hf_config(config.model.model)
    if hf_cfg is not None:
        arch_name = (hf_cfg.get("architectures") or ["LlamaForCausalLM"])[0]
    else:
        arch_name = config.model.model
    try:
        module = get_model_module(arch_name)
    except ValueError:
        return False
    return bool(getattr(module, "IS_ENCODER", False))


class EmbeddingMixin:
    """Pooled-embedding path: one-shot batched prefill, no decode.

    Mirror of the capability the reference gets from vLLM's encode mode
    (reference ``embedding/replica.py:213-224``).  Encoder architectures
    (BERT family) run the dedicated dense ``EncoderRunner``; causal LMs
    get a jitted forward + segment pooling over each request's tokens.
    """

    def encode(self, prompts=None, prompt_token_ids=None,
               pooling: str = "mean", normalize=None):
        import jax
        import jax.numpy as jnp
        import numpy as np

        if prompt_token_ids is None:
            if self.tokenizer is None:
                raise ValueError("no tokenizer; pass prompt_token_ids")
            prompt_token_ids = [self.tokenizer.encode(p) for p in prompts]
        if self.encoder is not None:
            return self.encoder.encode(
                prompt_token_ids, pooling=pooling,
                normalize=True if normalize is None else normalize)
        normalize = bool(normalize)
        runner = self.engine.runner
        bm = self.engine.scheduler.block_manager
        budget = self.config.scheduler.max_num_batched_tokens
        out: list[np.ndarray] = []
        batch: list[list[int]] = []
        total = 0
        for ids in prompt_token_ids:
            if len(ids) > budget:
                raise ValueError(
                    f"prompt of {len(ids)} tokens exceeds "
                    f"max_num_batched_tokens={budget}")
            if (total + len(ids) > budget
                    or len(batch) >= self.config.scheduler.max_num_seqs):
                out.extend(self._encode_batch(batch, pooling, normalize))
                batch, total = [], 0
            batch.append(list(ids))
            total += len(ids)
        if batch:
            out.extend(self._encode_batch(batch, pooling, normalize))
        return out

    def _encode_batch(self, batch, pooling, normalize=False):
        import numpy as np
        from arcticinference_tpu.engine.request import (Request,
                                                        SamplingParams)
        from arcticinference_tpu.engine.scheduler import (ScheduledRequest,
                                                          SchedulerOutput)

        runner = self.engine.runner
        bm = self.engine.scheduler.block_manager
        reqs = []
        sched = SchedulerOutput()
        for i, ids in enumerate(batch):
            req = Request(req_id=f"emb-{i}", prompt_token_ids=ids,
                          sampling=SamplingParams(max_tokens=1))
            bm.grow_to(req.block_ids, len(ids))
            reqs.append(req)
            sched.scheduled.append(ScheduledRequest(req, len(ids), []))
        try:
            si = runner.prepare_inputs(sched)
            pooled = runner.execute_encode(si, pooling=pooling,
                                           normalize=normalize)
        finally:
            for req in reqs:
                bm.free(req.block_ids)
        return [np.asarray(pooled[i]) for i in range(len(batch))]


class ScoringMixin:
    """Teacher-forced per-token logprobs (OpenAI ``echo`` / lm_eval
    ``loglikelihood``): the capability the reference's accuracy harness
    uses to score multiple-choice tasks (reference
    ``tests/benchmarks/test_benchmarks.py:115-151`` via lm_eval)."""

    def score(self, prompt_token_ids):
        """For each sequence, the logprob of token i+1 given tokens
        [0..i] — an array of length len(seq) - 1 per sequence."""
        eng = getattr(self, "engine", None) or self
        runner = eng.runner
        bm = eng.scheduler.block_manager
        budget = self.config.scheduler.max_num_batched_tokens
        out = []
        batch: list[list[int]] = []
        total = 0
        for ids in prompt_token_ids:
            if len(ids) > budget:
                raise ValueError(
                    f"sequence of {len(ids)} tokens exceeds "
                    f"max_num_batched_tokens={budget}")
            if (total + len(ids) > budget
                    or len(batch) >= self.config.scheduler.max_num_seqs):
                out.extend(self._score_batch(batch))
                batch, total = [], 0
            batch.append(list(ids))
            total += len(ids)
        if batch:
            out.extend(self._score_batch(batch))
        return out

    def _score_batch(self, batch):
        import numpy as np
        from arcticinference_tpu.engine.request import (Request,
                                                        SamplingParams)
        from arcticinference_tpu.engine.scheduler import (ScheduledRequest,
                                                          SchedulerOutput)

        eng = getattr(self, "engine", None) or self
        runner = eng.runner
        bm = eng.scheduler.block_manager
        reqs = []
        sched = SchedulerOutput()
        for i, ids in enumerate(batch):
            req = Request(req_id=f"score-{i}", prompt_token_ids=ids,
                          sampling=SamplingParams(max_tokens=1))
            bm.grow_to(req.block_ids, len(ids))
            reqs.append(req)
            sched.scheduled.append(ScheduledRequest(req, len(ids), []))
        try:
            si = runner.prepare_inputs(sched)
            targets = np.full(si.t_pad, -1, np.int32)
            t = 0
            spans = []
            for ids in batch:
                n = len(ids)
                targets[t:t + n - 1] = ids[1:]
                spans.append((t, n - 1))
                t += n
            lp = runner.execute_score(si, targets)
        finally:
            for req in reqs:
                bm.free(req.block_ids)
        return [np.asarray(lp[a:a + n], np.float64) for a, n in spans]


LLM.score = ScoringMixin.score
LLM._score_batch = ScoringMixin._score_batch
# The bare engine scores too (used by the server's echo path).
from arcticinference_tpu.engine.engine import LLMEngine as _Eng  # noqa: E402
_Eng.score = ScoringMixin.score
_Eng._score_batch = ScoringMixin._score_batch


# Attach the embedding API to LLM.
LLM.encode = EmbeddingMixin.encode
LLM._encode_batch = EmbeddingMixin._encode_batch
