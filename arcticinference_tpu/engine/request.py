"""Request state and sampling parameters."""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional, Sequence


@dataclass
class SamplingParams:
    max_tokens: int = 128
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    #: min-p filtering: drop tokens with prob < min_p * max_prob (0 = off).
    min_p: float = 0.0
    #: Per-request sampling seed: a seeded request reproduces its output
    #: regardless of co-scheduling (None = engine step rng).
    seed: Optional[int] = None
    #: vLLM-semantics penalties (1.0 / 0.0 / 0.0 = no-op).
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    stop_token_ids: tuple[int, ...] = ()
    #: String stop sequences (OpenAI ``stop``): generation ends when one
    #: appears in the decoded output; the stop text is excluded.
    stop: tuple[str, ...] = ()
    #: Number of completions per prompt (fanned out at the API layer).
    n: int = 1
    ignore_eos: bool = False
    # Grammar-guided decoding (e.g. serving.structured.JsonGuidedDecoder);
    # compared by identity, not value.
    guided: object = None
    # Top-N logprobs per generated token (None = disabled, max 16).
    logprobs: Optional[int] = None

    def __post_init__(self) -> None:
        if self.max_tokens <= 0:
            raise ValueError("max_tokens must be positive")
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if not 0.0 <= self.min_p <= 1.0:
            raise ValueError("min_p must be in [0, 1]")
        if self.repetition_penalty <= 0:
            raise ValueError("repetition_penalty must be > 0")
        if self.n < 1:
            raise ValueError("n must be >= 1")
        if isinstance(self.stop, str):
            self.stop = (self.stop,)
        else:
            self.stop = tuple(self.stop)
        if self.logprobs is not None and not 0 < self.logprobs <= 16:
            raise ValueError("logprobs must be in 1..16")

    @property
    def needs_penalties(self) -> bool:
        return (self.repetition_penalty != 1.0
                or self.presence_penalty != 0.0
                or self.frequency_penalty != 0.0)


class RequestStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    PREEMPTED = enum.auto()
    FINISHED_STOPPED = enum.auto()     # eos / stop token
    FINISHED_LENGTH = enum.auto()      # hit max_tokens / max_model_len
    FINISHED_ABORTED = enum.auto()

    @property
    def is_finished(self) -> bool:
        return self in (RequestStatus.FINISHED_STOPPED,
                        RequestStatus.FINISHED_LENGTH,
                        RequestStatus.FINISHED_ABORTED)


@dataclass
class Request:
    req_id: str
    prompt_token_ids: list[int]
    sampling: SamplingParams = field(default_factory=SamplingParams)
    arrival_time: float = 0.0

    status: RequestStatus = RequestStatus.WAITING
    #: In-engine DP shard (block ids are local to this shard's cache
    #: slice); assigned at admission, -1 = unassigned.
    dp_shard: int = -1
    output_token_ids: list[int] = field(default_factory=list)
    # Tokens whose KV is already computed & cached.
    num_computed_tokens: int = 0
    # Draft tokens proposed for the NEXT step (speculative decoding).
    spec_token_ids: list[int] = field(default_factory=list)
    # Token-tree speculation: parents[i] = index of draft i's parent in
    # spec_token_ids (-1 = child of the frontier).  None = linear chain.
    spec_parents: Optional[list[int]] = None
    block_ids: list[int] = field(default_factory=list)
    # Prefix-cache registration watermark: leading full blocks whose
    # chain hashes are registered with the BlockManager.
    num_cached_blocks: int = 0
    # Per generated token: list of {token_id: logprob} dicts (when
    # sampling.logprobs is set).
    output_logprobs: list = field(default_factory=list)
    # Stop-string truncation: when a string stop fired, the user-visible
    # text (decoded output cut just before the stop sequence).
    final_text: Optional[str] = None
    # Telemetry
    first_token_time: Optional[float] = None
    finish_time: Optional[float] = None
    num_accepted_draft_tokens: int = 0
    num_draft_tokens: int = 0

    @property
    def num_tokens(self) -> int:
        """Known tokens: prompt + generated so far."""
        return len(self.prompt_token_ids) + len(self.output_token_ids)

    @property
    def all_token_ids(self) -> list[int]:
        return self.prompt_token_ids + self.output_token_ids

    @property
    def is_prefilling(self) -> bool:
        return self.num_computed_tokens < len(self.prompt_token_ids)

    def check_stop(self, eos_token_id: Optional[int],
                   max_model_len: int) -> Optional[RequestStatus]:
        """Return a finished status if the request should stop now.

        Called after appending newly accepted tokens; trims output past a
        stop condition.
        """
        out = self.output_token_ids
        sp = self.sampling
        for i, tok in enumerate(out):
            if (not sp.ignore_eos and eos_token_id is not None
                    and tok == eos_token_id):
                del out[i + 1:]
                return RequestStatus.FINISHED_STOPPED
            if tok in sp.stop_token_ids:
                del out[i + 1:]
                return RequestStatus.FINISHED_STOPPED
        if len(out) >= sp.max_tokens:
            del out[sp.max_tokens:]
            return RequestStatus.FINISHED_LENGTH
        if self.num_tokens >= max_model_len:
            return RequestStatus.FINISHED_LENGTH
        return None
