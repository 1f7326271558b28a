"""Engine metrics.

Speculative-decoding acceptance accounting mirrors the reference's
``SpecDecodingStats`` with its variable-draft-length extension (reference
``vllm/stats.py:26-69``): per-position acceptance arrays grow on demand
because suffix drafts have no fixed length.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class SpecDecodingStats:
    num_drafts: int = 0
    num_draft_tokens: int = 0
    num_accepted_tokens: int = 0
    # accepted count per draft position (grows with longest draft seen)
    num_accepted_tokens_per_pos: list[int] = field(default_factory=list)

    def observe(self, num_draft_tokens: int, num_accepted: int) -> None:
        self.num_drafts += 1
        self.num_draft_tokens += num_draft_tokens
        self.num_accepted_tokens += num_accepted
        if num_draft_tokens > len(self.num_accepted_tokens_per_pos):
            self.num_accepted_tokens_per_pos.extend(
                [0] * (num_draft_tokens
                       - len(self.num_accepted_tokens_per_pos)))
        for i in range(num_accepted):
            self.num_accepted_tokens_per_pos[i] += 1

    @property
    def mean_accepted_per_draft(self) -> float:
        if self.num_drafts == 0:
            return 0.0
        return self.num_accepted_tokens / self.num_drafts

    @property
    def acceptance_rate(self) -> float:
        if self.num_draft_tokens == 0:
            return 0.0
        return self.num_accepted_tokens / self.num_draft_tokens

    def summary(self) -> dict:
        return {
            "num_drafts": self.num_drafts,
            "num_draft_tokens": self.num_draft_tokens,
            "num_accepted_tokens": self.num_accepted_tokens,
            "acceptance_rate": round(self.acceptance_rate, 4),
            "mean_accepted_per_draft":
                round(self.mean_accepted_per_draft, 4),
            "per_pos": list(self.num_accepted_tokens_per_pos),
        }


@dataclass
class EngineStats:
    """Rolling engine counters for the logging loop."""

    start_time: float = field(default_factory=time.time)
    num_steps: int = 0
    num_prompt_tokens: int = 0
    num_generated_tokens: int = 0
    num_finished: int = 0

    def tokens_per_second(self) -> float:
        dt = time.time() - self.start_time
        return self.num_generated_tokens / dt if dt > 0 else 0.0
