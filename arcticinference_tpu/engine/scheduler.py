"""Continuous-batching scheduler (vLLM-v1-style token-budget scheduling).

The reference inherits this whole layer from vLLM; here it is ours.  Each
step the scheduler hands the runner a flat token batch: for every running
request either its next prompt chunk (chunked prefill) or 1 + #draft
tokens to verify (decode with speculation), all within
``max_num_batched_tokens``.  Preemption is by recompute (free the blocks,
requeue) — same policy vLLM defaults to.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Optional

from arcticinference_tpu.config import CacheConfig, SchedulerConfig
from arcticinference_tpu.engine.block_manager import (BlockManager,
                                                      NoFreeBlocksError)
from arcticinference_tpu.engine.request import Request, RequestStatus


@dataclass
class ScheduledRequest:
    request: Request
    num_new_tokens: int          # tokens to run this step (incl. drafts)
    spec_token_ids: list[int]    # drafts being verified this step
    # Tree drafts: parents[i] = index of draft i's parent (-1 = frontier
    # child); None = linear chain (the common case).
    spec_parents: Optional[list[int]] = None


@dataclass
class SchedulerOutput:
    scheduled: list[ScheduledRequest] = field(default_factory=list)
    preempted: list[Request] = field(default_factory=list)

    @property
    def total_tokens(self) -> int:
        return sum(s.num_new_tokens for s in self.scheduled)


class Scheduler:

    def __init__(self, scheduler_config: SchedulerConfig,
                 cache_config: CacheConfig, num_blocks: int,
                 num_shards: int = 1):
        self.config = scheduler_config
        self.block_size = cache_config.block_size
        # In-engine DP: one PRIVATE block space per dp shard (block ids
        # are shard-local; the cache's block axis is sharded over "dp").
        self.num_shards = num_shards
        self.block_managers = [
            BlockManager(num_blocks, cache_config.block_size,
                         enable_prefix_caching=cache_config
                         .enable_prefix_caching)
            for _ in range(num_shards)]
        self.waiting: deque[Request] = deque()
        self.running: list[Request] = []
        # Prefix-cache telemetry: prompt tokens whose prefill was skipped.
        self.num_cached_prompt_tokens = 0
        # Requests owned by the device-resident fused loop: never
        # preempt them (in-flight device steps still write their blocks).
        self.protected_ids: set = set()

    @property
    def block_manager(self) -> BlockManager:
        """Shard 0 (the only shard when dp == 1)."""
        return self.block_managers[0]

    def bm_for(self, request: Request) -> BlockManager:
        return self.block_managers[request.dp_shard]

    def _assign_shard(self, request: Request) -> None:
        """Least-loaded shard by free blocks, fixed for the request's
        lifetime (its block ids are local to that shard's cache slice)."""
        if request.dp_shard < 0:
            request.dp_shard = max(
                range(self.num_shards),
                key=lambda i: self.block_managers[i].num_free_blocks)

    @property
    def num_unfinished(self) -> int:
        return len(self.waiting) + len(self.running)

    def add_request(self, request: Request) -> None:
        self.waiting.append(request)

    def abort_request(self, req_id: str) -> Optional[Request]:
        for i, r in enumerate(self.running):
            if r.req_id == req_id:
                r.status = RequestStatus.FINISHED_ABORTED
                self._release(r)
                del self.running[i]
                return r
        for i, r in enumerate(self.waiting):
            if r.req_id == req_id:
                r.status = RequestStatus.FINISHED_ABORTED
                self._release(r)  # may hold matched prefix-cache blocks
                del self.waiting[i]
                return r
        return None

    def _release(self, request: Request) -> None:
        if request.block_ids:
            self.bm_for(request).free(request.block_ids)
            request.block_ids = []
        request.num_cached_blocks = 0

    # -- prefix caching ---------------------------------------------------

    @staticmethod
    def _known_prefix_len(request: Request) -> int:
        """Tokens before the first async PENDING placeholder (< 0)."""
        n = len(request.prompt_token_ids)
        for t in request.output_token_ids:
            if t < 0:
                break
            n += 1
        return n

    def _match_cached_prefix(self, request: Request) -> None:
        """Attach the longest cached full-block prefix on admission
        (vLLM V1 automatic prefix caching; the matched tokens' KV is
        already on device, so prefill resumes mid-prompt exactly like
        recompute catch-up)."""
        bm = self.bm_for(request)
        if not (bm.enable_prefix_caching
                and not request.block_ids
                and request.num_computed_tokens == 0):
            return
        toks = request.all_token_ids[:self._known_prefix_len(request)]
        blocks, matched = bm.match_prefix(toks)
        if matched:
            request.block_ids = blocks
            request.num_computed_tokens = matched
            request.num_cached_blocks = len(blocks)
            self.num_cached_prompt_tokens += matched

    def register_computed(self, request: Request) -> None:
        """Advance the request's prefix-registration watermark over
        full blocks whose token values are host-known and whose KV
        writes have been dispatched (device-ordered before any later
        matcher's read)."""
        bm = self.bm_for(request)
        if not bm.enable_prefix_caching or not request.block_ids:
            return
        bs = self.block_size
        full = min(request.num_computed_tokens,
                   self._known_prefix_len(request)) // bs
        full = min(full, len(request.block_ids))
        if full > request.num_cached_blocks:
            request.num_cached_blocks = bm.register_prefix(
                request.all_token_ids, request.block_ids, full,
                request.num_cached_blocks)

    def finish_request(self, request: Request, status: RequestStatus) -> None:
        request.status = status
        self._release(request)
        if request in self.running:
            self.running.remove(request)
        # A request can finish while WAITING: preempted with its final
        # token still in flight, then the async drain resolves the
        # placeholder and stop conditions fire.  Leaving it queued would
        # re-admit a finished request (and later schedule a bogus
        # 0-known-token decode step).
        if request in self.waiting:
            self.waiting.remove(request)

    def schedule(self, skip_decode: bool = False) -> SchedulerOutput:
        """``skip_decode=True`` schedules only prefill work (ongoing
        chunks + new admissions) plus decode for frontier requests NOT
        owned by the fused loop (``protected_ids``) — used while the
        fused decode loop owns its slots device-side, so admissions and
        non-fusable requests (seeds / penalties / stop-strings /
        logprobs / guided) ride interleaved sync steps instead of
        forcing the loop to exit."""
        out = SchedulerOutput()
        budget = self.config.max_num_batched_tokens

        # --- running requests first (decode + ongoing prefill chunks) ------
        for req in list(self.running):
            if budget <= 0:
                break
            if req.status is not RequestStatus.RUNNING:
                continue  # preempted by an earlier request this step
            known_remaining = req.num_tokens - req.num_computed_tokens
            if skip_decode and known_remaining <= 1 and \
                    req.req_id in self.protected_ids:
                continue  # owned by the fused loop
            parents = None
            if known_remaining > 1:
                # Prefill, or catch-up after recompute-preemption: feed
                # the known tokens (sampling happens only on the step
                # that reaches the sequence frontier).
                chunk = min(budget, known_remaining)
                if not self.config.enable_chunked_prefill:
                    if known_remaining > budget:
                        continue
                    chunk = known_remaining
                n = chunk
                drafts: list[int] = []
                if chunk == known_remaining and req.spec_token_ids:
                    # Tree speculation re-verifies accepted tokens (their
                    # KV was written at scratch slots), so drafts attach
                    # to the catch-up chunk that reaches the frontier.
                    drafts = req.spec_token_ids[:budget - chunk]
                    parents = (req.spec_parents[:len(drafts)]
                               if req.spec_parents is not None else None)
                    n = chunk + len(drafts)
            else:
                drafts = req.spec_token_ids
                parents = req.spec_parents
                n = 1 + len(drafts)
                if n > budget:
                    drafts = drafts[:budget - 1]
                    if parents is not None:
                        parents = parents[:len(drafts)]
                    n = 1 + len(drafts)
            try:
                self.bm_for(req).grow_to(
                    req.block_ids, req.num_computed_tokens + n)
            except NoFreeBlocksError:
                victim = self._preempt(skip=req, out=out,
                                       shard=req.dp_shard)
                if victim is None:
                    continue
                out.preempted.append(victim)
                try:
                    self.bm_for(req).grow_to(
                        req.block_ids, req.num_computed_tokens + n)
                except NoFreeBlocksError:
                    continue
            out.scheduled.append(ScheduledRequest(req, n, drafts,
                                                  parents))
            budget -= n

        # --- admit waiting requests (new or preempted prefills) -----------
        while (self.waiting and budget > 0
               and len(self.running) < self.config.max_num_seqs):
            req = self.waiting[0]
            if req.status.is_finished:  # belt-and-braces (finish_request
                self.waiting.popleft()  # already dequeues finished reqs)
                continue
            self._assign_shard(req)
            self._match_cached_prefix(req)
            bm = self.bm_for(req)
            remaining = req.num_tokens - req.num_computed_tokens
            chunk = min(budget, remaining)
            if not self.config.enable_chunked_prefill and chunk < remaining:
                break
            need = bm.blocks_needed(
                req.num_computed_tokens + chunk) - len(req.block_ids)
            if not bm.can_allocate(need):
                break
            bm.grow_to(req.block_ids, req.num_computed_tokens + chunk)
            self.waiting.popleft()
            req.status = RequestStatus.RUNNING
            self.running.append(req)
            out.scheduled.append(ScheduledRequest(req, chunk, []))
            budget -= chunk

        return out

    def _preempt(self, skip: Request,
                 out: Optional[SchedulerOutput] = None,
                 shard: int = -1) -> Optional[Request]:
        """Recompute-preempt the lowest-priority running request.

        If the victim was already scheduled earlier in this pass, its
        (now invalid) entry is dropped from the step.
        """
        for req in reversed(self.running):
            if req is skip or req.req_id in self.protected_ids:
                continue
            if shard >= 0 and req.dp_shard != shard:
                continue  # freeing another shard's blocks cannot help
            self.running.remove(req)
            self._release(req)
            req.status = RequestStatus.WAITING
            req.num_computed_tokens = 0
            req.spec_token_ids = []
            req.spec_parents = None
            self.waiting.appendleft(req)
            if out is not None:
                out.scheduled = [s for s in out.scheduled
                                 if s.request is not req]
            return req
        return None

    def update_after_step(self, scheduled: ScheduledRequest,
                          new_token_ids: list[int],
                          num_accepted_drafts: int) -> None:
        """Commit one request's step results.

        new_token_ids: tokens sampled this step (accepted drafts + bonus;
        empty while prefilling a non-final chunk).
        """
        req = scheduled.request
        req.num_computed_tokens += scheduled.num_new_tokens
        if scheduled.spec_token_ids:
            # Rejected drafts occupied scheduled slots but produced no
            # tokens: roll the computed counter back to the real frontier.
            rejected = len(scheduled.spec_token_ids) - num_accepted_drafts
            req.num_computed_tokens -= rejected
        req.output_token_ids.extend(new_token_ids)
        req.spec_token_ids = []
        req.spec_parents = None
        self.register_computed(req)
