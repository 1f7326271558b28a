"""LLMEngine: the step loop tying scheduler, runner and speculation together.

Mirror of the reference's execute_model + propose_draft_token_ids flow
(reference ``model_runner.py:218-524`` and ``:526-603``), owned end to end:

  schedule -> prepare inputs -> device step -> host verify (greedy accept)
  -> commit tokens / stops -> update suffix cache -> propose next drafts

Speculation sources per step and per request:
- suffix decoding (host C++ tree), if enabled
- the Arctic MLP/LSTM draft model, if configured
The suffix result wins when its score (estimated accepted length) is at
least ``num_speculative_tokens``, matching reference
``model_runner.py:546-575``; both are disabled above
``disable_by_batch_size`` running requests (reference ``config.py:93-96``).
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import jax
import numpy as np

logger = logging.getLogger("arcticinference_tpu")

from arcticinference_tpu.config import EngineConfig
from arcticinference_tpu.engine.request import (Request, RequestStatus,
                                                SamplingParams)
from arcticinference_tpu.engine.runner import ModelRunner
from arcticinference_tpu.engine.scheduler import Scheduler, SchedulerOutput
from arcticinference_tpu.models.loader import load_model
from arcticinference_tpu.stats import SpecDecodingStats

# Host-side placeholder for a token whose value is still device-resident
# (async scheduling); always patched before user-visible output.
PENDING_TOKEN = -7


class _InflightStep:
    """A dispatched-but-unsynced device step (async scheduling)."""

    __slots__ = ("sched_out", "step_inputs", "tokens_dev", "commits",
                 "gstate_base")

    def __init__(self, sched_out, step_inputs, tokens_dev):
        self.sched_out = sched_out
        self.step_inputs = step_inputs
        self.tokens_dev = tokens_dev
        # (request, output position, absolute token-row index)
        self.commits: list = []
        # Offset of the appended grammar-state segment in tokens_dev
        # (device-resident guided decoding); 0 when absent.
        self.gstate_base = 0


class LLMEngine:

    def __init__(self, config: EngineConfig, mesh=None):
        self.config = config
        module, arch, params = load_model(config.model)
        self.arch = arch
        self.eos_token_id: Optional[int] = getattr(arch, "eos_token_id",
                                                   None)
        # Detokenizer for string stop sequences (set by LLM / the server;
        # requests with sampling.stop are rejected without one).
        self.tokenizer = None
        self.runner = ModelRunner(config, module, arch, params, mesh=mesh)
        self.scheduler = Scheduler(config.scheduler, config.cache,
                                   self.runner.num_blocks_per_shard,
                                   num_shards=max(self.runner.dp, 1))
        self.spec_stats = SpecDecodingStats()
        from arcticinference_tpu.stats import EngineStats, StepTimeStats
        self.engine_stats = EngineStats()
        self.step_times = StepTimeStats()
        self._last_log = time.time()
        self._profiling = False
        self._rng = jax.random.PRNGKey(config.model.seed)

        # Async scheduling (pipelined steps) is incompatible with
        # host-side draft proposal, which needs token values per step.
        self._pipeline = (config.scheduler.async_scheduling
                          and config.speculative is None)
        self._pipeline_depth = config.scheduler.pipeline_depth
        self._inflight: list = []
        self._pending_ref: dict = {}
        # Device-resident guided decoding: grammar-index id -> pool slot
        # (slots are shared by requests with the same compiled grammar
        # and reclaimed lazily when their requests finish).
        self._guided_slots: dict[int, int] = {}
        # Optional distillation hook (spec/distill.py HiddenCapture):
        # called from the synchronous step with (rows, [(req_id, row,
        # emitted_token)]) so drafters can be trained on target outputs.
        self.hidden_capture = None

        self.spec_config = config.speculative
        self._suffix_cache = None
        self._drafter = None
        self._fused = None
        if self.spec_config is not None:
            if self.spec_config.use_tree_spec and self.runner.swift:
                raise NotImplementedError(
                    "use_tree_spec does not compose with SwiftKV (the "
                    "early-exit halves re-run draft rows with different "
                    "masks)")
            if self.spec_config.use_tree_spec and self.runner.dp > 1:
                raise NotImplementedError(
                    "use_tree_spec runs on sp/tp/shift meshes; the "
                    "dp-major row layout does not carry tree schedules")
            if self.spec_config.enable_suffix_decoding:
                from concurrent.futures import ThreadPoolExecutor

                from arcticinference_tpu.spec.suffix_cache import SuffixCache
                self._suffix_cache = SuffixCache(
                    self.spec_config.suffix_cache_max_depth)
                # Prompt-tree builds run here, overlapped with prefill
                # (admission-time submit; installed at first commit) —
                # the serial build burst was the dominant first-step
                # host cost on batch admission (suffix TTFT item).
                self._prompt_tree_pool = ThreadPoolExecutor(
                    max_workers=4, thread_name_prefix="suffix-prompt")
                self._prompt_tree_futs = {}
                # Bound pending builds: a deep waiting queue must not
                # hold completed trees in futures indefinitely.  A
                # request past the bound falls back to the synchronous
                # build at its first commit (_update_suffix_cache).
                self._prompt_tree_bound = \
                    2 * config.scheduler.max_num_seqs
            if self.spec_config.method in ("arctic", "mlp_speculator",
                                           "lstm_speculator"):
                # Works multihost too: the drafter chain runs
                # LEADER-LOCAL on the replicated sample-row output (see
                # spec/proposer.py), so the follower mirror never sees a
                # second device program.
                from arcticinference_tpu.spec.proposer import ArcticProposer
                self._drafter = ArcticProposer(
                    self.spec_config, arch,
                    target_params=self.runner.params)
            if self.spec_config.enable_fused_decode:
                from arcticinference_tpu.engine.fused_decode import (
                    FusedDecodeLoop)
                fused = FusedDecodeLoop(self)
                # Only install the loop where it can actually engage;
                # otherwise the sync path keeps full drafting duties.
                if fused.eligible():
                    self._fused = fused

    # ------------------------------------------------------------------ #
    # Request management
    # ------------------------------------------------------------------ #

    def add_request(self, req_id: str, prompt_token_ids: list[int],
                    sampling: Optional[SamplingParams] = None) -> Request:
        if not prompt_token_ids:
            raise ValueError("prompt must not be empty")
        if sampling is not None and sampling.stop and \
                self.tokenizer is None:
            raise ValueError(
                "string stop sequences need a tokenizer (none is "
                "configured for this engine)")
        if len(prompt_token_ids) >= self.config.model.max_model_len:
            raise ValueError(
                f"prompt length {len(prompt_token_ids)} >= max_model_len "
                f"{self.config.model.max_model_len}")
        req = Request(req_id=req_id,
                      prompt_token_ids=list(prompt_token_ids),
                      sampling=sampling or SamplingParams(),
                      arrival_time=time.time())
        if self._suffix_cache is not None and \
                self._prompt_tree_pool is not None and \
                req_id not in self._prompt_tree_futs and \
                len(self._prompt_tree_futs) < self._prompt_tree_bound and \
                not self._suffix_cache.has_cached_prompt(req_id):
            self._prompt_tree_futs[req_id] = self._prompt_tree_pool.submit(
                self._suffix_cache.build_prompt_tree,
                req.prompt_token_ids)
        self.scheduler.add_request(req)
        return req

    def abort_request(self, req_id: str):
        # The fused decode loop owns device-side request state (and its
        # in-flight steps write into the request's blocks): settle it
        # before the scheduler releases anything.
        if self._fused is not None and self._fused.active:
            self._fused.exit()
        req = self.scheduler.abort_request(req_id)
        if req is not None:
            self._evict_spec_state(req)
        return req

    @property
    def has_unfinished(self) -> bool:
        return self.scheduler.num_unfinished > 0 or bool(self._inflight)

    def close(self) -> None:
        """Release host-side resources (idempotent).  The suffix
        prompt-tree worker pool holds non-daemon threads and completed
        trees in pending futures; engine teardown must not leak them."""
        pool = getattr(self, "_prompt_tree_pool", None)
        if pool is not None:
            for fut in self._prompt_tree_futs.values():
                fut.cancel()
            self._prompt_tree_futs.clear()
            pool.shutdown(wait=False, cancel_futures=True)
            self._prompt_tree_pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    # ------------------------------------------------------------------ #
    # Step loop
    # ------------------------------------------------------------------ #

    def step(self) -> list[Request]:
        """Run one engine iteration; returns requests finished this step.

        With async scheduling, dispatches the next device step before
        syncing the oldest in-flight one (host<->device latency hides
        behind device compute); otherwise fully synchronous.
        """
        t0 = time.perf_counter()
        kind, finished = self._step_inner()
        self.step_times.observe(kind, time.perf_counter() - t0)
        return finished

    def _step_inner(self) -> tuple[str, list[Request]]:
        if self._pipeline and not self._any_guided():
            return "pipelined", self._step_pipelined()
        if self._inflight:
            self._flush_inflight()
        # Device-resident fused decode: when every running request sits at
        # its decode frontier and a draft model is configured, the whole
        # verify/commit/re-draft cycle pipelines on device (see
        # engine/fused_decode.py); prefill and admission fall through to
        # the synchronous path.
        if self._fused is not None:
            if not self._fused.active and self._fused.can_enter():
                self._fused.enter()
            if self._fused.active:
                finished = self._fused.step()
                if self._fused.active or finished:
                    return "fused", finished
                # Exited without anything to report (e.g. block
                # pre-extension failed before the first dispatch): fall
                # through so the sync path makes progress this iteration.
        return "sync", self._step_sync()

    # -- profiling -------------------------------------------------------

    def start_profile(self, trace_dir: str) -> None:
        """Begin a JAX profiler trace (device timelines; view in
        TensorBoard/XProf).  Mirrors vLLM's /start_profile."""
        import jax

        jax.profiler.start_trace(trace_dir)
        self._profiling = True

    def stop_profile(self) -> None:
        import jax

        if getattr(self, "_profiling", False):
            jax.profiler.stop_trace()
            self._profiling = False

    def _any_guided(self) -> bool:
        """Whether some request forces the synchronous step path.

        Penalties need host-known token histories at dispatch time
        (pipelined steps would upload PENDING placeholders).  Guided
        requests ride the pipeline when every grammar is DFA-compiled
        and fits the device pool: masks + state advance then run on
        device (ops/guided.py) with zero per-step host work.  Non-DFA
        decoders (pushdown json_object) and oversize grammars still need
        per-step host feedback -> sync.  Plain logprobs requests ride
        the pipeline (top-k rows are read at drain time).
        """
        reqs = (*self.scheduler.running, *self.scheduler.waiting)
        if any(r.sampling.needs_penalties for r in reqs):
            return True
        guided = [r.sampling.guided for r in reqs
                  if r.sampling.guided is not None]
        if not guided:
            return False
        if not self.runner.guided_device_ok:
            return True
        indexes = set()
        for g in guided:
            idx = getattr(g, "index", None)
            if idx is None or not self.runner.guided_fits_pool(idx):
                return True
            indexes.add(id(idx))
        return len(indexes) > self.runner.GUIDED_POOL_SLOTS

    def _guided_slot(self, decoder) -> int:
        """Pool slot for this decoder's grammar, uploading its tables on
        first use; slots are keyed by compiled-grammar identity (the
        TokenDfaIndex cache makes same-pattern requests share one)."""
        key = id(decoder.index)
        entry = self._guided_slots.get(key)
        if entry is not None:
            return entry[0]
        used = {s for s, _ in self._guided_slots.values()}
        if len(used) >= self.runner.GUIDED_POOL_SLOTS:
            live = {id(r.sampling.guided.index)
                    for r in (*self.scheduler.running,
                              *self.scheduler.waiting)
                    if r.sampling.guided is not None
                    and getattr(r.sampling.guided, "index", None)
                    is not None}
            self._guided_slots = {k: v for k, v in
                                  self._guided_slots.items() if k in live}
            used = {s for s, _ in self._guided_slots.values()}
        slot = next(i for i in range(self.runner.GUIDED_POOL_SLOTS)
                    if i not in used)
        self.runner.upload_guided_tables(slot, decoder.index)
        # Keep a strong ref to the index so its id() can't be recycled
        # while the slot mapping lives.
        self._guided_slots[key] = (slot, decoder.index)
        return slot

    # -- pipelined path -------------------------------------------------

    def _step_pipelined(self) -> list[Request]:
        sched_out = self.scheduler.schedule()
        flushed: list[Request] = []
        if sched_out.preempted:
            # Preempted requests may hold pending tokens that their
            # restart path would otherwise re-prefill as garbage.
            flushed = self._flush_inflight()
            if flushed:
                # The drain can FINISH requests already in this step's
                # schedule (their last pending token resolved and a stop
                # condition fired, trimming the overshoot placeholders):
                # their scheduled entries are now stale garbage.
                sched_out.scheduled = [
                    s for s in sched_out.scheduled
                    if not s.request.status.is_finished]
        if not sched_out.scheduled:
            return flushed + (self._sync_oldest() if self._inflight
                              else [])
        self._maybe_observe(sched_out)

        # Token passthrough: requests whose newest token is still
        # device-resident read it from the previous step's output vector.
        passthrough = {}
        prev = self._inflight[-1] if self._inflight else None
        for s in sched_out.scheduled:
            req = s.request
            if req.output_token_ids and \
                    req.output_token_ids[-1] == PENDING_TOKEN:
                ref = self._pending_ref.get(req.req_id)
                if ref is None:
                    raise RuntimeError("pending token without ref")
                step_obj, row_abs = ref
                if step_obj is not prev:
                    # Produced two+ steps back and still unsynced: drain
                    # oldest steps until the value lands on host or the
                    # producing step becomes the newest in flight.
                    while (self._inflight
                           and req.output_token_ids[-1] == PENDING_TOKEN
                           and self._inflight[-1] is not step_obj):
                        # Collect finishes: a request completed by this
                        # drain must still be reported to the caller.
                        flushed.extend(self._sync_oldest())
                if req.output_token_ids[-1] == PENDING_TOKEN:
                    passthrough[req.req_id] = row_abs

        # The passthrough drain above can finish scheduled requests
        # (stop strings, grammar completion): drop their stale entries.
        sched_out.scheduled = [s for s in sched_out.scheduled
                               if not s.request.status.is_finished]
        if not sched_out.scheduled:
            return flushed

        prev = self._inflight[-1] if self._inflight else None
        # Device-resident guided state: seed from the previous step's
        # output vector when this request's state is still in flight
        # there, else from the host decoder's committed state.
        guided_dev = {}
        for s in sched_out.scheduled:
            g = s.request.sampling.guided
            if g is None:
                continue
            slot = self._guided_slot(g)
            src = -1
            if prev is not None and prev.step_inputs.guided_index and \
                    s.request.req_id in prev.step_inputs.guided_index:
                src = (prev.gstate_base
                       + prev.step_inputs.guided_index[s.request.req_id])
            guided_dev[s.request.req_id] = (slot, src, g.state)
        step_inputs = self.runner.prepare_inputs(
            sched_out, passthrough, guided_dev or None)
        self._rng, step_rng = jax.random.split(self._rng)
        need_topk = any(s.request.sampling.logprobs
                        for s in sched_out.scheduled)
        tokens_dev, rows = self.runner.dispatch(
            step_inputs, step_rng, need_topk=need_topk,
            prev_tokens=prev.tokens_dev if prev is not None else None)

        # Start the host copy immediately; by sync time (1-2 steps later)
        # the bytes are already on host and np.asarray is ~free.
        try:
            tokens_dev.copy_to_host_async()
        except AttributeError:
            pass
        inflight = _InflightStep(sched_out, step_inputs, tokens_dev)
        if step_inputs.gstate_count:
            inflight.gstate_base = 2 * step_inputs.s_pad + (
                2 * step_inputs.s_pad * self.runner.GUIDED_TOPK
                if need_topk else 0)
        # Optimistic commit: placeholders for every produced token.
        for r, s in enumerate(sched_out.scheduled):
            req = s.request
            if req.num_computed_tokens + s.num_new_tokens < \
                    req.num_tokens:
                self.scheduler.update_after_step(s, [], 0)
                continue
            lo = step_inputs.sample_row_start[r]
            row_abs = lo + (step_inputs.s_pad
                            if req.sampling.temperature > 0 else 0)
            inflight.commits.append(
                (req, len(req.output_token_ids), row_abs,
                 lo if need_topk and req.sampling.logprobs else -1))
            self.scheduler.update_after_step(s, [PENDING_TOKEN], 0)
            self._pending_ref[req.req_id] = (inflight, row_abs)
        self._inflight.append(inflight)

        finished: list[Request] = list(flushed)
        while len(self._inflight) > self._pipeline_depth:
            finished.extend(self._sync_oldest())
        self.engine_stats.num_steps += 1
        self.engine_stats.num_finished += len(finished)
        return finished

    def _sync_oldest(self) -> list[Request]:
        if not self._inflight:
            return []
        step = self._inflight.pop(0)
        tokens = np.asarray(step.tokens_dev)
        finished: list[Request] = []
        for req, out_pos, row_abs, lp_row in step.commits:
            if req.status.is_finished:
                continue  # stopped by an earlier commit; discard
            assert req.output_token_ids[out_pos] == PENDING_TOKEN
            req.output_token_ids[out_pos] = int(tokens[row_abs])
            if lp_row >= 0:
                # Pipelined logprobs: ranked candidates ride the packed
                # token vector (runner layout: [argmax, sampled, topk,
                # bitcast logp]); decode this row's slice at drain time.
                kk = self.runner.GUIDED_TOPK
                s = step.step_inputs.s_pad
                cand = tokens[2 * s + lp_row * kk:
                              2 * s + (lp_row + 1) * kk]
                logp = tokens[2 * s + s * kk + lp_row * kk:
                              2 * s + s * kk + (lp_row + 1) * kk]                     .view(np.float32)
                n = req.sampling.logprobs
                while len(req.output_logprobs) <= out_pos:
                    req.output_logprobs.append({})
                req.output_logprobs[out_pos] = {
                    int(t): float(p)
                    for t, p in zip(cand[:n], logp[:n])}
            ref = self._pending_ref.get(req.req_id)
            if ref is not None and ref[0] is step:
                del self._pending_ref[req.req_id]
            if req.first_token_time is None:
                req.first_token_time = time.time()
            stop = None
            g = req.sampling.guided
            if g is not None:
                # Device-resident guided path: the host decoder replays
                # the committed token to stay authoritative for finish
                # detection; overshoot tokens sampled past grammar
                # completion (the device's bit-0 sentinel) are trimmed,
                # exactly like length overshoot under async scheduling.
                g.advance_token(req.output_token_ids[out_pos])
                if getattr(g, "state", 0) == -1:
                    # Unreachable when masks are sound: compile-time
                    # token_dead_ends() rejects grammars that could
                    # strand a request, so a dead state here means the
                    # device let a token through that the grammar
                    # forbids.  Fail the request loudly (ABORTED ->
                    # HTTP 500) instead of trimming to an empty 200.
                    logger.warning(
                        "guided request %s reached a dead grammar state "
                        "at output position %d (token %d) — device mask "
                        "inconsistency; aborting the request",
                        req.req_id, out_pos,
                        req.output_token_ids[out_pos])
                    del req.output_token_ids[out_pos:]
                    stop = RequestStatus.FINISHED_ABORTED
                elif g.finished():
                    del req.output_token_ids[out_pos + 1:]
                    stop = RequestStatus.FINISHED_STOPPED
            if stop is None:
                stop = self._check_stop_prefix(req)
            if stop is not None:
                req.finish_time = time.time()
                self.scheduler.finish_request(req, stop)
                self._pending_ref.pop(req.req_id, None)
                finished.append(req)
        return finished

    def _check_stop_prefix(self, req: Request):
        """Stop conditions over the host-known prefix of the output
        (tokens before the first still-pending placeholder)."""
        out = req.output_token_ids
        try:
            prefix = out.index(PENDING_TOKEN)
        except ValueError:
            prefix = len(out)
        sp = req.sampling
        for i in range(prefix):
            tok = out[i]
            if (not sp.ignore_eos and self.eos_token_id is not None
                    and tok == self.eos_token_id) or \
                    tok in sp.stop_token_ids:
                del out[i + 1:]
                return RequestStatus.FINISHED_STOPPED
        if self._check_stop_strings(req, prefix):
            del out[prefix:]
            return RequestStatus.FINISHED_STOPPED
        if prefix >= sp.max_tokens:
            del out[sp.max_tokens:]
            return RequestStatus.FINISHED_LENGTH
        if len(req.prompt_token_ids) + prefix >= \
                self.config.model.max_model_len:
            del out[prefix:]
            return RequestStatus.FINISHED_LENGTH
        return None

    def _check_stop_strings(self, req: Request,
                            known: Optional[int] = None) -> bool:
        """OpenAI ``stop`` string sequences: finish when one appears in
        the decoded output; ``req.final_text`` records the user-visible
        text cut just before the stop (vLLM's default
        include_stop_str_in_output=False semantics)."""
        sp = req.sampling
        if not sp.stop or self.tokenizer is None:
            return False
        out = req.output_token_ids
        if known is None:
            known = len(out)
        # Bounded re-decode window: stop sequences are short; the slack
        # covers multi-token renderings and BPE boundary effects.
        win = 16 + max(len(s) for s in sp.stop)
        text = self.tokenizer.decode(out[max(0, known - win):known])
        if not any(s in text for s in sp.stop):
            return False
        full = self.tokenizer.decode(out[:known])
        cut = min((idx for idx in (full.find(s) for s in sp.stop)
                   if idx != -1), default=-1)
        req.final_text = full[:cut] if cut >= 0 else full
        return True

    def _stop_with_strings(self, req: Request, stop):
        if stop is None and self._check_stop_strings(req):
            return RequestStatus.FINISHED_STOPPED
        return stop

    def _flush_inflight(self) -> list[Request]:
        out: list[Request] = []
        while self._inflight:
            out.extend(self._sync_oldest())
        return out

    # -- synchronous path ----------------------------------------------

    def _step_sync(self, sched_out=None) -> list[Request]:
        if sched_out is None:
            sched_out = self.scheduler.schedule()
        if not sched_out.scheduled:
            return []
        self._maybe_observe(sched_out)
        for req in sched_out.preempted:
            self._evict_spec_state(req)

        step_inputs = self.runner.prepare_inputs(sched_out)
        self._rng, step_rng = jax.random.split(self._rng)
        # DFA-backed guided requests are constrained by device-applied
        # vocab masks (prepare_inputs ships them; dp layout doesn't) —
        # only non-mask decoders and logprobs still need candidates.
        mask_capable = "guided_rows" in step_inputs.arrays
        need_topk = any(
            s.request.sampling.logprobs
            or (s.request.sampling.guided is not None
                and not (mask_capable and getattr(
                    s.request.sampling.guided, "mask_words", None)))
            for s in sched_out.scheduled)
        out = self.runner.execute(step_inputs, step_rng,
                                  need_topk=need_topk)
        if need_topk:
            argmax, sampled, rows, topk, topk_logp = out
        else:
            argmax, sampled, rows = out
            topk = topk_logp = None

        finished: list[Request] = []
        accepted_row: dict[str, int] = {}
        capture_items: list = []
        for r, s in enumerate(sched_out.scheduled):
            req = s.request
            lo = step_inputs.sample_row_start[r]
            k = step_inputs.sample_row_count[r]

            if req.num_computed_tokens + s.num_new_tokens < \
                    req.num_tokens:
                # Mid-prefill / recompute catch-up: no token produced.
                self.scheduler.update_after_step(s, [], 0)
                continue

            guided = req.sampling.guided
            if guided is not None:
                if mask_capable and \
                        getattr(guided, "mask_words", None) is not None:
                    # Device-masked (DFA) path: the sampled token is
                    # grammar-valid by construction — take it directly
                    # (exact constrained sampling, no top-K bias).
                    row = sampled if req.sampling.temperature > 0 \
                        else argmax
                    tok = int(row[lo + k - 1])
                    if not guided.allows_token(tok):
                        # All-zero mask (wedged automaton): degrade.
                        tok = guided.fallback_token()
                        if tok is None:
                            tok = int(argmax[lo + k - 1])
                elif topk is not None:
                    # Host top-K filtering path: first ranked candidate
                    # that keeps the output valid; grammar fallback when
                    # all K are invalid.
                    tok = guided.pick(topk[lo])
                    if tok is None:
                        tok = guided.fallback_token()
                    if tok is None:
                        tok = int(argmax[lo])
                else:
                    tok = int(argmax[lo])
                guided.advance_token(tok)
                if req.sampling.logprobs and topk_logp is not None:
                    n = req.sampling.logprobs
                    req.output_logprobs.append({
                        int(t): float(p) for t, p in
                        zip(topk[lo][:n], topk_logp[lo][:n])})
                self.scheduler.update_after_step(s, [int(tok)], 0)
                accepted_row[req.req_id] = lo
                if req.first_token_time is None:
                    req.first_token_time = time.time()
                stop = self._stop_with_strings(
                    req, req.check_stop(self.eos_token_id,
                                        self.config.model.max_model_len))
                if stop is None and guided.finished():
                    stop = RequestStatus.FINISHED_STOPPED
                if stop is not None:
                    req.finish_time = time.time()
                    self.scheduler.finish_request(req, stop)
                    self._evict_spec_state(req)
                    finished.append(req)
                continue

            # Verification: greedy requests accept against the argmax
            # chain; temperature>0 requests use sample-and-compare (the
            # device samples every verify row from the target
            # distribution; accepting draft==sample is unbiased).
            drafts = s.spec_token_ids
            use_sampler = req.sampling.temperature > 0
            rowvals = (sampled if use_sampler else argmax)[lo:lo + k]
            if s.spec_parents is not None and drafts:
                # Token-tree verification: walk the tree from the
                # frontier, at each node following the child whose token
                # matches the target's next-token choice at that node's
                # verify row (longest root-path match + bonus).  Accepted
                # tokens' KV sits at scratch slots, so commit with
                # num_accepted=0 — the scheduler re-feeds them next step.
                childs: dict[int, list[int]] = {}
                for i, p in enumerate(s.spec_parents):
                    childs.setdefault(p, []).append(i)
                cur = -1
                path: list[int] = []
                while True:
                    prow = 0 if cur < 0 else 1 + cur
                    want = int(rowvals[prow])
                    nxt = next((c for c in childs.get(cur, ())
                                if drafts[c] == want), None)
                    if nxt is None:
                        bonus = want
                        break
                    path.append(nxt)
                    cur = nxt
                new_tokens = [int(drafts[c]) for c in path] + [bonus]
                n_acc = 0
                self.spec_stats.observe(len(drafts), len(path))
                req.num_draft_tokens += len(drafts)
                req.num_accepted_draft_tokens += len(path)
                accepted_row[req.req_id] = lo + (0 if cur < 0
                                                 else 1 + cur)
            else:
                n_acc = 0
                for i, d in enumerate(drafts):
                    if rowvals[i] == d:
                        n_acc += 1
                    else:
                        break
                new_tokens = [int(x) for x in drafts[:n_acc]] + \
                    [int(rowvals[n_acc])]
                if drafts:
                    self.spec_stats.observe(len(drafts), n_acc)
                    req.num_draft_tokens += len(drafts)
                    req.num_accepted_draft_tokens += n_acc
                accepted_row[req.req_id] = lo + n_acc

            if req.first_token_time is None:
                req.first_token_time = time.time()
            if req.sampling.logprobs and topk is not None:
                n = req.sampling.logprobs
                for i in range(len(new_tokens)):
                    row = lo + i
                    req.output_logprobs.append({
                        int(t): float(p) for t, p in
                        zip(topk[row][:n], topk_logp[row][:n])})
            self.scheduler.update_after_step(s, new_tokens, n_acc)
            self._update_suffix_cache(req, new_tokens)
            if self.hidden_capture is not None and \
                    s.spec_parents is None:
                # Every committed token pairs with the verify row that
                # produced it (row lo+i's hidden supervises
                # new_tokens[i]); tree drafts use scratch rows whose
                # mapping differs, so they are not captured.
                capture_items.extend(
                    (req.req_id, lo + i, new_tokens[i])
                    for i in range(len(new_tokens)))

            stop = self._stop_with_strings(
                req, req.check_stop(self.eos_token_id,
                                    self.config.model.max_model_len))
            if stop is not None:
                req.finish_time = time.time()
                self.scheduler.finish_request(req, stop)
                self._evict_spec_state(req)
                finished.append(req)

        if self.hidden_capture is not None and capture_items:
            self.hidden_capture(rows, capture_items)
        self._propose_drafts(sched_out, step_inputs, rows, accepted_row)
        self.engine_stats.num_steps += 1
        self.engine_stats.num_finished += len(finished)
        return finished


    def _maybe_observe(self, sched_out) -> None:
        obs = self.config.observability
        for s in sched_out.scheduled:
            if s.request.is_prefilling:
                self.engine_stats.num_prompt_tokens += s.num_new_tokens
            else:
                self.engine_stats.num_generated_tokens += s.num_new_tokens
        now = time.time()
        if now - self._last_log >= obs.log_interval_s:
            self._last_log = now
            st = self.engine_stats
            msg = (f"steps={st.num_steps} running="
                   f"{len(self.scheduler.running)} waiting="
                   f"{len(self.scheduler.waiting)} gen_tok/s="
                   f"{st.tokens_per_second():.1f} free_blocks="
                   f"{self.scheduler.block_manager.num_free_blocks}")
            if self.spec_stats.num_drafts:
                msg += (f" spec_accept="
                        f"{self.spec_stats.acceptance_rate:.2f}")
            logger.info(msg)
        if obs.enable_profiling and obs.profile_dir and not self._profiling:
            jax.profiler.start_trace(obs.profile_dir)
            self._profiling = True

    # ------------------------------------------------------------------ #
    # Speculation
    # ------------------------------------------------------------------ #

    def _spec_disabled_now(self) -> bool:
        sc = self.spec_config
        if sc is None:
            return True
        if sc.disable_by_batch_size and \
                len(self.scheduler.running) > sc.disable_by_batch_size:
            return True
        return False

    def _propose_drafts(self, sched_out: SchedulerOutput, step_inputs,
                        rows, accepted_row: dict[str, int]) -> None:
        if self._spec_disabled_now():
            return
        if self._fused is not None:
            # The fused loop owns drafting: every decode-phase step runs
            # device-resident.  The sync path only covers prefill /
            # admission transitions, where drafts buy ~nothing but every
            # distinct draft length compiles a fresh verify-row bucket
            # ([rows, vocab] f32 logits — multi-second compiles and GBs
            # of transients at 8B/128k-vocab scale).
            return
        sc = self.spec_config
        tree = bool(sc.use_tree_spec)

        def proposable(req):
            if req.status.is_finished or \
                    req.sampling.guided is not None or \
                    req.sampling.needs_penalties:
                return False
            if req.num_computed_tokens >= req.num_tokens - 1:
                return True          # at the decode frontier
            # Tree mode re-verifies accepted tokens next step, so the
            # request is draftable as soon as its prompt is computed.
            return tree and \
                req.num_computed_tokens >= len(req.prompt_token_ids)

        suffix_results = {}
        if self._suffix_cache is not None:
            items = []
            for s in sched_out.scheduled:
                req = s.request
                if not proposable(req):
                    continue
                pattern = req.all_token_ids[-sc.suffix_cache_max_depth:]
                cap = min(sc.num_speculative_tokens,
                          self.config.model.max_model_len
                          - req.num_tokens - 1)
                if tree:
                    cap = min(cap, 30)   # ancestor bitmask width
                if not pattern or cap <= 0:
                    continue
                items.append((req.req_id, dict(
                    req_id=req.req_id, pattern=pattern,
                    max_spec_tokens=cap,
                    max_spec_factor=sc.suffix_max_spec_factor,
                    max_spec_offset=sc.suffix_max_spec_offset,
                    min_token_prob=sc.suffix_min_token_prob,
                    use_tree_spec=tree,
                    use_cached_prompt=self._suffix_cache.has_cached_prompt(
                        req.req_id))))
            # GIL-free per-request walks over the suffix worker pool
            # (see SuffixCache.speculate_batch).
            suffix_results = self._suffix_cache.speculate_batch(
                items, pool=getattr(self, "_prompt_tree_pool", None))

        # Choose suffix drafts when the expected acceptance beats what the
        # draft model would offer (reference model_runner.py:546-575).
        min_score = (0 if sc.method == "suffix"
                     else sc.num_speculative_tokens)
        drafter_reqs = []
        for s in sched_out.scheduled:
            req = s.request
            if not proposable(req):
                continue
            res = suffix_results.get(req.req_id)
            if res is not None and res.score >= min_score and res.token_ids:
                req.spec_token_ids = [int(t) for t in res.token_ids]
                parents = list(res.parents)
                # A pure chain rides the cheaper linear path (its KV
                # lands at the right slots, no re-feed needed).
                is_chain = all(p == i - 1 for i, p in enumerate(parents))
                req.spec_parents = None if is_chain else parents
            elif self._drafter is not None and \
                    req.num_computed_tokens >= req.num_tokens - 1:
                drafter_reqs.append(s)

        if drafter_reqs and self._drafter is not None:
            self._drafter.propose(
                drafter_reqs, step_inputs, rows, accepted_row,
                max_len_cap=self.config.model.max_model_len)

    def _update_suffix_cache(self, req: Request,
                             new_tokens: list[int]) -> None:
        if self._suffix_cache is None:
            return
        if not self._suffix_cache.has_cached_prompt(req.req_id):
            fut = self._prompt_tree_futs.pop(req.req_id, None)
            if fut is not None:
                self._suffix_cache.install_prompt_tree(req.req_id,
                                                       fut.result())
            else:
                self._suffix_cache.cache_prompt(req.req_id,
                                                req.prompt_token_ids)
        self._suffix_cache.update_response(req.req_id, new_tokens)

    def _evict_spec_state(self, req: Request) -> None:
        if self._suffix_cache is not None:
            fut = self._prompt_tree_futs.pop(req.req_id, None)
            if fut is not None:
                fut.cancel()
            if self._suffix_cache.has_cached_prompt(req.req_id):
                self._suffix_cache.evict_prompt(req.req_id)
