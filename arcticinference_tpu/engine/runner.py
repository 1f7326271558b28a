"""Model runner: lowers SchedulerOutput to padded device arrays, runs the
jitted step, returns per-request verification results.

The TPU analogue of the reference's GPUModelRunner (reference
``model_runner.py:218-524``), re-designed for XLA:

- Every step runs at a *bucketed* shape (token count and sample-row count
  padded to powers of two) so the set of compiled programs is bounded —
  the role CUDA-graph capture lists play in the reference
  (``model_runner.py:240-253``).
- The KV cache is donated to the jitted step, so scatter updates are in
  place.
- Greedy speculative verification happens host-side on the returned
  argmax rows (cheap: <= a few hundred int comparisons), which keeps the
  device program free of dynamic shapes.  Temperature sampling runs on
  device with per-row parameters.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from arcticinference_tpu.config import EngineConfig
from arcticinference_tpu.engine.scheduler import SchedulerOutput
from arcticinference_tpu.ops.kv_cache import KVCacheSpec, allocate_kv_cache
from arcticinference_tpu.ops.pallas.ragged_attention import build_work_items

#: Pallas ragged-attention schedule array names (host-built prefetch).
_ATTN_SCHED_KEYS = ("attn_item_req", "attn_item_qstart", "attn_item_qlen",
                    "attn_item_pages", "attn_item_pos_base",
                    "attn_token_item", "attn_token_off")
from arcticinference_tpu.utils import cdiv, default_token_buckets, \
    pad_to_bucket


@dataclass
class StepInputs:
    """Host-side arrays for one engine step (already padded)."""

    arrays: dict[str, np.ndarray]
    t_pad: int
    s_pad: int
    attn_qb: int
    # Row ranges into the sample rows per scheduled request.
    sample_row_start: list[int]
    sample_row_count: list[int]
    total_tokens: int = 0
    # Device-resident guided decoding: req_id -> index into the step's
    # guided rows, and the padded guided-row count (the appended
    # grammar-state segment's length in the output token vector).
    guided_index: Optional[dict] = None
    gstate_count: int = 0


class ModelRunner:

    def __init__(self, config: EngineConfig, module, arch, params,
                 mesh=None):
        self.config = config
        self.module = module
        self.arch = arch
        self.mesh = mesh
        # Per-layer [k_scale, v_scale] fp8-KV dequant pairs ride the
        # checkpoint pytree (reference: vLLM k_scale/v_scale); pull them
        # out before sharding (they are runner state, not weights).
        loaded_kv_scales = (params.pop("kv_scales", None)
                            if isinstance(params, dict) else None)
        pcfg = config.parallel
        if pcfg.world_size > 1 and config.model.quantization == "int4":
            # int4's split-half nibble packing couples row u with row
            # u + K/2 in one byte, so the packed in-dim cannot be
            # contiguously sharded/re-sliced; int4 stays single-chip.
            # (int8's per-channel scales shard/re-slice fine — see
            # mesh.quantized_leaf_spec / ParallelContext._slice_scale.)
            raise NotImplementedError(
                "int4 weight quantization is single-chip; use fp8/int8 "
                "on meshes")
        self.dp = pcfg.data_parallel_size
        # Fused qkv / gate+up weight layout: one dot per group halves the
        # fixed per-dot cost on the decode weight stream (exact same
        # dequant values — per-segment scales ride the dot epilogue).
        # On meshes the fusion interleaves PER-FUSED-SHARD segments
        # (interleave = tp * (sp if shift else 1)) so the column order
        # survives the contiguous tp split and the shift re-slice
        # (ops/fp8.fuse_quantized; round-4 verdict item 6).  Gated to
        # whole heads/columns per fused shard — which also excludes the
        # kv-replication case (head-granular kv re-slicing cannot reach
        # inside the fusion).
        from arcticinference_tpu import envs as _envs
        fuse_hook = getattr(module, "fuse_params", None)
        if (fuse_hook is not None
                and not _envs.ARCTIC_TPU_DISABLE_FUSED_WEIGHTS):
            tp = pcfg.tensor_parallel_size
            sp = pcfg.ulysses_sequence_parallel_size
            fuse_w = tp * (sp if pcfg.enable_shift_parallel else 1)
            if (arch.num_heads % fuse_w == 0
                    and arch.num_kv_heads % fuse_w == 0
                    and arch.intermediate_size % fuse_w == 0):
                import functools as _ft
                params = jax.jit(
                    _ft.partial(fuse_hook, interleave=fuse_w),
                    donate_argnums=0)(params)
        if pcfg.world_size > 1 and mesh is None:
            from arcticinference_tpu.parallel import mesh as mesh_lib

            self.mesh = mesh_lib.build_mesh(pcfg)
            pp = pcfg.pipeline_parallel_size
            if pp > 1:
                if getattr(module, "scan_layers", None) is None:
                    raise NotImplementedError(
                        f"{module.__name__} does not support pp")
                if arch.num_layers % pp != 0:
                    raise ValueError(
                        f"num_layers={arch.num_layers} must divide by "
                        f"pipeline_parallel_size={pp}")
                # Each stage's microbatch (T/pp rows) is further sharded
                # over sp in SP mode, so buckets must divide by pp*sp.
                div = pp * pcfg.ulysses_sequence_parallel_size
                for b in default_token_buckets(
                        config.scheduler.max_num_batched_tokens):
                    if b % div:
                        raise ValueError(
                            f"token bucket {b} not divisible by pp*sp="
                            f"{div}; use a power-of-two "
                            "max_num_batched_tokens")
            hook = getattr(module, "param_specs", None)
            specs = (hook(pp=pp > 1) if hook is not None
                     else mesh_lib.param_specs(pp=pp > 1))
            params = mesh_lib.shard_params(params, self.mesh, specs)
        else:
            # Single device: materialise once (the loader may hand back
            # host arrays to avoid double-buffering big checkpoints).
            params = jax.device_put(params)
        self.params = params

        cache_cfg = config.cache
        self.block_size = cache_cfg.block_size
        self.max_blocks_per_req = cdiv(config.model.max_model_len,
                                       self.block_size)
        num_blocks = cache_cfg.num_blocks or self._auto_num_blocks()
        if self.dp > 1:
            num_blocks -= num_blocks % self.dp
        self.num_blocks = num_blocks
        # In-engine DP: the block axis shards over "dp"; block ids are
        # SHARD-LOCAL (each dp group owns a private block space).
        self.num_blocks_per_shard = num_blocks // max(self.dp, 1)
        kv_dtype = (jnp.float8_e4m3fn
                    if cache_cfg.kv_cache_dtype == "fp8" else jnp.bfloat16)
        # GQA + replication: when kv heads < sp*tp the cache stores each
        # head sp*tp/Hkv times (one copy per fused-axis shard).
        eff_kv_heads = arch.num_kv_heads
        if self.mesh is not None:
            eff_kv_heads = max(arch.num_kv_heads, pcfg.sp_tp_size)
        self.kv_spec = KVCacheSpec(
            num_layers=arch.num_layers,
            num_blocks=num_blocks,
            num_kv_heads=eff_kv_heads,
            block_size=self.block_size,
            head_dim=arch.head_dim,
            dtype=kv_dtype)
        # Multi-host (multi-controller SPMD): every process mirrors each
        # dispatch; the leader broadcasts step inputs over mh_channel
        # (see parallel/multihost.py).
        self.is_multihost = jax.process_count() > 1
        self.mh_channel = None
        # in-engine dp composes with multihost: the leader broadcasts
        # the dp-stacked step arrays like any others; every process
        # uploads them replicated and shard_map re-shards onto its local
        # (dp, ...) submesh slice (no cross-host resharding traffic).
        if self.mesh is not None:
            from jax.sharding import NamedSharding

            from arcticinference_tpu.parallel import mesh as mesh_lib

            kv_sharding = NamedSharding(
                self.mesh, mesh_lib.kv_cache_spec(
                    pp=config.parallel.pipeline_parallel_size > 1,
                    dp=self.dp > 1))
            if self.is_multihost:
                # Collective zero-init: no host->device transfer, valid
                # when the global array spans other hosts' devices.
                self.kv = jax.jit(
                    lambda: allocate_kv_cache(self.kv_spec),
                    out_shardings=kv_sharding)()
            else:
                self.kv = jax.device_put(allocate_kv_cache(self.kv_spec),
                                         kv_sharding)
        else:
            self.kv = allocate_kv_cache(self.kv_spec)
        if loaded_kv_scales is not None and kv_dtype == jnp.float8_e4m3fn:
            kv_scale = np.asarray(loaded_kv_scales, np.float32)
        else:
            kv_scale = np.ones((arch.num_layers, 2), np.float32)
        self.kv_scale = (self._replicated(kv_scale) if self.is_multihost
                         else jnp.asarray(kv_scale))

        self.b_max = config.scheduler.max_num_seqs
        self.token_buckets = default_token_buckets(
            config.scheduler.max_num_batched_tokens)
        # Verify rows can reach the full token budget when speculative
        # drafts are long (suffix drafts go up to tree depth).
        self.sample_buckets = default_token_buckets(
            max(16, config.scheduler.max_num_batched_tokens))
        self._step_fns: dict[Any, Any] = {}
        self.swift = bool(getattr(module, "NEEDS_SWIFT_SCHEDULE", False))
        self.returns_rows = bool(
            getattr(module, "RETURNS_SAMPLE_ROWS", False))
        self._i32_keys = self._I32_KEYS + (
            tuple(f"swift_{k}" for k in
                  ("item_req", "item_qstart", "item_qlen", "item_pages",
                   "item_pos_base", "token_item", "token_off"))
            if self.swift else ())
        if config.parallel.pipeline_parallel_size > 1:
            # Stacked per-microbatch attention schedules (one row per
            # pipeline microbatch; see prepare_inputs / parallel/pp.py).
            self._i32_keys = self._i32_keys + tuple(
                "pp" + k for k in _ATTN_SCHED_KEYS)

    def _replicated(self, x):
        """Place a host array replicated over the (global) mesh.

        Uses ``make_array_from_callback`` rather than ``device_put``:
        device_put with a cross-process sharding runs a hidden
        ``assert_equal`` process_allgather (a collective!), which both
        adds a sync to every step upload and deadlocks any caller that
        hasn't broadcast to the follower mirrors yet.  Every process
        builds its replica from (identical) host data, purely locally."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, NamedSharding(self.mesh, P()), lambda idx: x[idx])

    def _auto_num_blocks(self) -> int:
        """Size the cache from an HBM budget estimate."""
        from arcticinference_tpu.utils import chip_specs

        param_bytes = sum(
            np.prod(x.shape) * jnp.dtype(x.dtype).itemsize
            for x in jax.tree.leaves(self.params))
        hbm, _ = chip_specs()
        budget = int(hbm * self.config.cache.hbm_utilization) - param_bytes \
            - (1 << 30)  # activations / workspace reserve
        spec = KVCacheSpec(
            num_layers=self.arch.num_layers, num_blocks=1,
            num_kv_heads=self.arch.num_kv_heads,
            block_size=self.block_size, head_dim=self.arch.head_dim,
            dtype=(jnp.float8_e4m3fn
                   if self.config.cache.kv_cache_dtype == "fp8"
                   else jnp.bfloat16))
        n = max(budget // spec.bytes_per_block, 16)
        return int(min(n, 1 << 17))

    # ------------------------------------------------------------------ #
    # Input preparation (host)
    # ------------------------------------------------------------------ #

    def prepare_inputs(self, sched_out: SchedulerOutput,
                       passthrough: Optional[dict] = None,
                       guided_dev: Optional[dict] = None) -> StepInputs:
        """``passthrough`` maps req_id -> absolute row index into the
        PREVIOUS step's device token vector for tokens whose value hasn't
        reached the host yet (async scheduling).

        ``guided_dev`` maps req_id -> (pool_slot, src_abs, init_state)
        for the device-resident guided path: src_abs indexes the
        previous step's output vector (its appended grammar-state
        segment), or -1 to seed from ``init_state``."""
        if self.dp > 1:
            return self._prepare_inputs_dp(sched_out, passthrough,
                                           guided_dev)
        scheduled = sched_out.scheduled
        total = sum(s.num_new_tokens for s in scheduled)
        t_pad = pad_to_bucket(max(total, 1), self.token_buckets)
        b = self.b_max

        input_ids = np.zeros(t_pad, np.int32)
        input_src = np.full(t_pad, -1, np.int32)
        positions = np.zeros(t_pad, np.int32)
        req_idx = np.full(t_pad, -1, np.int32)
        slot_mapping = np.full(t_pad, -1, np.int32)
        block_tables = np.zeros((b, self.max_blocks_per_req), np.int32)
        seq_lens = np.zeros(b, np.int32)
        query_lens = np.zeros(b, np.int64)
        last_pos = np.zeros(b, np.int64)

        sample_rows: list[int] = []
        row_start: list[int] = []
        row_count: list[int] = []
        row_tree_mask = None          # [t_pad] ancestor bitmasks
        tree_start = None             # [B] frontier slot per request

        t = 0
        for r, s in enumerate(scheduled):
            req = s.request
            n = s.num_new_tokens
            ctx = req.num_computed_tokens
            toks = (req.all_token_ids + s.spec_token_ids)[ctx:ctx + n]
            assert len(toks) == n, (len(toks), n, ctx)
            if passthrough and req.req_id in passthrough:
                # The first fed token is the previous step's (still
                # device-resident) output; its host value is a sentinel.
                input_src[t] = passthrough[req.req_id]
                toks = [0] + list(toks[1:])
            input_ids[t:t + n] = toks
            positions[t:t + n] = np.arange(ctx, ctx + n)
            if s.spec_parents is not None and s.spec_token_ids:
                # Token-tree drafts: RoPE positions are depth-based
                # (siblings share a position); cache SLOTS stay linear
                # (slot_mapping below indexes by arange), and attention
                # sees ancestors only via the per-row bitmask.
                nd = len(s.spec_token_ids)
                assert nd <= 30, "tree drafts are capped at 30 nodes"
                chunk = n - nd
                frontier = ctx + chunk - 1   # slot == position (real)
                if row_tree_mask is None:
                    row_tree_mask = np.zeros(t_pad, np.int32)
                    tree_start = np.full(b, -1, np.int32)
                tree_start[r] = frontier
                depth = np.zeros(nd, np.int32)
                mask = np.zeros(nd, np.int32)
                for i, p in enumerate(s.spec_parents):
                    if p < 0:
                        depth[i] = 0
                        mask[i] = 1 | (1 << (i + 1))
                    else:
                        depth[i] = depth[p] + 1
                        mask[i] = mask[p] | (1 << (i + 1))
                positions[t + chunk:t + n] = frontier + 1 + depth
                row_tree_mask[t + chunk:t + n] = mask
            req_idx[t:t + n] = r
            bt = req.block_ids
            block_tables[r, :len(bt)] = bt
            for i in range(n):
                pos = ctx + i
                slot_mapping[t + i] = (bt[pos // self.block_size]
                                       * self.block_size
                                       + pos % self.block_size)
            seq_lens[r] = ctx + n
            query_lens[r] = n
            last_pos[r] = ctx + n - 1
            # Verify rows: the last (#drafts + 1) token rows.
            k = len(s.spec_token_ids) + 1
            row_start.append(len(sample_rows))
            row_count.append(k)
            sample_rows.extend(range(t + n - k, t + n))
            t += n

        s_pad = pad_to_bucket(max(len(sample_rows), 1), self.sample_buckets)
        logits_indices = np.zeros(s_pad, np.int32)
        logits_indices[:len(sample_rows)] = sample_rows

        # Sampling params per row (applied to the bonus/sample rows).
        temperature = np.zeros(s_pad, np.float32)
        top_k = np.zeros(s_pad, np.int32)
        top_p = np.ones(s_pad, np.float32)
        min_p = np.zeros(s_pad, np.float32)
        seeds = np.full(s_pad, -1, np.int32)
        counters = np.zeros(s_pad, np.int32)
        rep_pen = np.ones(s_pad, np.float32)
        pres_pen = np.zeros(s_pad, np.float32)
        freq_pen = np.zeros(s_pad, np.float32)
        any_penalties = False
        for r, s in enumerate(scheduled):
            req = s.request
            sp = req.sampling
            lo, k = row_start[r], row_count[r]
            temperature[lo:lo + k] = sp.temperature
            top_k[lo:lo + k] = sp.top_k
            top_p[lo:lo + k] = sp.top_p
            min_p[lo:lo + k] = sp.min_p
            if sp.seed is not None:
                seeds[lo:lo + k] = sp.seed
                # Counter = absolute position of the token being sampled,
                # so a seeded request's stream is schedule-invariant.
                end = req.num_computed_tokens + s.num_new_tokens
                counters[lo:lo + k] = np.arange(end - k + 1, end + 1)
            if sp.needs_penalties:
                rep_pen[lo:lo + k] = sp.repetition_penalty
                pres_pen[lo:lo + k] = sp.presence_penalty
                freq_pen[lo:lo + k] = sp.frequency_penalty
                any_penalties = True

        # Grammar-guided vocab bitmasks (DFA-backed decoders): the
        # current automaton state's allowed-token mask rides the step
        # inputs and is applied to the logits on device, so constrained
        # sampling is exact (not host-filtered top-K).
        guided_entries: list[tuple[int, np.ndarray]] = []
        dev_entries: list[tuple[int, int, int, int, str]] = []
        for r, s in enumerate(scheduled):
            req = s.request
            g = req.sampling.guided
            if g is None or getattr(g, "mask_words", None) is None:
                continue
            if req.num_computed_tokens + s.num_new_tokens < \
                    req.num_tokens:
                continue   # mid-prefill: no token committed this step
            lo, k = row_start[r], row_count[r]
            row = lo + k - 1
            if guided_dev is not None and req.req_id in guided_dev:
                slot, src, init = guided_dev[req.req_id]
                dev_entries.append((row, slot, src, init, req.req_id))
            else:
                guided_entries.append((row, g.mask_words()))
        assert not (guided_entries and dev_entries), \
            "host-mask and device-pool guided rows cannot mix in a step"

        # Attention work-item schedule.  attn_qb == 1 marks a pure-decode
        # step (one frontier row per request, token order == request
        # order): the model routes it to the grouped decode kernel,
        # which amortizes per-program fixed cost across sequences.  The
        # work-item schedule is still built (at qb=8) so the same packed
        # input layout serves both kernel paths.
        from arcticinference_tpu import envs

        max_qlen = int(query_lens.max(initial=1))
        # Grouped-decode eligibility: token order == request order, one
        # frontier row each.  Works on tp/sp/shift meshes too (post-
        # dispatch attention always sees the full token axis in request
        # order; the kernel runs per-shard on local heads).  Excluded:
        # pp (per-microbatch schedules) and tree verify (ancestor
        # masks ride the work-item kernel).
        pure_decode = (
            max_qlen == 1 and bool(scheduled)
            and self.config.parallel.pipeline_parallel_size == 1
            and row_tree_mask is None
            and not envs.ARCTIC_TPU_DISABLE_GROUPED_DECODE
            and (jax.default_backend() == "tpu"
                 or envs.ARCTIC_TPU_FORCE_PALLAS_INTERPRET))
        attn_qb = 1 if pure_decode else (8 if max_qlen <= 8 else 32)
        sched_qb = 8 if attn_qb == 1 else attn_qb
        num_items = t_pad // sched_qb + b
        schedule = build_work_items(
            query_lens, last_pos, sched_qb, self.block_size, num_items,
            t_pad)
        (item_req, item_qstart, item_qlen, item_pages, item_pos_base,
         token_item, token_off) = schedule

        tree_arrays = {}
        if row_tree_mask is not None:
            # Lower per-request tree data onto the work-item schedule:
            # per-item frontier slot + per-window-row ancestor bitmasks
            # (the kernel reads them from scalar prefetch).
            qw = attn_qb + 8
            it_ts = np.full(item_req.shape[0], -1, np.int32)
            it_mask = np.zeros((item_req.shape[0], qw), np.int32)
            for tt in np.nonzero(row_tree_mask)[0]:
                it = token_item[tt]
                it_mask[it, token_off[tt]] = row_tree_mask[tt]
                it_ts[it] = tree_start[item_req[it]]
            tree_arrays = dict(
                attn_tree_start=tree_start,
                attn_row_tree_mask=row_tree_mask,
                attn_item_tree_start=it_ts,
                attn_item_tree_mask=it_mask)

        arrays = dict(
            input_ids=input_ids, input_src=input_src,
            positions=positions, req_idx=req_idx,
            slot_mapping=slot_mapping, block_tables=block_tables,
            seq_lens=seq_lens, logits_indices=logits_indices,
            temperature=temperature, top_k=top_k, top_p=top_p,
            min_p=min_p, seeds=seeds, counters=counters,
            rep_pen=rep_pen, pres_pen=pres_pen, freq_pen=freq_pen,
            attn_item_req=item_req, attn_item_qstart=item_qstart,
            attn_item_qlen=item_qlen, attn_item_pages=item_pages,
            attn_item_pos_base=item_pos_base, attn_token_item=token_item,
            attn_token_off=token_off,
            **tree_arrays,
        )
        g_buckets = [g for g in (1, 2, 4, 8, 16, 32, 64, 128)
                     if g <= max(self.b_max, 1)] + [self.b_max]
        guided_index = None
        gstate_count = 0
        if guided_entries:
            w = (self.arch.vocab_size + 31) // 32
            g_pad = pad_to_bucket(len(guided_entries), g_buckets)
            grows = np.full(g_pad, -1, np.int32)
            gmask = np.zeros((g_pad, w), np.uint32)
            for i, (row, mask) in enumerate(guided_entries):
                grows[i] = row
                gmask[i, :len(mask)] = mask   # short mask: tail stays 0
            arrays["guided_rows"] = grows
            arrays["guided_mask"] = gmask.view(np.int32)
        elif dev_entries:
            g_pad = pad_to_bucket(len(dev_entries), g_buckets)
            grows = np.full(g_pad, -1, np.int32)
            gslot = np.full(g_pad, -1, np.int32)
            gsrc = np.full(g_pad, -1, np.int32)
            ginit = np.full(g_pad, -1, np.int32)
            guided_index = {}
            for i, (row, slot, src, init, rid) in enumerate(dev_entries):
                grows[i], gslot[i] = row, slot
                gsrc[i], ginit[i] = src, init
                guided_index[rid] = i
            arrays["guided_rows"] = grows
            arrays["gd_slot"] = gslot
            arrays["gd_src"] = gsrc
            arrays["gd_init"] = ginit
            gstate_count = g_pad
        if any_penalties:
            # Token-history matrices for the penalty op (only built when a
            # scheduled request asks for penalties; their presence keys a
            # separate compiled step variant).  -1 padded; bucketed length.
            la = pad_to_bucket(
                max(max((s.request.num_tokens for s in scheduled),
                        default=1), 1), self.token_buckets + [
                    self.config.model.max_model_len])
            pen_out = np.full((s_pad, la), -1, np.int32)
            pen_all = np.full((s_pad, la), -1, np.int32)
            for r, s in enumerate(scheduled):
                req = s.request
                if not req.sampling.needs_penalties:
                    continue
                lo, k = row_start[r], row_count[r]
                out_ids = req.output_token_ids
                all_ids = req.all_token_ids
                pen_out[lo:lo + k, :len(out_ids)] = out_ids
                pen_all[lo:lo + k, :len(all_ids)] = all_ids
            arrays["pen_out_tokens"] = pen_out
            arrays["pen_all_tokens"] = pen_all
        if self.swift:
            # Second ragged-attention schedule over the surviving sample
            # rows (contiguous per request in the s_pad layout).
            srow = np.zeros(b, np.int64)
            for r in range(len(scheduled)):
                srow[r] = row_count[r]
            sw_items = s_pad // 8 + b
            sw = build_work_items(srow, last_pos, 8, self.block_size,
                                  sw_items, s_pad)
            for key, val in zip(("item_req", "item_qstart", "item_qlen",
                                 "item_pages", "item_pos_base",
                                 "token_item", "token_off"), sw):
                arrays[f"swift_{key}"] = val
        pp = self.config.parallel.pipeline_parallel_size
        if pp > 1:
            # Per-microbatch schedules for the Pallas kernel under PP:
            # the GPipe program splits the flat batch into pp contiguous
            # row windows, so each window gets its own (request-clipped)
            # work-item list; stage bodies index the stacked [pp, ...]
            # arrays by microbatch (parallel/pp.py).
            tm = t_pad // pp
            n_items_mb = tm // attn_qb + b
            starts = np.zeros(b, np.int64)
            starts[1:len(scheduled)] = np.cumsum(
                query_lens[:len(scheduled) - 1])
            parts = []
            for mi in range(pp):
                lo, hi = mi * tm, (mi + 1) * tm
                ql = np.zeros(b, np.int64)
                lpos = np.zeros(b, np.int64)
                for r in range(len(scheduled)):
                    a = max(int(starts[r]), lo)
                    z = min(int(starts[r] + query_lens[r]), hi)
                    if z > a:
                        ql[r] = z - a
                        lpos[r] = (last_pos[r]
                                   - (starts[r] + query_lens[r] - z))
                parts.append(build_work_items(
                    ql, lpos, attn_qb, self.block_size, n_items_mb, tm))
            for i, key in enumerate(_ATTN_SCHED_KEYS):
                arrays["pp" + key] = np.stack([p[i] for p in parts])
        return StepInputs(arrays=arrays, t_pad=t_pad, s_pad=s_pad,
                          attn_qb=attn_qb, sample_row_start=row_start,
                          sample_row_count=row_count, total_tokens=total,
                          guided_index=guided_index,
                          gstate_count=gstate_count)

    def _prepare_inputs_dp(self, sched_out: SchedulerOutput,
                           passthrough: Optional[dict] = None,
                           guided_dev: Optional[dict] = None
                           ) -> StepInputs:
        """In-engine DP layout: the token axis is dp-major (each group's
        requests packed into its own t_shard window) and every
        per-request array (block tables, seq lens, attention schedule)
        is stacked with a leading [dp] axis — the shard_map forward
        shards them over "dp" so each group decodes its request set
        independently (parallel/ulysses.py DP_KEYS)."""
        scheduled = sched_out.scheduled
        dp = self.dp
        b = self.b_max
        groups: list[list] = [[] for _ in range(dp)]
        for s in scheduled:
            groups[s.request.dp_shard].append(s)
        shard_tok = [sum(s.num_new_tokens for s in g) for g in groups]
        t_shard = pad_to_bucket(max(max(shard_tok), 1),
                                self.token_buckets)
        t_pad = t_shard * dp

        input_ids = np.zeros(t_pad, np.int32)
        input_src = np.full(t_pad, -1, np.int32)
        positions_flat = np.zeros(t_pad, np.int32)
        positions = np.zeros((dp, t_shard), np.int32)
        req_idx = np.full((dp, t_shard), -1, np.int32)
        slot_mapping = np.full((dp, t_shard), -1, np.int32)
        block_tables = np.zeros((dp, b, self.max_blocks_per_req),
                                np.int32)
        seq_lens = np.zeros((dp, b), np.int32)
        query_lens = np.zeros((dp, b), np.int64)
        last_pos = np.zeros((dp, b), np.int64)

        sample_rows: list[int] = []
        row_start: list[int] = []
        row_count: list[int] = []
        t_cur = [0] * dp
        r_cur = [0] * dp
        s_cnt = [0] * dp          # swift: sample rows per shard so far
        recs: list[tuple] = []    # swift: (shard, ts, n, k, local_off)

        for s in scheduled:
            req = s.request
            sh = req.dp_shard
            n = s.num_new_tokens
            ctx = req.num_computed_tokens
            r = r_cur[sh]
            r_cur[sh] += 1
            ts = t_cur[sh]
            t0 = sh * t_shard + ts
            toks = (req.all_token_ids + s.spec_token_ids)[ctx:ctx + n]
            assert len(toks) == n, (len(toks), n, ctx)
            if passthrough and req.req_id in passthrough:
                input_src[t0] = passthrough[req.req_id]
                toks = [0] + list(toks[1:])
            input_ids[t0:t0 + n] = toks
            positions_flat[t0:t0 + n] = np.arange(ctx, ctx + n)
            positions[sh, ts:ts + n] = np.arange(ctx, ctx + n)
            req_idx[sh, ts:ts + n] = r
            bt = req.block_ids
            block_tables[sh, r, :len(bt)] = bt
            for i in range(n):
                pos = ctx + i
                slot_mapping[sh, ts + i] = (bt[pos // self.block_size]
                                            * self.block_size
                                            + pos % self.block_size)
            seq_lens[sh, r] = ctx + n
            query_lens[sh, r] = n
            last_pos[sh, r] = ctx + n - 1
            k = len(s.spec_token_ids) + 1
            if self.swift:
                recs.append((sh, ts, n, k, s_cnt[sh]))
                s_cnt[sh] += k
            else:
                row_start.append(len(sample_rows))
                row_count.append(k)
                sample_rows.extend(range(t0 + n - k, t0 + n))
            t_cur[sh] += n

        if self.swift:
            # SwiftKV x dp: sample rows are gathered INSIDE each dp
            # group's forward (token drop), so the device row order is
            # dp-major with per-shard padding — lay out row bookkeeping,
            # the local gather indices and the sampling params to match.
            s_sh = pad_to_bucket(max(max(s_cnt), 1), self.sample_buckets)
            s_pad = s_sh * dp
            li_dp = np.zeros((dp, s_sh), np.int32)
            logits_indices = np.zeros(s_pad, np.int32)
            for (sh, ts, n, k, off) in recs:
                row_start.append(sh * s_sh + off)
                row_count.append(k)
                loc = np.arange(ts + n - k, ts + n, dtype=np.int32)
                li_dp[sh, off:off + k] = loc
                logits_indices[sh * s_sh + off:sh * s_sh + off + k] = \
                    sh * t_shard + loc
        else:
            s_pad = pad_to_bucket(max(len(sample_rows), 1),
                                  self.sample_buckets)
            logits_indices = np.zeros(s_pad, np.int32)
            logits_indices[:len(sample_rows)] = sample_rows

        temperature = np.zeros(s_pad, np.float32)
        top_k = np.zeros(s_pad, np.int32)
        top_p = np.ones(s_pad, np.float32)
        min_p = np.zeros(s_pad, np.float32)
        seeds = np.full(s_pad, -1, np.int32)
        counters = np.zeros(s_pad, np.int32)
        rep_pen = np.ones(s_pad, np.float32)
        pres_pen = np.zeros(s_pad, np.float32)
        freq_pen = np.zeros(s_pad, np.float32)
        any_penalties = False
        for r, s in enumerate(scheduled):
            req = s.request
            sp = req.sampling
            lo, k = row_start[r], row_count[r]
            temperature[lo:lo + k] = sp.temperature
            top_k[lo:lo + k] = sp.top_k
            top_p[lo:lo + k] = sp.top_p
            min_p[lo:lo + k] = sp.min_p
            if sp.seed is not None:
                seeds[lo:lo + k] = sp.seed
                end = req.num_computed_tokens + s.num_new_tokens
                counters[lo:lo + k] = np.arange(end - k + 1, end + 1)
            if sp.needs_penalties:
                rep_pen[lo:lo + k] = sp.repetition_penalty
                pres_pen[lo:lo + k] = sp.presence_penalty
                freq_pen[lo:lo + k] = sp.frequency_penalty
                any_penalties = True

        # Grammar-guided rows: masks/states apply to the gathered
        # logits OUTSIDE shard_map (auto-GSPMD) and rows are GLOBAL
        # dp-major sample-row indices, so both the host-mask path and
        # the device-resident grammar pool work under dp with no
        # per-shard plumbing (the grammar-state segment rides the
        # packed output vector like async token passthrough).
        guided_entries: list[tuple[int, np.ndarray]] = []
        dev_entries: list[tuple[int, int, int, int, str]] = []
        for r, s in enumerate(scheduled):
            req = s.request
            g = req.sampling.guided
            if g is None or getattr(g, "mask_words", None) is None:
                continue
            if (req.num_computed_tokens + s.num_new_tokens
                    < req.num_tokens):
                continue
            row = row_start[r] + row_count[r] - 1
            if guided_dev is not None and req.req_id in guided_dev:
                slot, src, init = guided_dev[req.req_id]
                dev_entries.append((row, slot, src, init, req.req_id))
            else:
                guided_entries.append((row, g.mask_words()))
        assert not (guided_entries and dev_entries), \
            "host-mask and device-pool guided rows cannot mix in a step"

        from arcticinference_tpu import envs

        max_qlen = int(query_lens.max(initial=1))
        # Same grouped-decode eligibility as the non-dp path: one
        # frontier row per request in request order (per shard).
        pure_decode = (
            max_qlen == 1 and bool(scheduled)
            and self.config.parallel.pipeline_parallel_size == 1
            and not envs.ARCTIC_TPU_DISABLE_GROUPED_DECODE
            and (jax.default_backend() == "tpu"
                 or envs.ARCTIC_TPU_FORCE_PALLAS_INTERPRET))
        attn_qb = 1 if pure_decode else (8 if max_qlen <= 8 else 32)
        sched_qb = 8 if attn_qb == 1 else attn_qb
        n_items = t_shard // sched_qb + b
        parts = [build_work_items(query_lens[sh], last_pos[sh], sched_qb,
                                  self.block_size, n_items, t_shard)
                 for sh in range(dp)]
        arrays = dict(
            input_ids=input_ids, input_src=input_src,
            positions_flat=positions_flat,
            positions=positions, req_idx=req_idx,
            slot_mapping=slot_mapping, block_tables=block_tables,
            seq_lens=seq_lens, logits_indices=logits_indices,
            temperature=temperature, top_k=top_k, top_p=top_p,
            min_p=min_p, seeds=seeds, counters=counters,
            rep_pen=rep_pen, pres_pen=pres_pen, freq_pen=freq_pen,
        )
        for i, key in enumerate(_ATTN_SCHED_KEYS):
            arrays[key] = np.stack([p[i] for p in parts])
        g_buckets = [g for g in (1, 2, 4, 8, 16, 32, 64, 128)
                     if g <= max(self.b_max, 1)] + [self.b_max]
        guided_index = None
        gstate_count = 0
        if guided_entries:
            w = (self.arch.vocab_size + 31) // 32
            g_pad = pad_to_bucket(len(guided_entries), g_buckets)
            grows = np.full(g_pad, -1, np.int32)
            gmask = np.zeros((g_pad, w), np.uint32)
            for i, (row, mask) in enumerate(guided_entries):
                grows[i] = row
                gmask[i, :len(mask)] = mask
            arrays["guided_rows"] = grows
            arrays["guided_mask"] = gmask.view(np.int32)
        elif dev_entries:
            g_pad = pad_to_bucket(len(dev_entries), g_buckets)
            grows = np.full(g_pad, -1, np.int32)
            gslot = np.full(g_pad, -1, np.int32)
            gsrc = np.full(g_pad, -1, np.int32)
            ginit = np.full(g_pad, -1, np.int32)
            guided_index = {}
            for i, (row, slot, src, init, rid) in enumerate(dev_entries):
                grows[i], gslot[i] = row, slot
                gsrc[i], ginit[i] = src, init
                guided_index[rid] = i
            arrays["guided_rows"] = grows
            arrays["gd_slot"] = gslot
            arrays["gd_src"] = gsrc
            arrays["gd_init"] = ginit
            gstate_count = g_pad
        if self.swift:
            arrays["logits_indices_dp"] = li_dp
            sw_items = s_sh // 8 + b
            sw_parts = []
            for sh in range(dp):
                srow = np.zeros(b, np.int64)
                idx = 0
                for s in scheduled:
                    if s.request.dp_shard == sh:
                        srow[idx] = len(s.spec_token_ids) + 1
                        idx += 1
                sw_parts.append(build_work_items(
                    srow, last_pos[sh], 8, self.block_size, sw_items,
                    s_sh))
            for i, key in enumerate(("item_req", "item_qstart",
                                     "item_qlen", "item_pages",
                                     "item_pos_base", "token_item",
                                     "token_off")):
                arrays[f"swift_{key}"] = np.stack(
                    [pp[i] for pp in sw_parts])
        if any_penalties:
            la = pad_to_bucket(
                max(max((s.request.num_tokens for s in scheduled),
                        default=1), 1), self.token_buckets + [
                    self.config.model.max_model_len])
            pen_out = np.full((s_pad, la), -1, np.int32)
            pen_all = np.full((s_pad, la), -1, np.int32)
            for r, s in enumerate(scheduled):
                req = s.request
                if not req.sampling.needs_penalties:
                    continue
                lo, k = row_start[r], row_count[r]
                pen_out[lo:lo + k, :len(req.output_token_ids)] = \
                    req.output_token_ids
                pen_all[lo:lo + k, :len(req.all_token_ids)] = \
                    req.all_token_ids
            arrays["pen_out_tokens"] = pen_out
            arrays["pen_all_tokens"] = pen_all
        ppn = self.config.parallel.pipeline_parallel_size
        if ppn > 1:
            # dp x pp: each dp group's t_shard window is GPipe-split
            # into ppn microbatches; stack per-(shard, microbatch)
            # work-item schedules as [dp, pp, ...] (the pp body strips
            # the dp axis and indexes by microbatch).
            tm = t_shard // ppn
            n_items_mb = tm // attn_qb + b
            pp_parts = []
            for sh in range(dp):
                sh_scheduled = groups[sh]
                starts = np.zeros(b, np.int64)
                if sh_scheduled:  # a drained shard has no rows; [:-1]
                    # on its empty lens would broadcast-fail into [1:0]
                    starts[1:len(sh_scheduled)] = np.cumsum(
                        query_lens[sh][:len(sh_scheduled) - 1])
                mb_parts = []
                for mi in range(ppn):
                    lo, hi = mi * tm, (mi + 1) * tm
                    ql = np.zeros(b, np.int64)
                    lpos = np.zeros(b, np.int64)
                    for r in range(len(sh_scheduled)):
                        a = max(int(starts[r]), lo)
                        z = min(int(starts[r] + query_lens[sh][r]), hi)
                        if z > a:
                            ql[r] = z - a
                            lpos[r] = (last_pos[sh][r]
                                       - (starts[r] + query_lens[sh][r]
                                          - z))
                    mb_parts.append(build_work_items(
                        ql, lpos, attn_qb, self.block_size, n_items_mb,
                        tm))
                pp_parts.append(mb_parts)
            for i, key in enumerate(_ATTN_SCHED_KEYS):
                arrays["pp" + key] = np.stack(
                    [np.stack([mb[i] for mb in sh]) for sh in pp_parts])
        return StepInputs(arrays=arrays, t_pad=t_pad, s_pad=s_pad,
                          attn_qb=attn_qb, sample_row_start=row_start,
                          sample_row_count=row_count,
                          total_tokens=sum(shard_tok),
                          guided_index=guided_index,
                          gstate_count=gstate_count)

    # ------------------------------------------------------------------ #
    # Device step
    # ------------------------------------------------------------------ #

    # Order in which the int32 step arrays are packed into ONE host->device
    # transfer (device-to-host round trips dominate step latency on a
    # tunneled TPU, and 17 small uploads cost 17 latencies).
    _I32_KEYS = ("input_ids", "input_src", "positions", "req_idx",
                 "slot_mapping",
                 "block_tables", "seq_lens", "logits_indices", "top_k",
                 "seeds", "counters",
                 "attn_item_req", "attn_item_qstart", "attn_item_qlen",
                 "attn_item_pages", "attn_item_pos_base", "attn_token_item",
                 "attn_token_off")
    _F32_KEYS = ("temperature", "top_p", "min_p", "rep_pen", "pres_pen",
                 "freq_pen")
    # Present only on steps where a request asked for penalties, a step
    # carries tree drafts, guided requests ship grammar masks/state, or
    # the engine runs in-engine dp.
    _PEN_KEYS = ("pen_out_tokens", "pen_all_tokens",
                 "attn_tree_start", "attn_row_tree_mask",
                 "attn_item_tree_start", "attn_item_tree_mask",
                 "positions_flat", "logits_indices_dp",
                 "guided_rows", "guided_mask",
                 "gd_slot", "gd_src", "gd_init")

    def _pack(self, arrays: dict[str, np.ndarray]):
        i32_keys = self._i32_keys + tuple(
            k for k in self._PEN_KEYS if k in arrays)
        i32 = np.concatenate([arrays[k].ravel() for k in i32_keys])
        f32 = np.concatenate([arrays[k].ravel() for k in self._F32_KEYS])
        shapes = tuple((k, arrays[k].shape) for k in
                       i32_keys + self._F32_KEYS)
        return i32, f32, shapes

    @staticmethod
    def _unpack(i32, f32, shapes):
        out = {}
        bufs = {np.dtype(np.int32): [i32, 0], np.dtype(np.float32): [f32, 0]}
        for k, shape in shapes:
            buf_key = (np.dtype(np.float32)
                       if k in ModelRunner._F32_KEYS else np.dtype(np.int32))
            buf, off = bufs[buf_key]
            n = int(np.prod(shape))
            out[k] = jax.lax.dynamic_slice_in_dim(
                buf, off, n).reshape(shape)
            bufs[buf_key][1] = off + n
        return out

    def _choose_mode(self, total_tokens: int) -> str:
        """Shift parallelism: run the full-TP program for small batches
        (reference model_runner.py:236-239), the Ulysses-SP program for
        large ones.  Single chip / no sp -> "single"."""
        if self.mesh is None:
            return "single"
        pcfg = self.config.parallel
        if pcfg.pipeline_parallel_size > 1:
            if (pcfg.ulysses_sequence_parallel_size > 1
                    and pcfg.enable_shift_parallel
                    and total_tokens <= pcfg.shift_parallel_threshold):
                return "pp_shift"
            return "pp"
        if pcfg.ulysses_sequence_parallel_size <= 1:
            return "sp"  # pure TP: the sp program with sp=1 IS plain TP
        if pcfg.enable_shift_parallel and \
                total_tokens <= pcfg.shift_parallel_threshold:
            return "shift"
        return "sp"

    def _forward_fn(self, attn_qb: int, mode: str, t_pad: int,
                    decode_qlen: int = 1):
        # Unroll only small (decode-ish) buckets: there the scan's
        # per-layer weight-slice copies dominate; for big prefill buckets
        # compute dominates and scan keeps compile time sane.
        from arcticinference_tpu import envs

        unroll = (jax.default_backend() == "tpu" and t_pad <= 256
                  and not envs.ARCTIC_TPU_NO_UNROLL)
        if mode == "single":
            def fwd(params, kv, inputs):
                return self.module.forward(
                    params, self.arch, kv, inputs,
                    attn_impl=_make_attn(self.module, attn_qb,
                                         decode_qlen),
                    unroll=unroll)
            return fwd
        from arcticinference_tpu.ops.fp8 import QuantizedLinear
        from arcticinference_tpu.parallel.ulysses import (
            make_sharded_forward)

        quantized = any(
            isinstance(x, QuantizedLinear)
            for x in jax.tree.leaves(
                self.params,
                is_leaf=lambda x: isinstance(x, QuantizedLinear)))
        embed_q = isinstance(self.params.get("embed"), QuantizedLinear)
        if mode in ("pp", "pp_shift"):
            from arcticinference_tpu.parallel.pp import make_pp_forward

            return make_pp_forward(
                self.module, self.arch, self.mesh, self.config.parallel,
                attn_qb=attn_qb, quantized=quantized,
                embed_quantized=embed_q,
                mode="shift" if mode == "pp_shift" else "sp",
                params=self.params)
        return make_sharded_forward(
            self.module, self.arch, self.mesh, self.config.parallel,
            mode, attn_qb=attn_qb, quantized=quantized,
            embed_quantized=embed_q, params=self.params,
            decode_qlen=decode_qlen)

    GUIDED_TOPK = 16

    # Device-resident guided decoding pool: per-slot grammar tables
    # (mask table + interval transitions) for pipelined guided requests.
    GUIDED_POOL_SLOTS = 8
    GUIDED_POOL_STATES = 1024
    GUIDED_POOL_TRANS = 16384

    @property
    def guided_device_ok(self) -> bool:
        """Whether the device-resident guided path is available.

        The grammar pool and guided ops run on the gathered logits
        OUTSIDE shard_map (auto-GSPMD), and grammar states ride the
        packed output vector like async token passthrough, so the
        in-engine dp layout needs no extra plumbing (rows are global
        sample-row indices, dp-major like everything else).  Multihost
        stays excluded: the pool is per-process device state that the
        follower mirror does not upload.
        """
        return not self.is_multihost

    def guided_fits_pool(self, index) -> bool:
        return (index.dfa.n_states <= self.GUIDED_POOL_STATES
                and len(index.dfa.trans_lo) <= self.GUIDED_POOL_TRANS)

    def _ensure_guided_pool(self) -> dict:
        pool = getattr(self, "_guided_pool", None)
        if pool is None:
            w = (self.arch.vocab_size + 31) // 32
            p, s, i = (self.GUIDED_POOL_SLOTS, self.GUIDED_POOL_STATES,
                       self.GUIDED_POOL_TRANS)
            pool = dict(
                masks=jnp.zeros((p, s, w), jnp.int32),
                keys=jnp.full((p, i), np.iinfo(np.int32).max, jnp.int32),
                hi=jnp.full((p, i), -1, jnp.int32),
                nxt=jnp.full((p, i), -1, jnp.int32),
                cps=None)
            self._guided_pool = pool
        return pool

    def upload_guided_tables(self, slot: int, index) -> None:
        """Load grammar ``index`` (a ``TokenDfaIndex``) into pool slot."""
        assert self.guided_fits_pool(index)
        pool = self._ensure_guided_pool()
        masks, keys, hi, nxt = index.device_tables()
        s_pad, i_pad = self.GUIDED_POOL_STATES, self.GUIDED_POOL_TRANS
        w = pool["masks"].shape[-1]
        mrow = np.zeros((s_pad, w), np.int32)
        mrow[:masks.shape[0], :masks.shape[1]] = masks.view(np.int32)
        krow = np.full(i_pad, np.iinfo(np.int32).max, np.int32)
        krow[:len(keys)] = keys
        hrow = np.full(i_pad, -1, np.int32)
        hrow[:len(hi)] = hi
        nrow = np.full(i_pad, -1, np.int32)
        nrow[:len(nxt)] = nxt
        pool["masks"] = pool["masks"].at[slot].set(mrow)
        pool["keys"] = pool["keys"].at[slot].set(krow)
        pool["hi"] = pool["hi"].at[slot].set(hrow)
        pool["nxt"] = pool["nxt"].at[slot].set(nrow)
        if pool["cps"] is None:
            pool["cps"] = jnp.asarray(
                index.vocab.cps_matrix().view(np.int32))

    def _get_step_fn(self, attn_qb: int, need_sampling: bool, shapes,
                     mode: str, t_pad: int, need_topk: bool = False):
        key = (attn_qb, need_sampling, shapes, mode, need_topk)
        fn = self._step_fns.get(key)
        if fn is not None:
            return fn
        module = self.module
        returns_rows = self.returns_rows
        fwd = self._forward_fn(attn_qb, mode, t_pad)

        has_gpool = any(k == "gd_slot" for k, _ in shapes)

        def step_body(params, kv, i32, f32, kv_scale, rng, prev_tokens,
                      gpool):
            inputs = ModelRunner._unpack(i32, f32, shapes)
            inputs["kv_scale"] = kv_scale
            src_idx = inputs.pop("input_src")
            # Device-side token passthrough (async scheduling): fill in
            # tokens whose values the host hasn't seen yet.
            inputs["input_ids"] = jnp.where(
                src_idx >= 0,
                prev_tokens[jnp.clip(src_idx, 0,
                                     prev_tokens.shape[0] - 1)],
                inputs["input_ids"])
            logits_indices = inputs["logits_indices"]
            temperature = inputs.pop("temperature")
            top_k = inputs.pop("top_k")
            top_p = inputs.pop("top_p")
            min_p = inputs.pop("min_p")
            seeds = inputs.pop("seeds")
            counters = inputs.pop("counters")
            rep_pen = inputs.pop("rep_pen")
            pres_pen = inputs.pop("pres_pen")
            freq_pen = inputs.pop("freq_pen")
            pen_out = inputs.pop("pen_out_tokens", None)
            pen_all = inputs.pop("pen_all_tokens", None)
            g_rows = inputs.pop("guided_rows", None)
            g_mask = inputs.pop("guided_mask", None)
            g_slot = inputs.pop("gd_slot", None)
            g_src = inputs.pop("gd_src", None)
            g_init = inputs.pop("gd_init", None)
            kv, h = fwd(params, kv, inputs)
            rows = h if returns_rows else h[logits_indices]
            logits = module.compute_logits(params, rows)
            if pen_out is not None:
                from arcticinference_tpu.ops.sampling import apply_penalties
                logits = apply_penalties(logits, pen_out, pen_all,
                                         rep_pen, pres_pen, freq_pen)
            gstates = None
            if g_slot is not None:
                # Device-resident grammar state (pipelined guided path):
                # the automaton state rides the previous step's output
                # vector like async token passthrough; its mask row comes
                # from the grammar pool.
                from arcticinference_tpu.ops.guided import guided_mask_rows
                from arcticinference_tpu.ops.sampling import \
                    apply_vocab_mask
                gstates = jnp.where(
                    g_src >= 0,
                    prev_tokens[jnp.clip(g_src, 0,
                                         prev_tokens.shape[0] - 1)],
                    g_init)
                mask_rows = guided_mask_rows(gstates, g_slot,
                                             gpool["masks"])
                logits = apply_vocab_mask(logits, g_rows, mask_rows)
            elif g_rows is not None:
                # Grammar masks BEFORE argmax/sampling: both the sampled
                # token and the greedy fallback are constrained-exact.
                from arcticinference_tpu.ops.sampling import \
                    apply_vocab_mask
                logits = apply_vocab_mask(logits, g_rows, g_mask)
            argmax = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if need_sampling:
                from arcticinference_tpu.ops.sampling import sample
                sampled = sample(logits, temperature, top_k, top_p, rng,
                                 min_p=min_p, seeds=seeds,
                                 counters=counters)
                parts = [argmax, sampled]
            else:
                parts = [argmax, argmax]
            if need_topk:
                # Ranked candidates: used by grammar-guided choice and by
                # logprobs reporting (values are log-softmax normalised
                # and bitcast into the packed i32 transfer).
                vals, cand = jax.lax.top_k(logits,
                                           ModelRunner.GUIDED_TOPK)
                lse = jax.scipy.special.logsumexp(logits, axis=-1,
                                                  keepdims=True)
                logp = (vals - lse).astype(jnp.float32)
                parts.append(cand.astype(jnp.int32).reshape(-1))
                parts.append(
                    jax.lax.bitcast_convert_type(logp, jnp.int32)
                    .reshape(-1))
            if gstates is not None:
                # Advance the grammar state by the token the engine will
                # commit (per-row temperature selects sampled vs greedy)
                # and append it to the output vector — the next step
                # reads it back via gd_src (device-to-device, no sync).
                from arcticinference_tpu.ops.guided import guided_advance
                s_rows = jnp.clip(g_rows, 0, logits.shape[0] - 1)
                tok_sel = jnp.where(temperature[s_rows] > 0,
                                    parts[1][s_rows], parts[0][s_rows])
                gstate_out = guided_advance(
                    gstates, g_slot, tok_sel, gpool["cps"],
                    gpool["keys"], gpool["hi"], gpool["nxt"])
                parts.append(gstate_out.astype(jnp.int32))
            tokens = jnp.concatenate(parts)
            return kv, tokens, rows

        if has_gpool:
            step = step_body
        else:
            def step(params, kv, i32, f32, kv_scale, rng, prev_tokens):
                return step_body(params, kv, i32, f32, kv_scale, rng,
                                 prev_tokens, None)

        if self.is_multihost:
            # Fully-replicated outputs: the leader reads them without a
            # cross-host gather; followers hold identical copies.
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            fn = jax.jit(step, donate_argnums=(1,),
                         out_shardings=(self.kv.sharding, rep, rep))
        else:
            fn = jax.jit(step, donate_argnums=(1,))
        self._step_fns[key] = fn
        return fn

    def dispatch(self, step_inputs: StepInputs,
                 rng: Optional[jax.Array] = None,
                 prev_tokens=None, need_topk: bool = False,
                 _mirror: bool = False):
        """Enqueue one device step; returns (tokens_dev [2*S_pad], rows).

        ``prev_tokens`` is the previous step's device token vector for
        input passthrough (async scheduling); a dummy is used when every
        input token value is known on host.

        Multi-host: the leader broadcasts the step to followers FIRST so
        every process issues the same program for each collective;
        ``_mirror`` marks the follower-side replay (no re-broadcast).
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if self.mh_channel is not None and not _mirror:
            self.mh_channel.broadcast({
                "kind": "dispatch",
                "arrays": step_inputs.arrays,
                "t_pad": step_inputs.t_pad,
                "s_pad": step_inputs.s_pad,
                "attn_qb": step_inputs.attn_qb,
                "total_tokens": step_inputs.total_tokens,
                "rng": np.asarray(rng),
                "use_prev": prev_tokens is not None,
                "need_topk": need_topk,
            })
        if prev_tokens is None:
            prev_tokens = (self._replicated(np.zeros(2, np.int32))
                           if self.is_multihost else jnp.zeros(2, jnp.int32))
        i32, f32, shapes = self._pack(step_inputs.arrays)
        need_sampling = bool(step_inputs.arrays["temperature"].max() > 0)
        mode = self._choose_mode(step_inputs.total_tokens)
        fn = self._get_step_fn(step_inputs.attn_qb, need_sampling, shapes,
                               mode, step_inputs.t_pad, need_topk)
        if self.is_multihost:
            i32, f32, rng = (self._replicated(i32), self._replicated(f32),
                             self._replicated(np.asarray(rng)))
        else:
            i32, f32 = jnp.asarray(i32), jnp.asarray(f32)
        if "gd_slot" in step_inputs.arrays:
            self.kv, tokens, rows = fn(
                self.params, self.kv, i32, f32,
                self.kv_scale, rng, prev_tokens, self._guided_pool)
        else:
            self.kv, tokens, rows = fn(
                self.params, self.kv, i32, f32,
                self.kv_scale, rng, prev_tokens)
        return tokens, rows

    def execute(self, step_inputs: StepInputs,
                rng: Optional[jax.Array] = None,
                need_topk: bool = False):
        """Synchronous step; returns (argmax, sampled, rows[, topk])."""
        tokens, rows = self.dispatch(step_inputs, rng,
                                     need_topk=need_topk)
        tokens = np.asarray(tokens)
        s = step_inputs.s_pad
        if need_topk:
            k = self.GUIDED_TOPK
            topk = tokens[2 * s:2 * s + s * k].reshape(s, k)
            logp = tokens[2 * s + s * k:].reshape(s, k).view(np.float32)
            return tokens[:s], tokens[s:2 * s], rows, topk, logp
        return tokens[:s], tokens[s:2 * s], rows


def _make_attn(module, attn_qb: int, decode_qlen: int = 1):
    make = getattr(module, "make_attn_impl", None)
    if make is None:
        return None
    return make(attn_qb, decode_qlen=decode_qlen)


def _attach_encode():
    """Add the embedding (pooled) execution path to ModelRunner."""

    def _get_encode_fn(self, attn_qb: int, shapes, pooling: str,
                       normalize: bool = False):
        key = ("encode", attn_qb, shapes, pooling, normalize)
        fn = self._step_fns.get(key)
        if fn is not None:
            return fn
        module, arch = self.module, self.arch
        b_max = self.b_max

        def encode(params, kv, i32, f32, kv_scale):
            inputs = ModelRunner._unpack(i32, f32, shapes)
            inputs["kv_scale"] = kv_scale
            kv, h = module.forward(
                params, arch, kv, inputs,
                attn_impl=_make_attn(module, attn_qb),
                unroll=False)
            req_idx = inputs["req_idx"]
            seg = jnp.where(req_idx < 0, b_max, req_idx)
            hf = h.astype(jnp.float32)
            if pooling == "mean":
                sums = jax.ops.segment_sum(hf, seg, num_segments=b_max + 1)
                counts = jax.ops.segment_sum(
                    jnp.ones((h.shape[0], 1), jnp.float32), seg,
                    num_segments=b_max + 1)
                pooled = sums[:b_max] / jnp.maximum(counts[:b_max], 1.0)
            elif pooling == "last":
                pooled = hf[inputs["logits_indices"][:b_max]]
            else:
                raise ValueError(f"unknown pooling {pooling!r}")
            if normalize:
                pooled = pooled / jnp.maximum(
                    jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
            return kv, pooled

        fn = jax.jit(encode, donate_argnums=(1,))
        self._step_fns[key] = fn
        return fn

    def execute_encode(self, step_inputs, pooling: str = "mean",
                       normalize: bool = False):
        i32, f32, shapes = self._pack(step_inputs.arrays)
        fn = self._get_encode_fn(step_inputs.attn_qb, shapes, pooling,
                                 normalize)
        self.kv, pooled = fn(self.params, self.kv, jnp.asarray(i32),
                             jnp.asarray(f32), self.kv_scale)
        return np.asarray(pooled)

    ModelRunner._get_encode_fn = _get_encode_fn
    ModelRunner.execute_encode = execute_encode


_attach_encode()


def _attach_score():
    """Per-token logprob scoring (prompt logprobs / OpenAI ``echo``)."""

    def _get_score_fn(self, attn_qb: int, shapes):
        key = ("score", attn_qb, shapes)
        fn = self._step_fns.get(key)
        if fn is not None:
            return fn
        module, arch = self.module, self.arch

        def score(params, kv, i32, f32, kv_scale, targets):
            inputs = ModelRunner._unpack(i32, f32, shapes)
            inputs["kv_scale"] = kv_scale
            for k in ("temperature", "top_k", "top_p", "min_p", "seeds",
                      "counters", "rep_pen", "pres_pen", "freq_pen",
                      "input_src"):
                inputs.pop(k, None)
            kv, h = module.forward(
                params, arch, kv, inputs,
                attn_impl=_make_attn(module, attn_qb), unroll=False)
            t = h.shape[0]
            # Chunked LM head: full [T, V] fp32 logits at 128k vocab is
            # GBs of transients; 256-row blocks keep peak memory flat.
            cb = min(256, t)
            pad = (-t) % cb
            hp = jnp.pad(h, ((0, pad), (0, 0))).reshape(-1, cb, h.shape[1])
            tp = jnp.pad(targets, (0, pad)).reshape(-1, cb)

            def blk(args):
                hb, tb = args
                logits = module.compute_logits(params, hb)
                lse = jax.scipy.special.logsumexp(logits, axis=-1)
                tgt = jnp.take_along_axis(
                    logits, jnp.clip(tb, 0, logits.shape[-1] - 1)[:, None],
                    axis=1)[:, 0]
                return tgt - lse

            lp = jax.lax.map(blk, (hp, tp)).reshape(-1)[:t]
            return kv, lp

        fn = jax.jit(score, donate_argnums=(1,))
        self._step_fns[key] = fn
        return fn

    def execute_score(self, step_inputs, targets: np.ndarray):
        """Per-row logprob of ``targets`` (the next token at each fed
        row); rows with target < 0 return garbage the caller ignores."""
        i32, f32, shapes = self._pack(step_inputs.arrays)
        fn = self._get_score_fn(step_inputs.attn_qb, shapes)
        self.kv, lp = fn(self.params, self.kv, jnp.asarray(i32),
                         jnp.asarray(f32), self.kv_scale,
                         jnp.asarray(targets, jnp.int32))
        return np.asarray(lp)

    ModelRunner._get_score_fn = _get_score_fn
    ModelRunner.execute_score = execute_score


_attach_score()
