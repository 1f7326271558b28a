"""Device-resident fused decode loop (speculative decoding x pipelining).

The reference pays one host<->device sync per step because vLLM's
rejection sampler, draft proposer and input builder all live on the host
(reference ``model_runner.py:383-505``).  Our async pipeline hides that
sync for greedy decoding, but host-side drafts forced speculative steps
back onto the synchronous path — the exact problem described in
``docs/design-device-resident-decode.md``.

This module implements that design: for decode-phase requests every
per-step host computation is a pure function of per-request scalars the
device already has, so the whole verify -> commit -> re-draft cycle runs
inside ONE jitted program whose state is donated from step to step:

  state:  n_computed, last_token, drafts, draft_len, alive, limit,
          sampling params, stop ids, rng          (all [B]-shaped, device)
  step:   build positions/slots/attention schedule in-jit
          -> model forward on [B*(K+1)] token rows (drafts included)
          -> verify on device (greedy prefix match / sample-and-compare)
          -> update state, detect stops (eos / stop ids / length)
          -> run the Arctic MLP/LSTM drafter chain on the accepted hidden
             rows to emit the NEXT drafts
  out:    a tiny int32 telemetry block [B, K+2] the host drains with lag

Zero host round trips in steady state: the host dispatches step N+1
before step N's telemetry lands, exactly like the greedy pipeline, and
commits tokens/stops one or two steps behind the device.  Block tables
are pre-extended on the host (worst case K+1 tokens per in-flight step)
so the device never waits for an allocation.

Suffix decoding (host C++ tree, reference ``csrc/suffix_cache``) also
rides this loop: the host speculates a PATH from its lag-synced prefix
each step and uploads it anchored at an absolute token index; the device
keeps a ring buffer of recently emitted tokens, verifies the tokens the
host hadn't seen yet against the path head ("position-shifted pattern"),
and walks the surviving tail as drafts — consuming one path over several
steps with no host round trip.  A mismatch kills the path; the next
host upload replaces it.  When a model drafter is also configured the
device prefers the path while it is alive (the host only uploads paths
whose suffix-tree score beats the drafter, reference
``model_runner.py:546-575``).
"""

from __future__ import annotations

import logging
import os as _os
import sys as _sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("arcticinference_tpu")

NO_TOKEN = -1
MAX_STOP_IDS = 4


# --------------------------------------------------------------------- #
# The fused device step
# --------------------------------------------------------------------- #

def build_fused_step(runner, drafter, num_spec: int, need_sampling: bool,
                     eos_token_id: Optional[int], use_suffix: bool = False,
                     path_len_max: int = 32, ring_w: int = 64,
                     batch: int = 0, export_hidden: bool = False,
                     wide: bool = True,
                     rows_total: Optional[int] = None):
    """Compile one fused decode step for batch-width ``B`` (read from the
    state at call time), draft length ``num_spec`` and fixed sampling mode.

    Returns a jitted ``fn(params, spec_params, kv, state, block_tables,
    kv_scale[, h_pack[, rplan]]) -> (kv, state, telemetry)`` with kv and
    state donated.  ``h_pack`` (suffix mode only, [B, PLEN+2] int32)
    carries the host's freshest suffix-tree path per slot: tokens,
    absolute anchor index, usable length (0 = nothing good to offer).

    ``rows_total=R`` compiles the PER-SLOT-WIDTH variant (round-4
    verdict item 3, single-chip suffix-only): the host assigns each
    slot 1 or K+1 verify rows and ships the layout as ``rplan``
    (int32 [2R+2B] = row_slot | row_off | slot_start | slot_rows, R
    bucketed).  Every row runs as its OWN qlen-1 sequence through the
    grouped decode kernel (per-row seq_lens / gathered block-table
    rows, all built in-jit from device state — the host never needs
    the device's n_computed), so a mixed batch pays K+1 model rows
    only for its speculating slots.  Verify gathers each slot's rows
    back to the uniform [B, K+1] layout; everything downstream
    (stops, ring/path walk, telemetry) is shared with the uniform
    programs.

    On a mesh runner (TP / SP / shift) the model forward runs through the
    runner's shard_map program — the same per-step mode choice as the
    non-fused path (reference ``model_runner.py:236-239``) applied to the
    loop's fixed ``B*(K+1)`` row count; verify / stop / re-draft logic
    stays outside shard_map under auto-GSPMD on replicated state.
    """
    from arcticinference_tpu import envs

    module, arch = runner.module, runner.arch
    bs = runner.block_size
    maxblk = runner.max_blocks_per_req
    k = num_spec
    r = k + 1
    # The fused step's verify shape is uniform (every slot contributes
    # exactly K+1 rows in slot-major order), which is exactly the
    # grouped decode kernel's contract — route it there so the spec path
    # gets the same per-program amortization as plain decode.  pp keeps
    # the work-item kernel (per-microbatch schedules).
    grouped = (runner.config.parallel.pipeline_parallel_size == 1
               and not envs.ARCTIC_TPU_DISABLE_GROUPED_DECODE
               and (jax.default_backend() == "tpu"
                    or envs.ARCTIC_TPU_FORCE_PALLAS_INTERPRET))
    # Benchmark-only acceptance control: corrupt each next-step draft
    # token with this probability so the speedup-vs-acceptance curve can
    # be measured on one workload (bench.py spec ladder).  0 (default)
    # compiles a byte-identical program to the normal path.
    import os as _os

    corrupt = float(_os.environ.get("ARCTIC_TPU_FUSED_CORRUPT_RATE",
                                    "0") or 0)
    if corrupt and getattr(runner, "mh_channel", None) is not None:
        # Multihost: the env var is read independently at trace time in
        # every process; a leader/follower mismatch would desync the
        # replicated RNG (the corrupted path takes an extra
        # jax.random.split).  The knob is a single-host bench aid only.
        logger.warning("ARCTIC_TPU_FUSED_CORRUPT_RATE ignored under "
                       "multihost (would desync mirrored programs)")
        corrupt = 0.0
    qb = 1 if grouped else (8 if r <= 8 else 32)
    eos = -1 if eos_token_id is None else int(eos_token_id)
    plen = path_len_max
    w = ring_w
    sharded_fwds = {}
    # Per-slot draft width, degenerate case (round-4 verdict item 3):
    # suffix-only loops spend most steps with NO drafts anywhere on dry
    # workloads (fresh prompts), yet the K+1-row verify program pays
    # K+1 model rows per slot regardless.  ``wide=False`` builds the
    # 1-row variant; the HOST picks the program per step from what it
    # already knows (did it upload any live path recently / did drained
    # telemetry show drafts) — zero device sync, unlike the removed
    # adaptive-K experiment (host-paced switch on DEVICE state), and
    # unlike an in-program lax.cond, which forces XLA to give up the
    # donated in-place KV update (a full cache copy per step — measured
    # 2.4x tpot loss on the repeat workload).  A conservative wrong
    # "wide" guess costs exactly the r3 always-wide behaviour; a wrong
    # "narrow" guess skips ONE step of path consumption (device path
    # state persists).  Both programs share one state layout.
    run_r = r if wide else 1
    if runner.mesh is not None:
        mesh_mode = runner._choose_mode(batch * run_r)
        dq_rr = run_r if grouped else 1
        sharded_fwds[run_r] = runner._forward_fn(
            qb if not grouped else 1, mesh_mode, batch * run_r,
            decode_qlen=dq_rr)

    if drafter is not None:
        from arcticinference_tpu.models import speculators as spec_mod
        gen = (spec_mod.lstm_generate_proposals if drafter.kind == "lstm"
               else spec_mod.mlp_generate_proposals)
        spec_arch = drafter.arch
    else:
        gen = spec_arch = None

    def step(params, spec_params, kv, state, block_tables, kv_scale,
             h_pack=None, rplan=None):
        # Suffix path upload rides ONE packed int32 array [B, PLEN+2]
        # (= path tokens | anchor | usable length): each extra
        # host->device transfer costs ~ms on the axon tunnel, and the
        # loop uploads every step (round-5: was 3 transfers).
        if h_pack is not None:
            h_path = h_pack[:, :plen]
            h_start = h_pack[:, plen]
            h_len = h_pack[:, plen + 1]
        b = state["n_computed"].shape[0]
        n_comp = state["n_computed"]                       # [B]
        alive = state["alive"]                             # [B] 0/1
        dlen = state["draft_len"]                          # [B]
        if rows_total is not None:
            # Per-slot widths: a slot granted w rows can verify at most
            # w-1 drafts this step; the rest stay in device path state
            # (same invariant as the narrow program's dlen=0 — an
            # unverifiable draft must be invisible to verification).
            R = rows_total
            row_slot = rplan[:R]
            row_off = rplan[R:2 * R]
            slot_start = rplan[2 * R:2 * R + b]
            slot_rows = rplan[2 * R + b:2 * R + 2 * b]
            dlen = jnp.minimum(dlen, jnp.maximum(slot_rows - 1, 0))
        elif not wide:
            # The narrow program computes NO verify rows: any device
            # drafts must be invisible to verification too, or a lucky
            # col-0 match "accepts" a draft whose token the padded
            # rowvals never carried (device advances 2, telemetry
            # emits 1 — a lost token that wedges the request).  Path
            # state persists; the next wide step re-derives dlen.
            dlen = jnp.zeros_like(dlen)
        limit = state["limit"]                             # [B] max total
        drafts = state["drafts"]                           # [B, max(K,1)]
        rng, sub = jax.random.split(state["rng"])

        def fwd_rowvals(kv, rr, dlen_rr):
            """Build inputs, run the model on ``B*rr`` rows (row i*rr+j =
            slot i's j-th verify row), return (kv, rowvals [B, rr], h)."""
            jr = jnp.arange(rr, dtype=jnp.int32)[None, :]  # [1, rr]
            tokens = jnp.concatenate(
                [state["last_token"][:, None], drafts[:, :rr - 1]],
                axis=1)                                    # [B, rr]
            pos = n_comp[:, None] + jr                     # [B, rr]
            row_valid = ((alive[:, None] > 0) & (jr <= dlen_rr[:, None])
                         & (pos < limit[:, None]))

            blk = block_tables[jnp.arange(b)[:, None],
                               jnp.clip(pos // bs, 0, maxblk - 1)]
            slot = jnp.where(row_valid, blk * bs + pos % bs, -1)

            dp = runner.dp
            if dp > 1:
                # In-engine DP: slots are dp-major (shard s owns slots
                # [s*Bs, (s+1)*Bs)), block ids are shard-local, and the
                # forward's dp layout shards the token axis + per-request
                # arrays over "dp" (parallel/ulysses.py DP_KEYS; the
                # "positions_flat" key selects that layout).
                bsh = b // dp
                local_req = jnp.where(
                    row_valid,
                    (jnp.arange(b, dtype=jnp.int32) % bsh)[:, None], -1)
                inputs = {
                    "input_ids": tokens.reshape(-1),
                    "positions_flat": pos.reshape(-1),
                    "positions": pos.reshape(dp, bsh * rr),
                    "req_idx": local_req.reshape(dp, bsh * rr),
                    "slot_mapping": slot.reshape(dp, bsh * rr),
                    "block_tables": block_tables.reshape(dp, bsh, maxblk),
                    "seq_lens": (n_comp + rr).reshape(dp, bsh),
                    "kv_scale": kv_scale,
                }
            else:
                flat_req = jnp.where(
                    row_valid,
                    jnp.arange(b, dtype=jnp.int32)[:, None],
                    -1).reshape(-1)
                inputs = {
                    "input_ids": tokens.reshape(-1),
                    "positions": pos.reshape(-1),
                    "req_idx": flat_req,
                    "slot_mapping": slot.reshape(-1),
                    "block_tables": block_tables,
                    "seq_lens": n_comp + rr,
                    "kv_scale": kv_scale,
                }
            if runner.swift:
                # SwiftKV: at the decode frontier every row is a sample
                # row, so nothing drops and the swift-half schedule IS
                # the main schedule (the reference's "all-combined"
                # config, benchmark_utils.py:17-70, riding the fused
                # loop).  Under dp the token-drop gather runs per
                # shard_map group, so the indices must be GROUP-LOCAL
                # (logits_indices_dp, renamed inside the dp body —
                # parallel/ulysses.py).
                if dp > 1:
                    inputs["logits_indices_dp"] = jnp.broadcast_to(
                        jnp.arange(b // dp * rr, dtype=jnp.int32)[None],
                        (dp, b // dp * rr))
                else:
                    inputs["logits_indices"] = jnp.arange(
                        b * rr, dtype=jnp.int32)
            if jax.default_backend() == "tpu" and not grouped and dp == 1:
                # (dp > 1 pairs with the grouped kernel or the reference
                # path; the flat in-jit schedule below is not dp-stacked.)
                # In-jit attention schedule: one work item per request,
                # rows packed densely at stride rr, qstart aligned down
                # to the sublane tile exactly like the host builder
                # (ops/pallas/ragged_attention.py:build_work_items).
                qpos = jnp.arange(b, dtype=jnp.int32) * rr
                aligned = jnp.bitwise_and(qpos, ~7)
                rows = jnp.arange(b * rr, dtype=jnp.int32)
                inputs.update(
                    attn_item_req=jnp.arange(b, dtype=jnp.int32),
                    attn_item_qstart=aligned,
                    attn_item_qlen=rr * alive,
                    attn_item_pages=jnp.minimum(
                        (n_comp + rr - 1) // bs + 1, maxblk),
                    attn_item_pos_base=n_comp - (qpos - aligned),
                    attn_token_item=rows // rr,
                    attn_token_off=rows - aligned[rows // rr],
                )
                if runner.swift:
                    for key in ("item_req", "item_qstart", "item_qlen",
                                "item_pages", "item_pos_base",
                                "token_item", "token_off"):
                        inputs[f"swift_{key}"] = inputs[f"attn_{key}"]

            if sharded_fwds:
                kv2, h = sharded_fwds[run_r](params, kv, inputs)
            else:
                from arcticinference_tpu.engine.runner import _make_attn
                unroll = jax.default_backend() == "tpu" and b * rr <= 512
                qb_rr = 1 if grouped else qb
                dq_rr = rr if grouped else 1
                kv2, h = module.forward(params, arch, kv, inputs,
                                        attn_impl=_make_attn(module, qb_rr,
                                                             dq_rr),
                                        unroll=unroll)
            logits = module.compute_logits(params, h)      # [B*rr, V]
            if need_sampling:
                from arcticinference_tpu.ops.sampling import sample
                rep = lambda x: jnp.repeat(x, rr,
                                           total_repeat_length=b * rr)
                rowvals = sample(logits, rep(state["temperature"]),
                                 rep(state["top_k"]), rep(state["top_p"]),
                                 sub)
            else:
                rowvals = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return kv2, rowvals.reshape(b, rr), h

        def fwd_slotted(kv):
            """Per-slot rows: each of the R rows runs as its own qlen-1
            sequence (per-row seq_len / block-table row, in-jit from
            device state).  K+1 rows of one slot re-read that slot's KV
            pages once each — measured ~0.07 ms/row slope on v5e, far
            below the uniform program's cost of widening EVERY slot."""
            s = jnp.clip(row_slot, 0, b - 1)
            tok = jnp.where(
                row_off == 0, state["last_token"][s],
                drafts[s, jnp.clip(row_off - 1, 0, max(k - 1, 0))])
            pos = n_comp[s] + row_off                      # [R]
            valid = ((row_slot >= 0) & (alive[s] > 0)
                     & (row_off <= dlen[s]) & (pos < limit[s]))
            blk = block_tables[s, jnp.clip(pos // bs, 0, maxblk - 1)]
            slotm = jnp.where(valid, blk * bs + pos % bs, -1)
            inputs = {
                "input_ids": tok,
                "positions": pos,
                # Each row IS its own request here (the jnp reference
                # path indexes block_tables/seq_lens by req_idx).
                "req_idx": jnp.where(valid,
                                     jnp.arange(R, dtype=jnp.int32), -1),
                "slot_mapping": slotm,
                "block_tables": block_tables[s],           # [R, maxblk]
                "seq_lens": pos + 1,                       # per-row seq
                "kv_scale": kv_scale,
            }
            if runner.swift:
                # At the decode frontier every row is a sample row.
                inputs["logits_indices"] = jnp.arange(R, dtype=jnp.int32)
            from arcticinference_tpu.engine.runner import _make_attn
            unroll = jax.default_backend() == "tpu" and R <= 512
            kv2, h = module.forward(
                params, arch, kv, inputs,
                attn_impl=_make_attn(module, 1 if grouped else 8,
                                     decode_qlen=1),
                unroll=unroll)
            logits = module.compute_logits(params, h)      # [R, V]
            if need_sampling:
                from arcticinference_tpu.ops.sampling import sample
                flat = sample(logits, state["temperature"][s],
                              state["top_k"][s], state["top_p"][s], sub)
            else:
                flat = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # Gather each slot's rows back to the uniform [B, K+1]
            # layout; columns past the slot's allotment read NO_TOKEN.
            jj = jnp.arange(r, dtype=jnp.int32)[None, :]
            idx = jnp.clip(slot_start[:, None] + jj, 0, R - 1)
            in_slot = jj < slot_rows[:, None]
            rowvals = jnp.where(in_slot, flat[idx], NO_TOKEN)
            h_rows = jnp.where(in_slot[:, :, None], h[idx],
                               jnp.zeros((), h.dtype))
            return kv2, rowvals, h_rows

        j = jnp.arange(r, dtype=jnp.int32)[None, :]        # [1, R]
        if rows_total is not None:
            kv, rowvals, h_brd = fwd_slotted(kv)
            h = None                      # drafter path unused (suffix)
        elif wide:
            kv, rowvals, h = fwd_rowvals(kv, r, dlen)
            h_brd = None
        else:
            kv, rv1, h1 = fwd_rowvals(kv, 1, jnp.zeros_like(dlen))
            # Pad to [B, R]; only column 0 is ever consumed (the rows
            # past 0 compare as NO_TOKEN, so n_acc == 0 below and any
            # device-side drafts simply wait for the next wide step).
            rowvals = jnp.pad(rv1, ((0, 0), (0, r - 1)),
                              constant_values=NO_TOKEN)
            h_brd = jnp.zeros((b, r, h1.shape[-1]),
                              h1.dtype).at[:, 0, :].set(h1)
            h = None                      # drafter path unused

        # Greedy prefix-match verification (sample-and-compare when
        # temperature > 0: both draft and target row come from the same
        # sampled chain, so accept-on-equality stays unbiased).
        if k > 0:
            match = ((rowvals[:, :k] == drafts[:, :k])
                     & (jnp.arange(k, dtype=jnp.int32)[None, :]
                        < dlen[:, None]))
            n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                            axis=1)
        else:
            n_acc = jnp.zeros((b,), jnp.int32)
        # Never emit past the per-request length limit.
        n_acc = jnp.minimum(n_acc, jnp.maximum(limit - n_comp - 2, 0))

        # Accepted drafts equal their target rows, so the emitted block is
        # just the target chain up to and including the bonus position.
        emitted = jnp.where((j <= n_acc[:, None]) & (alive[:, None] > 0),
                            rowvals, NO_TOKEN)              # [B, R]
        bonus = jnp.take_along_axis(rowvals, n_acc[:, None],
                                    axis=1)[:, 0]
        n_emit = (1 + n_acc) * alive
        n_comp2 = n_comp + n_emit
        last2 = jnp.where(alive > 0, bonus, state["last_token"])

        # Device-side stop detection mirrors Request.check_stop for the
        # conditions fused mode admits (eos, <=4 stop ids, length).
        em_real = emitted >= 0
        hit = jnp.zeros((b, r), bool)
        if eos >= 0:
            hit |= (emitted == eos) & em_real & \
                (state["eos_mask"][:, None] > 0)
        hit |= ((emitted[:, :, None] == state["stop_ids"][:, None, :])
                & em_real[:, :, None]).any(-1)
        stopped = hit.any(axis=1)
        length_done = n_comp2 + 1 >= limit
        alive2 = alive * (1 - stopped.astype(jnp.int32)) * \
            (1 - length_done.astype(jnp.int32))

        # Next drafts: the drafter chain runs on the hidden row of the
        # last accepted token (the row that produced the bonus), exactly
        # the rows the host proposer used (spec/proposer.py:propose).
        headroom = jnp.clip(limit - n_comp2 - 2, 0, k)
        if gen is not None and k > 0:
            hrow = h[jnp.arange(b, dtype=jnp.int32) * r + n_acc]
            drafts2 = gen(spec_params, spec_arch, last_tokens=bonus,
                          hidden=hrow, num_predict=k)
            drafts2 = drafts2.astype(jnp.int32)
            dlen2 = headroom * alive2
        else:
            drafts2 = drafts
            dlen2 = jnp.zeros((b,), jnp.int32)

        state2 = dict(state)
        if use_suffix:
            bidx = jnp.arange(b, dtype=jnp.int32)
            # 1. Ring buffer of emitted tokens, keyed by absolute token
            #    index mod W (token index i = i-th entry of all_token_ids;
            #    emitted[:, j] has index n_comp + 1 + j).
            em_idx = n_comp[:, None] + 1 + j                   # [B, R]
            ring_at = jnp.where(em_real, em_idx % w, w)        # drop slot
            ring = state["ring"].at[bidx[:, None], ring_at].set(
                emitted, mode="drop")

            # 2. Advance the device's current path past the emitted block,
            #    checking each emitted token against the path prediction.
            path = state["path"]                               # [B, PLEN]
            p_off = state["path_off"]
            p_len = state["path_len"]
            pred_at = jnp.clip(p_off[:, None] + j, 0, plen - 1)
            pred = jnp.take_along_axis(path, pred_at, axis=1)  # [B, R]
            in_path = (p_off[:, None] + j) < p_len[:, None]
            mism = (em_real & in_path & (pred != emitted)).any(axis=1)
            p_off = p_off + n_emit
            p_len = jnp.where(mism, 0, p_len)

            # 3. Merge the host upload: usable if its anchor gap (tokens
            #    the host hadn't seen) verifies against the ring.
            gap = (n_comp2 + 1) - h_start                      # [B]
            t = jnp.arange(plen, dtype=jnp.int32)[None, :]
            ring_tok = jnp.take_along_axis(
                ring, (h_start[:, None] + t) % w, axis=1)
            gap_ok = jnp.where(t < gap[:, None],
                               ring_tok == h_path, True).all(axis=1)
            usable = ((h_len > 0) & (gap >= 0) & (gap < h_len)
                      & (gap <= w) & gap_ok)
            path = jnp.where(usable[:, None], h_path, path)
            p_off = jnp.where(usable, gap, p_off)
            p_len = jnp.where(usable, h_len, p_len)

            # 4. Prefer walking the path over the model drafter while it
            #    is alive (host uploads are already score-gated).
            rem = jnp.maximum(p_len - p_off, 0)
            use_path = (rem > 0) & (alive2 > 0)
            jd = jnp.arange(max(k, 1), dtype=jnp.int32)[None, :]
            path_at = jnp.clip(p_off[:, None] + jd, 0, plen - 1)
            path_drafts = jnp.take_along_axis(path, path_at, axis=1)
            drafts2 = jnp.where(use_path[:, None], path_drafts[:, :k]
                                if k > 0 else drafts2, drafts2)
            dlen2 = jnp.where(use_path,
                              jnp.minimum(rem, headroom) * alive2, dlen2)
            state2.update(ring=ring, path=path, path_off=p_off,
                          path_len=p_len)
        if corrupt > 0 and k > 0:
            rng, csub = jax.random.split(rng)
            u = jax.random.uniform(csub, drafts2.shape)
            drafts2 = jnp.where(u < corrupt,
                                (drafts2 + 1) % arch.vocab_size, drafts2)
        state2.update(n_computed=n_comp2, last_token=last2,
                      drafts=drafts2.astype(jnp.int32), draft_len=dlen2,
                      alive=alive2, rng=rng)
        telemetry = jnp.concatenate(
            [emitted, (dlen * alive)[:, None]], axis=1)     # [B, R+1]
        if export_hidden:
            # Distillation capture: the verify-row hidden states pair
            # with the emitted tokens (row j's hidden supervises
            # emitted[:, j]).  ALWAYS exported (the host only copies it
            # when a capture hook is installed) so the compiled program
            # is byte-identical between capture and bench runs — on a
            # random-weight target even a fusion-level change can flip
            # greedy argmax and derail the memorised trajectory
            # (spec/distill.py:capture_pairs).
            return (kv, state2, telemetry,
                    h_brd if h_brd is not None else h.reshape(b, r, -1))
        return kv, state2, telemetry

    n_out = 4 if export_hidden else 3
    if runner.is_multihost:
        # Replicated state/telemetry so the leader reads telemetry with
        # no cross-host gather and every process's mirrored state stays
        # bit-identical (same contract as the runner's sync step fns).
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(runner.mesh, P())
        return jax.jit(step, donate_argnums=(2, 3),
                       out_shardings=(runner.kv.sharding,)
                       + (rep,) * (n_out - 1))
    return jax.jit(step, donate_argnums=(2, 3))


# --------------------------------------------------------------------- #
# Host controller
# --------------------------------------------------------------------- #

class _InflightFused:
    __slots__ = ("telemetry", "hidden", "k")

    def __init__(self, telemetry, hidden=None, k=0):
        self.telemetry = telemetry
        self.hidden = hidden
        self.k = k


class FusedDecodeLoop:
    """Engine-side controller: entry/exit, block pre-extension, telemetry
    commits.  One instance per LLMEngine; active between ``enter`` and
    ``exit`` while every running request sits at its decode frontier."""

    def __init__(self, engine):
        self.engine = engine
        self.runner = engine.runner
        self.active = False
        self._fns: dict = {}
        self._inflight: list[_InflightFused] = []
        self._slots: list = []              # slot -> Request
        self._host_alive: list[bool] = []
        self._known_comp: list[int] = []    # drained n_computed per slot
        self._state = None                  # device pytree
        self._bt_np = None                  # host block-table mirror
        self._bt_dev = None
        self._k = 0
        self._need_sampling = False
        self.depth = max(1, engine.config.scheduler.pipeline_depth)
        # Host-side wide/narrow program selection (see step()).
        self._wide_ttl = 0
        self._retry = 0
        self._retry_period = self.RETRY_PERIOD
        # Did ANY entry of this loop ever consume drafts, and did the
        # current entry?  Entry optimism is gated on history: the loop
        # re-enters on every absorption, and a hot workload must resume
        # wide immediately (consumption evidence lags by the pipeline
        # depth, so a short probe window ends before its own evidence
        # can arrive — measured ~2 lost narrow steps per re-entry).
        self._hot_history = False
        self._consumed_this_entry = False
        # Engagement windows this entry whose uploads all drained
        # unconsumed, and the batch-wide new-engagement gate (see
        # _slot_policy).
        self._entry_failed = 0
        self._engage_gate = 0
        # Slots whose drafts were consumed during this entry: while any
        # is still alive the TTL runs its sticky course; once ALL have
        # finished, holding wide is pure overhead for the survivors
        # (the half-hot mixed batch) and the TTL is dropped at once.
        self._consuming_slots: set = set()
        #: dispatched fused steps by program width (observability; the
        #: serving matrix logs it per run).
        self.width_stats = {"wide": 0, "narrow": 0, "entries": 0}
        # Suffix path lane (None when suffix decoding is off).
        self._suffix = engine._suffix_cache
        self._plen = 32
        self._ring_w = 64
        self._prewarmed: set = set()
        self._announce_state = None         # multihost: state to mirror
        self._bt_dirty = False
        self._spec_params_global = None     # multihost: replicated copy

    # -- entry ----------------------------------------------------------

    #: drained steps a single consumed draft keeps the wide program hot
    #: for.  STICKY on purpose: mixing programs mid-generation is not
    #: just a perf knob — on logit-tie-prone models the wide and narrow
    #: programs can argmax-diverge, and a pass whose cached response
    #: interleaves both programs' tokens poisons the suffix cache for
    #: the next repeat pass (measured: repeat throughput halved when a
    #: short TTL let hot passes alternate programs).  The mixed-batch
    #: wide TAIL this used to cost (~40% on half-hot batches) is
    #: instead cut by the consuming-slot liveness check in step():
    #: when every recently-consuming slot has finished, the TTL is
    #: dropped immediately.  RETRY_PERIOD is the initial cadence of
    #: wide retries while uploads are live but nothing has been
    #: consumed recently (doubles to 64 on each fruitless retry;
    #: resets on consumption).
    CONSUME_MEMORY = 32
    RETRY_PERIOD = 4
    #: wide steps per retry engagement: the merge step, its verify
    #: successor, AND the drain lag — consumption evidence arrives
    #: ~pipeline-depth steps after the verify, and an engagement that
    #: ends before its own evidence can land injects narrow interludes
    #: into an otherwise-hot pass (program-sequence misalignment
    #: between passes; see _slot_policy).  Resolved per instance as
    #: depth + 2.

    def eligible(self) -> bool:
        """Static eligibility: is there anything to speculate with, on a
        runner whose decode step the fused program can own?  When this is
        False the engine keeps the loop uninstalled so the sync path
        retains full drafting duties.  TP / SP / shift / PP meshes are
        owned via the runner's shard_map forwards (the fused step's
        request-major row order keeps PP's microbatch causality
        invariant); under multihost every fused step is broadcast to the
        follower mirrors like any other dispatch; SwiftKV works because
        at the decode frontier all rows are sample rows."""
        eng = self.engine
        return not (eng._drafter is None and self._suffix is None)

    @staticmethod
    def _fusable(req) -> bool:
        """Sampling semantics the device step can mirror."""
        sp = req.sampling
        return not (sp.guided is not None or sp.logprobs
                    or len(sp.stop_token_ids) > MAX_STOP_IDS
                    or sp.needs_penalties or sp.stop
                    or sp.min_p > 0 or sp.seed is not None)

    def _frontier_requests(self) -> list:
        return [r for r in self.engine.scheduler.running
                if r.num_computed_tokens == r.num_tokens - 1]

    def can_enter(self) -> bool:
        """Enter when ANY decode-frontier request is device-mirrorable.
        Requests still prefilling (and new arrivals) do NOT block entry:
        they continue via interleaved admission steps
        (``_admission_step``) and are absorbed on reaching the frontier.
        Non-fusable requests (seeds / penalties / stop-strings /
        logprobs / guided) never block the loop either — they ride the
        same interleaved sync steps for their decode while the fusable
        slots keep drafting device-side (per-slot fusability; one such
        request used to demote the whole engine to the sync path).
        """
        eng = self.engine
        if eng._spec_disabled_now():
            return False
        from arcticinference_tpu import envs
        if getattr(envs, "ARCTIC_TPU_DISABLE_FUSED", False):
            return False
        return any(self._fusable(r) for r in self._frontier_requests())

    def enter(self) -> None:
        eng = self.engine
        # Entry width from history: a workload that consumed drafts in
        # a previous entry starts wide for depth+2 steps (long enough
        # for its own consumption evidence to drain and sustain the
        # TTL seamlessly); a cold one starts with a first-step PROBE
        # (walks + live check) and pays zero wide steps while dry —
        # measured on the serving matrix, unconditional optimism cost
        # dry workloads ~10ms/step and unconditional probing cost hot
        # re-entries ~2 narrow steps each.
        self._wide_ttl = (self.depth + 2) if self._hot_history else 0
        self._retry = 0
        self._retry_period = self.RETRY_PERIOD
        self._consumed_this_entry = False
        self._consuming_slots = set()   # slot indices are per-entry
        self._entry_failed = 0
        self._engage_gate = 0
        self._slot_arrays_ready = False
        running = [r for r in self._frontier_requests()
                   if self._fusable(r)]
        dp = max(self.runner.dp, 1)
        if dp > 1:
            # dp-major slot layout: shard s owns slots [s*Bs, (s+1)*Bs).
            per: list[list] = [[] for _ in range(dp)]
            for r_ in running:
                per[r_.dp_shard].append(r_)
            bsh = _bucket(max(len(g) for g in per),
                          eng.config.scheduler.max_num_seqs)
            pcfg = eng.config.parallel
            sp = pcfg.ulysses_sequence_parallel_size
            bsh = -(-bsh // sp) * sp   # each shard's rows split over sp
            b = bsh * dp
            slot_of: list = [None] * b
            for s_i, g in enumerate(per):
                for j, r_ in enumerate(g):
                    slot_of[s_i * bsh + j] = r_
        else:
            b = _bucket(len(running), eng.config.scheduler.max_num_seqs)
            if self.runner.mesh is not None:
                # SP mode shards the B*(K+1) token rows over sp; PP
                # splits them into pp microbatches (each sp-sharded in
                # SP mode): keep B a multiple of pp*sp so every split
                # is exact (dead tail slots stay alive=0).
                pcfg = eng.config.parallel
                div = (pcfg.ulysses_sequence_parallel_size
                       * pcfg.pipeline_parallel_size)
                b = -(-b // div) * div
            slot_of = list(running) + [None] * (b - len(running))
        sc = eng.config.speculative
        if eng._drafter is not None:
            k = eng._drafter.n_predict
        else:  # suffix-only: per-step cap on path consumption
            k = min(sc.num_speculative_tokens, sc.fused_suffix_spec_len)
        self._k = k
        r = k + 1
        self._ring_w = max(64, _bucket((self.depth + 2) * r, 1 << 16))
        self._need_sampling = any(r_.sampling.temperature > 0
                                  for r_ in running)
        self._slots = slot_of
        self._host_alive = [r is not None for r in slot_of]
        self._known_comp = [0 if r is None else r.num_computed_tokens
                            for r in slot_of]
        maxblk = self.runner.max_blocks_per_req
        mml = eng.config.model.max_model_len

        n_comp = np.zeros(b, np.int32)
        last = np.zeros(b, np.int32)
        drafts = np.zeros((b, max(k, 1)), np.int32)
        dlen = np.zeros(b, np.int32)
        alive = np.zeros(b, np.int32)
        limit = np.ones(b, np.int32)  # dead slots: tiny limit
        temp = np.zeros(b, np.float32)
        top_k = np.zeros(b, np.int32)
        top_p = np.ones(b, np.float32)
        eos_mask = np.zeros(b, np.int32)
        stop_ids = np.full((b, MAX_STOP_IDS), -1, np.int32)
        self._bt_np = np.zeros((b, maxblk), np.int32)

        for i, req in enumerate(slot_of):
            if req is None:
                continue
            n_comp[i] = req.num_computed_tokens
            last[i] = req.all_token_ids[-1]
            d = [int(t) for t in req.spec_token_ids[:k]]
            drafts[i, :len(d)] = d
            dlen[i] = len(d)
            req.spec_token_ids = []
            alive[i] = 1
            limit[i] = min(len(req.prompt_token_ids)
                           + req.sampling.max_tokens, mml)
            sp = req.sampling
            temp[i] = sp.temperature
            top_k[i] = sp.top_k
            top_p[i] = sp.top_p
            eos_mask[i] = 0 if sp.ignore_eos else 1
            for s_i, sid in enumerate(sp.stop_token_ids[:MAX_STOP_IDS]):
                stop_ids[i, s_i] = sid
            self._bt_np[i, :len(req.block_ids)] = req.block_ids

        eng._rng, sub = jax.random.split(eng._rng)
        state = dict(
            n_computed=n_comp, last_token=last, drafts=drafts,
            draft_len=dlen, alive=alive, limit=limit, temperature=temp,
            top_k=top_k, top_p=top_p, eos_mask=eos_mask,
            stop_ids=stop_ids, rng=np.asarray(sub))
        if self._suffix is not None:
            state.update(
                ring=np.full((b, self._ring_w), -1, np.int32),
                path=np.zeros((b, self._plen), np.int32),
                path_off=np.zeros(b, np.int32),
                path_len=np.zeros(b, np.int32))
        # Multi-host: followers mirror the loop, so the initial state is
        # announced with the first fused-step broadcast.
        self._announce_state = (state if self.runner.mh_channel is not None
                                else None)
        self._state = {k: self._put(v) for k, v in state.items()}
        self._bt_dev = self._put(self._bt_np)
        self._bt_dirty = True
        self._inflight = []
        self.active = True
        # Admission steps may preempt on block pressure; fused-owned
        # requests must never be victims (device steps write their
        # blocks until the loop drains).
        eng.scheduler.protected_ids = {
            r.req_id for r in slot_of if r is not None}
        self.width_stats["entries"] += 1
        logger.debug("fused decode: entered with %d requests (B=%d, K=%d)",
                     sum(r is not None for r in slot_of), b, k)

    def _put(self, x):
        """Device placement: replicated over the global mesh under
        multihost (host-local arrays can't feed a cross-process jit)."""
        if self.runner.is_multihost:
            return self.runner._replicated(x)
        return jax.device_put(x)

    # -- stepping -------------------------------------------------------

    def _admission_step(self) -> list:
        """One synchronous prefill-only step for arrivals / ongoing
        prefills while the fused loop keeps decoding — the fix for the
        round-1 head-of-line blocking (admission used to force a full
        exit + drain, serializing new requests behind the decode loop).
        """
        eng = self.engine
        sched_out = eng.scheduler.schedule(skip_decode=True)
        if not sched_out.scheduled:
            return []
        return eng._step_sync(sched_out)

    def _absorbable(self) -> list:
        """Admitted FUSABLE requests that reached the decode frontier:
        the loop exits once to re-enter with them in the batch.
        Non-fusable requests are never absorbed — they keep riding the
        interleaved sync steps."""
        slots = set(id(r) for r in self._slots)
        return [r for r in self._frontier_requests()
                if id(r) not in slots and self._fusable(r)]

    def step(self) -> list:
        """One fused iteration: maybe exit, else dispatch + lagged drain.
        Arrivals get an interleaved prefill step first."""
        eng = self.engine
        if not any(self._host_alive):
            return self.exit()
        finished: list = []
        owned = eng.scheduler.protected_ids
        if eng.scheduler.waiting or any(
                r.req_id not in owned for r in eng.scheduler.running
                if not r.status.is_finished):
            # Prefills, arrivals AND non-fusable decodes ride sync steps
            # interleaved with the device-resident loop.
            finished.extend(self._admission_step())
            if self._absorbable():
                # Admissions reached the frontier: exit once so the next
                # engine iteration re-enters with the larger batch (or
                # hands a non-fusable request back to the sync path).
                finished.extend(self.exit())
                return finished
            if not any(self._host_alive):
                return finished + self.exit()
        if not self._pre_extend_blocks():
            return finished + self.exit()

        capture = eng.hidden_capture is not None
        spec_params = self._spec_params()
        # Per-slot draft width (round-4 item 3): the HOST picks the
        # wide (K+1 verify rows) or narrow (1 row) program from
        # information it already holds — no device sync (the removed
        # adaptive-K experiment's failure mode) and no in-program
        # lax.cond (which forfeits the donated in-place KV update — a
        # full cache copy per step).  Wide while the host holds live
        # paths OR drained telemetry shows drafts being consumed (the
        # TTL keeps the merge step's successor wide — a path needs two
        # consecutive wide steps: merge, then verify).  Host-found
        # paths alone are not durable evidence — a looping
        # random-weight target makes the tree "find" paths the
        # device's gap checks keep rejecting — so consecutive
        # draft-free WIDE drains open a BACKOFF window: the loop
        # decodes narrow, skips the C++ tree walks ENTIRELY and
        # uploads empty paths (round-4 item 7: at batch 64 the walks
        # were 64 tree queries per step of pure overhead on dry
        # workloads); a retry probe every RETRY_PERIOD steps pays one
        # round of walks to test for live paths and re-arms wide when
        # it finds them, so a workload turning hot is re-detected
        # within ~RETRY_PERIOD + depth steps.
        k_eff = self._k
        wide = True
        paths_np = None
        rplan_np = None
        r_bucket = None
        from arcticinference_tpu import envs as _envs
        force = _envs.ARCTIC_TPU_FUSED_FORCE_WIDTH
        suffix_only = (self._suffix is not None and eng._drafter is None
                       and k_eff > 0)
        slotted = (suffix_only and not force
                   and self.runner.mesh is None
                   and not self.runner.is_multihost
                   and not _os.environ.get("ARCTIC_TPU_DISABLE_SLOTTED"))
        if force and suffix_only:
            wide = force == "wide"
            paths_np = (self._host_paths() if wide
                        else self._empty_paths())
        elif slotted:
            # TRUE per-slot draft width (round-4 item 3): each slot gets
            # K+1 or 1 verify rows by its own TTL/probe state.
            # Homogeneous steps (r_bucket None) run the uniform global
            # programs; width-mixed steps run the bucketed per-slot
            # program, with ALL buckets compiled on first mixed use
            # (lower().compile(), persistent-cache backed) — a serving
            # step must never eat a mid-measurement compile when the
            # workload mix shifts.
            paths_np, rplan_np, r_bucket, wide = self._slot_policy()
            if r_bucket is not None:
                self._prewarm_slotted(k_eff)
        elif suffix_only:
            # Wide while drafts were consumed within the last
            # CONSUME_MEMORY drained steps (long memory bridges the
            # per-slot gaps between path uploads — hot workloads hold
            # wide continuously, matching the always-wide r3 behaviour
            # they favour).
            self._wide_ttl = max(0, self._wide_ttl - 1)
            self._retry = max(0, self._retry - 1)
            if self._consuming_slots and not any(
                    self._host_alive[i] for i in self._consuming_slots):
                # Every slot that earned the sticky TTL has finished:
                # wide now only taxes the (dry) survivors.
                self._wide_ttl = 0
                self._consuming_slots.clear()
            if self._wide_ttl > 0:
                paths_np = self._host_paths()
            elif self._retry <= 0:
                # Retry probe: one round of walks tests for live paths.
                # "Live" = long enough to survive the device's gap
                # check: the host's anchor lags the device by
                # ~pipeline-depth emitted tokens, and the merge requires
                # gap < h_len — shorter paths are guaranteed-unusable
                # and must not re-arm the wide program.
                paths_np = self._host_paths()
                if bool((paths_np[:, self._plen + 1]
                         > self.depth + 1).any()):
                    # Exponential backoff: quick probes while paths
                    # first appear (cold start), rare ones when the
                    # device persistently rejects them (dry workload);
                    # any consumption resets the cadence.
                    self._retry = self._retry_period
                    self._retry_period = min(64, self._retry_period * 2)
                    self._wide_ttl = self.depth + 2
                else:
                    # Nothing live: keep probing at the BASE cadence
                    # (no doubling — a workload turning hot must be
                    # seen within ~RETRY_PERIOD steps, matching the
                    # old walk-every-step liveness check).
                    self._retry = self.RETRY_PERIOD
                    paths_np = self._empty_paths()
            else:
                paths_np = self._empty_paths()   # backoff: no walks
            wide = self._wide_ttl > 0
        elif self._suffix is not None:
            paths_np = self._host_paths()
        self.width_stats["wide" if wide else "narrow"] += 1
        if _os.environ.get("ARCTIC_TPU_FUSED_DEBUG"):
            live_n = (int((paths_np[:, self._plen + 1] > 0).sum())
                      if paths_np is not None else -1)
            ever = (int(self._slot_consumed.sum())
                    if getattr(self, "_slot_arrays_ready", False) else -1)
            print(f"[fused] {'W' if wide else 'n'} "
                  f"bucket={r_bucket} ever={ever} "
                  f"alive={sum(self._host_alive)} "
                  f"paths>0={live_n}", file=_sys.stderr)
        if r_bucket is not None:
            key = (self._state["n_computed"].shape[0], k_eff,
                   self._need_sampling, "slot", r_bucket)
        else:
            key = (self._state["n_computed"].shape[0], k_eff,
                   self._need_sampling, wide)
        fn = self._fns.get(key)
        if fn is None:
            fn = build_fused_step(self.runner, eng._drafter, k_eff,
                                  self._need_sampling, eng.eos_token_id,
                                  use_suffix=self._suffix is not None,
                                  path_len_max=self._plen,
                                  ring_w=self._ring_w, batch=key[0],
                                  export_hidden=True, wide=wide,
                                  rows_total=r_bucket)
            self._fns[key] = fn
        ch = self.runner.mh_channel
        if ch is not None:
            # Mirror the fused step on every process (same contract as
            # runner.dispatch: broadcast first, then issue the program).
            ch.broadcast({
                "kind": "fused", "b": key[0], "k": k_eff,
                "wide": wide,
                "need_sampling": self._need_sampling,
                "use_suffix": self._suffix is not None,
                "plen": self._plen, "ring_w": self._ring_w,
                "eos": eng.eos_token_id,
                "state": self._announce_state,
                "bt": self._bt_np if self._bt_dirty else None,
                "paths": paths_np})
            self._announce_state = None
            self._bt_dirty = False
        if paths_np is None:
            args = ()
        elif paths_np is getattr(self, "_empty_paths_np", None):
            # Narrow/backoff steps: reuse the cached device copy — zero
            # host->device transfers for the whole step.
            if getattr(self, "_empty_paths_dev", None) is None:
                self._empty_paths_dev = self._put(paths_np)
            args = (self._empty_paths_dev,)
        else:
            args = (self._put(paths_np),)
        if rplan_np is not None:
            args = args + (self._put(rplan_np),)
        self.runner.kv, self._state, telem, hidden = fn(
            self.runner.params, spec_params, self.runner.kv,
            self._state, self._bt_dev, self.runner.kv_scale, *args)
        try:
            telem.copy_to_host_async()
        except AttributeError:
            pass
        self._inflight.append(
            _InflightFused(telem, hidden if capture else None, k=k_eff))
        eng.engine_stats.num_steps += 1

        while len(self._inflight) > self.depth:
            finished.extend(self._drain_one())
        return finished

    def _spec_params(self):
        """Drafter params for the fused step: the proposer's local copy
        single-host; a cached mesh-replicated copy under multihost (the
        local copy keeps serving the leader-local sync-path drafter)."""
        eng = self.engine
        if eng._drafter is None:
            return None
        if not self.runner.is_multihost:
            return eng._drafter.params
        if self._spec_params_global is None:
            self._spec_params_global = jax.tree.map(
                self.runner._replicated, eng._drafter.params)
        return self._spec_params_global

    # -- per-slot width policy (round-4 item 3) -------------------------

    def _prewarm_slotted(self, k_eff: int) -> None:
        """Compile every row-bucket program for the current (B, K,
        sampling) once, ahead of use: the serving loop may hit any
        bucket as the workload mix shifts, and a cold compile inside a
        measured pass costs seconds on the tunnel.  ShapeDtypeStructs
        keep this transfer-free; the persistent jax cache makes repeat
        processes cheap."""
        b = self._state["n_computed"].shape[0]
        tag = (b, k_eff, self._need_sampling)
        if tag in self._prewarmed:
            return
        self._prewarmed.add(tag)
        eng = self.engine

        def sds(x):
            return jax.ShapeDtypeStruct(x.shape, x.dtype)

        params_s = jax.tree.map(sds, self.runner.params)
        kv_s = sds(self.runner.kv)
        state_s = {kk: sds(v) for kk, v in self._state.items()}
        bt_s = sds(self._bt_dev)
        kvs = self.runner.kv_scale
        kvs_s = jax.tree.map(sds, kvs) if kvs is not None else None
        hp_s = jax.ShapeDtypeStruct((b, self._plen + 2), jnp.int32)
        for R in self._row_buckets(b, k_eff + 1):
            key = (b, k_eff, self._need_sampling, "slot", R)
            if key in self._fns:
                continue
            fn = build_fused_step(
                self.runner, eng._drafter, k_eff, self._need_sampling,
                eng.eos_token_id, use_suffix=True,
                path_len_max=self._plen, ring_w=self._ring_w, batch=b,
                export_hidden=True, rows_total=R)
            rp_s = jax.ShapeDtypeStruct((2 * R + 2 * b,), jnp.int32)
            self._fns[key] = fn.lower(
                params_s, None, kv_s, state_s, bt_s, kvs_s, hp_s,
                rp_s).compile()

    def _ensure_slot_arrays(self):
        b = self._state["n_computed"].shape[0]
        if not self._slot_arrays_ready:
            init = (self.depth + 2) if self._hot_history else 0
            self._slot_ttl = np.full(b, init, np.int32)
            self._slot_retry = np.zeros(b, np.int32)
            self._slot_retry_period = np.full(b, self.RETRY_PERIOD,
                                              np.int32)
            self._slot_consumed = np.zeros(b, bool)
            self._slot_arrays_ready = True

    def _row_buckets(self, b: int, r: int) -> list:
        """Total-row buckets (each a compiled program): ~1.5x ladder
        between all-narrow (b) and all-wide (b*r)."""
        out = []
        for m in (1.0, 1.5, 2.0, 3.0, 4.0, 6.0, 8.0):
            v = min(int(-(-b * m // 8) * 8), b * r)
            if v not in out:
                out.append(v)
            if v >= b * r:
                break
        if out[-1] != b * r:
            out.append(b * r)
        return out

    #: fraction of alive slots that must have consumed drafts this
    #: entry for the batch to count as HOT overall (-> global wide
    #: program instead of a per-slot bucket).
    HOT_BATCH_FRAC = 0.75

    def _slot_policy(self):
        """Per-slot widths -> (paths, row plan, bucket, any_wide).

        Width rule: a slot keeps K+1 rows while it is alive and has
        EVER consumed drafts this entry, or while an engagement TTL is
        running; everything else gets 1 row.  Sticky-by-consumption is
        deliberate: it keeps each slot's row allotment — and therefore
        the step's compiled program — STABLE for the slot's lifetime.
        On tie-heavy logits (the random-weight bench target), token
        streams that cross compiled-program boundaries argmax-diverge
        and poison the suffix cache for the next repeat pass (measured
        2x repeat-throughput loss when widths decayed on a TTL and
        every bucket shift changed programs).

        Routing: >= HOT_BATCH_FRAC of alive slots ever-consumed ->
        GLOBAL wide program (a hot batch runs one uniform program for
        its whole lifetime, r5b-validated); no wide slots -> global
        narrow; otherwise the bucketed per-slot program, whose bucket
        stays fixed while the ever-consumed set is stable (the mixed
        workload's hot half)."""
        self._ensure_slot_arrays()
        b = self._state["n_computed"].shape[0]
        r = self._k + 1
        ttl, ret = self._slot_ttl, self._slot_retry
        per = self._slot_retry_period
        np.maximum(ttl - 1, 0, out=ttl)
        np.maximum(ret - 1, 0, out=ret)
        alive = np.asarray(self._host_alive, bool)
        ever = self._slot_consumed & alive
        hot = alive & (ever | (ttl > 0))
        probe = alive & ~hot & (ret <= 0)
        walk = hot | probe
        paths = (self._host_paths(mask=walk) if walk.any()
                 else self._empty_paths())
        live = paths[:, self._plen + 1] > self.depth + 1
        engage = probe & live
        self._engage_gate = max(0, self._engage_gate - 1)
        if engage.any():
            # Batch-shared rejection evidence: every engagement window
            # this entry that drained with ZERO consumption raises the
            # re-engagement floor for ALL slots (8, 16, 32, then 64
            # steps); any consumed draft resets it instantly.  Each slot
            # independently re-discovering "the device rejects this
            # workload's live-looking paths" cost dry workloads half
            # their steps in wasted wide windows — including each slot's
            # FIRST window, since paths go live staggered as responses
            # grow, so the failure evidence must also RATE-LIMIT new
            # engagements batch-wide (the gate), not just lengthen each
            # slot's own retry ladder.  A genuinely hot workload
            # consumes in its first windows, resets the counter, and
            # never sees the gate.  MISSES stay at base cadence on
            # purpose: a workload turning hot later surfaces as a
            # miss->live transition, and those probes stay cheap
            # (narrow program, batched walks), so detection latency is
            # still ~RETRY_PERIOD steps.
            esc = (0 if self._entry_failed < 2
                   else min(64, self.RETRY_PERIOD
                            << min(self._entry_failed - 1, 4)))
            if esc and self._engage_gate > 0:
                # Gated: keep the would-be engagers probing shortly
                # after the gate opens instead of opening windows now.
                ret[engage] = self._engage_gate + 1
            else:
                win = self.depth + 2
                ttl[engage] = win
                # The retry cadence starts AFTER the window drains.
                ret[engage] = win + np.maximum(per[engage], esc)
                per[engage] = np.minimum(
                    64, np.maximum(per[engage], esc) * 2)
                self._entry_failed += 1
                self._engage_gate = win + esc
        miss = probe & ~live
        if miss.any():
            ret[miss] = self.RETRY_PERIOD
        wide_slots = alive & (ever | (ttl > 0))
        if not wide_slots.any():
            return self._empty_paths(), None, None, False
        n_alive = int(alive.sum())
        if (not (alive & ~wide_slots).any()
                or (n_alive and ever.sum() / n_alive
                    >= self.HOT_BATCH_FRAC)):
            return paths, None, None, True
        widths = np.where(wide_slots, r, 1).astype(np.int64)
        buckets = self._row_buckets(b, r)
        r_real = int(widths.sum())
        r_bucket = next(v for v in buckets if v >= r_real)
        return paths, self._build_rplan(widths, r_bucket), r_bucket, True

    @staticmethod
    def _build_rplan(widths, r_bucket: int):
        b = len(widths)
        r_real = int(widths.sum())
        row_slot = np.full(r_bucket, -1, np.int32)
        row_off = np.zeros(r_bucket, np.int32)
        sstart = np.zeros(b, np.int32)
        sstart[1:] = np.cumsum(widths[:-1])
        rs = np.repeat(np.arange(b, dtype=np.int32),
                       widths.astype(np.int64))
        row_slot[:r_real] = rs
        row_off[:r_real] = np.arange(r_real, dtype=np.int32) - sstart[rs]
        return np.concatenate([row_slot, row_off, sstart,
                               widths.astype(np.int32)])

    def _empty_paths(self):
        """Zero-length packed path upload for narrow/backoff steps
        (h_len == 0 is rejected by the device's usable gate; shape
        matches _host_paths).  The DEVICE copy is cached too, so a
        narrow step performs zero host->device transfers."""
        b = self._state["n_computed"].shape[0]
        cached = getattr(self, "_empty_paths_np", None)
        if cached is None or cached.shape[0] != b:
            cached = np.zeros((b, self._plen + 2), np.int32)
            self._empty_paths_np = cached
            self._empty_paths_dev = None
        return cached

    def _host_paths(self, mask=None):
        """Speculate a suffix path per alive slot from the host's
        lag-synced prefix (reference SuffixCache.speculate semantics,
        ``common/suffix_cache/suffix_cache.py:200-222``); the device
        verifies the unseen gap and walks the tail.  ``mask`` (bool
        [B]) restricts the C++ tree walks to the given slots (per-slot
        width policy: dry slots skip their walks).  Returns host
        (numpy) arrays — the caller places them (and broadcasts them to
        follower mirrors under multihost)."""
        eng = self.engine
        sc = eng.config.speculative
        b = self._state["n_computed"].shape[0]
        pack = np.zeros((b, self._plen + 2), np.int32)
        h_path = pack[:, :self._plen]
        h_start = pack[:, self._plen]
        h_len = pack[:, self._plen + 1]
        # Suffix wins over the model drafter only when its score clears
        # the drafter's draft length (reference model_runner.py:546-575).
        min_score = (0 if eng._drafter is None
                     else sc.num_speculative_tokens)
        # The host's prefix lags the device by the in-flight steps; the
        # first ``lag`` path tokens are verified for free against the
        # ring (they were already emitted), so they must not count
        # against the confidence cap ``match_len*factor + offset`` —
        # otherwise most uploads die with gap >= len before the tail is
        # ever walked.  Extend the offset by the worst-case lag.
        est_lag = (len(self._inflight) + 1) * (self._k + 1)
        if not eng._spec_disabled_now():
            items = []
            for i, req in enumerate(self._slots):
                if req is None or not self._host_alive[i]:
                    continue
                if mask is not None and not mask[i]:
                    continue
                pattern = req.all_token_ids[-sc.suffix_cache_max_depth:]
                if not pattern:
                    continue
                items.append((i, dict(
                    req_id=req.req_id, pattern=pattern,
                    max_spec_tokens=self._plen,
                    max_spec_factor=sc.suffix_max_spec_factor,
                    max_spec_offset=sc.suffix_max_spec_offset + est_lag,
                    min_token_prob=sc.suffix_min_token_prob,
                    use_cached_prompt=self._suffix.has_cached_prompt(
                        req.req_id))))
            # Per-slot walks fan out over the engine's suffix worker
            # pool (GIL-free ctypes calls): at batch 32+ the serial
            # walks were ~half the hot-step host budget.
            results = self._suffix.speculate_batch(
                items, pool=getattr(eng, "_prompt_tree_pool", None))
            for i, res in results.items():
                if res.token_ids and res.score >= min_score:
                    n = min(len(res.token_ids), self._plen)
                    h_path[i, :n] = res.token_ids[:n]
                    h_start[i] = len(self._slots[i].all_token_ids)
                    h_len[i] = n
        return pack

    def _pre_extend_blocks(self) -> bool:
        """Grow block tables to cover the worst-case frontier of every
        in-flight plus the next step; upload the table if it changed."""
        eng = self.engine
        horizon = (len(self._inflight) + 1) * (self._k + 1) + 1
        changed = False
        for i, req in enumerate(self._slots):
            if req is None or not self._host_alive[i]:
                continue
            limit = min(len(req.prompt_token_ids) + req.sampling.max_tokens,
                        eng.config.model.max_model_len)
            ub = min(self._known_comp[i] + horizon, limit)
            before = len(req.block_ids)
            try:
                eng.scheduler.bm_for(req).grow_to(req.block_ids, ub)
            except Exception:
                return False
            if len(req.block_ids) != before:
                self._bt_np[i, before:len(req.block_ids)] = \
                    req.block_ids[before:]
                changed = True
        if changed:
            self._bt_dev = self._put(self._bt_np)
            self._bt_dirty = True
        return True

    def _drain_one(self) -> list:
        import time as _time
        eng = self.engine
        step = self._inflight.pop(0)
        telem = np.asarray(step.telemetry)
        r = step.k + 1
        finished: list = []
        capture_rows = capture_items = None
        if step.hidden is not None and eng.hidden_capture is not None:
            capture_rows = np.asarray(step.hidden).reshape(
                telem.shape[0] * r, -1)
            capture_items = []
        for i, req in enumerate(self._slots):
            if req is None or not self._host_alive[i]:
                continue
            row = telem[i]
            toks = [int(t) for t in row[:r] if t >= 0]
            if capture_items is not None:
                capture_items.extend(
                    (req.req_id, i * r + j, toks[j])
                    for j in range(len(toks)))
            dlen_used = int(row[r])
            if not toks:
                continue
            self._known_comp[i] += len(toks)
            req.num_computed_tokens += len(toks)
            req.output_token_ids.extend(toks)
            eng.scheduler.register_computed(req)
            if dlen_used > 0:
                # Consumption: keep the wide program hot.
                self._wide_ttl = max(self._wide_ttl, self.CONSUME_MEMORY)
                self._retry_period = self.RETRY_PERIOD
                self._hot_history = True
                self._consumed_this_entry = True
                self._entry_failed = 0
                self._engage_gate = 0
                self._consuming_slots.add(i)
                if self._slot_arrays_ready:
                    self._slot_ttl[i] = max(self._slot_ttl[i],
                                            self.CONSUME_MEMORY)
                    self._slot_retry_period[i] = self.RETRY_PERIOD
                    self._slot_consumed[i] = True
                n_acc = len(toks) - 1
                eng.spec_stats.observe(dlen_used, min(n_acc, dlen_used))
                req.num_draft_tokens += dlen_used
                req.num_accepted_draft_tokens += min(n_acc, dlen_used)
            eng.engine_stats.num_generated_tokens += len(toks)
            if req.first_token_time is None:
                req.first_token_time = _time.time()
            eng._update_suffix_cache(req, toks)
            stop = req.check_stop(eng.eos_token_id,
                                  eng.config.model.max_model_len)
            if stop is not None:
                # The device cleared this slot's alive flag in the same
                # step (its stop logic mirrors check_stop), so no later
                # in-flight step writes these blocks: safe to free now.
                req.finish_time = _time.time()
                req.num_computed_tokens = req.num_tokens - 1
                eng.scheduler.finish_request(req, stop)
                eng._evict_spec_state(req)
                self._host_alive[i] = False
                finished.append(req)
                eng.engine_stats.num_finished += 1
        if capture_items:
            eng.hidden_capture(capture_rows, capture_items)
        return finished

    # -- exit -----------------------------------------------------------

    def exit(self) -> list:
        finished: list = []
        while self._inflight:
            finished.extend(self._drain_one())
        if self.active:
            # A fully-dry entry resets the history: the next entry
            # probes instead of starting wide.
            self._hot_history = self._consumed_this_entry
        if self.active and self.runner.mh_channel is not None:
            self.runner.mh_channel.broadcast({"kind": "fused_exit"})
        self.engine.scheduler.protected_ids = set()
        self.active = False
        self._state = None
        self._bt_dev = None
        self._announce_state = None
        logger.debug("fused decode: exited")
        return finished


def _bucket(n: int, cap: int) -> int:
    b = 8
    while b < n:
        b *= 2
    return min(b, max(cap, n))
