"""Pipeline parallelism as one SPMD GPipe program.

The reference implements PP with rank groups plus point-to-point
send/recv of IntermediateTensors between worker processes (reference
``ulysses.py:176-186``, ``model_runner.py:352-375``).  The TPU-native
equivalent avoids host-driven p2p entirely:

- the stacked layer parameters AND the paged KV cache shard their
  leading layer axis over mesh axis ``"pp"`` (each stage holds only its
  own layers' weights and pages);
- one jitted ``shard_map`` program splits the flat token batch into
  ``M = pp`` microbatches and rotates activations stage-to-stage with
  ``lax.ppermute`` inside a static tick loop of ``M + pp - 1`` ticks.

SPMD uniformity: every stage computes every tick (bubble ticks process
garbage rows); correctness is preserved by routing bubble-tick KV writes
to the reserved sink block (slot ``-1``) and by only committing the last
stage's valid outputs (all other contributions are zeroed and summed
away by a final ``psum`` over ``"pp"``).

Causality across microbatches: tokens are host-ordered by (request,
position), so a contiguous row split keeps every token's intra-request
predecessors in the same or an earlier microbatch — their KV is already
written when a later microbatch reaches any given stage.

Composition with SP/TP/shift (the reference's full PP×SP×TP product,
``ulysses.py:151-162``):

- **TP** — ``psum`` over ``"tp"`` inside each stage (always on).
- **SP (Ulysses)** — each stage's microbatch is additionally sharded
  over ``"sp"``: a device holds ``tm/sp`` rows, attention all-to-alls
  tokens<->heads over ``"sp"`` exactly like the non-pipelined SP
  program, and the rotating activation is the sp-LOCAL chunk (ICI
  traffic per tick shrinks by 1/sp).
- **shift (full-TP)** — rows replicated within a stage; weights
  re-sliced per layer to the fused ``(tp, sp)`` shard by the parallel
  context.  The per-step mode switch then works under PP too.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from arcticinference_tpu.config import ParallelConfig
from arcticinference_tpu.parallel import mesh as mesh_lib
from arcticinference_tpu.parallel.ulysses import (ParallelContext,
                                                  _param_spec_tree)

# Row-indexed arrays sliced per microbatch; everything else is shared.
_ROW_KEYS = ("input_ids", "positions", "req_idx", "slot_mapping")
_FWD_KEYS = ("embed", "layers", "final_norm")
# Pallas schedule arrays: host builds one schedule PER MICROBATCH,
# stacked on a leading pp axis under "pp"-prefixed keys (runner
# prepare_inputs); each stage body indexes its current microbatch's
# schedule and hands it to the attention impl under the plain names.
_ATTN_KEYS = ("attn_item_req", "attn_item_qstart", "attn_item_qlen",
              "attn_item_pages", "attn_item_pos_base", "attn_token_item",
              "attn_token_off")


def make_pp_forward(module, arch, mesh: Mesh, cfg: ParallelConfig,
                    attn_qb: Optional[int] = None,
                    quantized: bool = False,
                    embed_quantized: bool = False,
                    mode: str = "sp", params=None):
    """Build the pipelined forward: fn(params, kv, inputs) ->
    (kv, hidden[T, D]) on global arrays, layers/kv pp-sharded.

    ``mode`` selects the intra-stage program: ``"sp"`` (Ulysses SP × TP;
    plain TP when sp == 1) or ``"shift"`` (full TP over the fused
    (tp, sp) axis).
    """
    pp = cfg.pipeline_parallel_size
    sp = cfg.ulysses_sequence_parallel_size
    assert pp > 1 and mode in ("sp", "shift")
    scan_layers = getattr(module, "scan_layers", None)
    if scan_layers is None:
        raise NotImplementedError(
            f"{module.__name__} does not support pipeline parallelism")
    pctx = ParallelContext(cfg, mode, num_kv_heads=arch.num_kv_heads,
                           head_dim=arch.head_dim,
                           slice_axes=getattr(module, "SHIFT_SLICE_AXES",
                                              None))
    # Rows are sp-sharded inside a stage only in SP mode.
    row_shard = sp if mode == "sp" else 1

    attn_impl = None
    make_attn = getattr(module, "make_attn_impl", None)
    if make_attn is not None and attn_qb is not None:
        attn_impl = make_attn(attn_qb)

    def body(params, kv, inputs):
        stage = jax.lax.axis_index("pp")
        ids = inputs["input_ids"]
        t_total = ids.shape[0]
        m = pp                         # microbatches = stages
        tm = t_total // m
        chunk = tm // row_shard        # rows this device carries per tick
        s = jax.lax.axis_index("sp") if row_shard > 1 else 0
        dt = params["final_norm"].dtype   # embed may be fp8-quantized
        d = arch.hidden_size

        shared = {k: v for k, v in inputs.items() if k not in _ROW_KEYS}
        h_cur = jnp.zeros((chunk, d), dt)
        out = jnp.zeros((t_total, d), dt)

        for t in range(m + pp - 1):
            m_here = t - stage                       # traced, per stage
            valid = (m_here >= 0) & (m_here < m)
            start = jnp.clip(m_here, 0, m - 1) * tm
            # This device's row window within the microbatch (SP shard).
            lstart = start + s * chunk

            def sl(a, st=None, n=tm):
                return jax.lax.dynamic_slice_in_dim(
                    a, start if st is None else st, n, 0)

            mb = dict(shared)
            for k in _ROW_KEYS:
                mb[k] = sl(inputs[k])
            mi = jnp.clip(m_here, 0, m - 1)
            for k in _ATTN_KEYS:
                if "pp" + k in inputs:
                    # Bubble ticks replay a real microbatch's schedule;
                    # their attention output is discarded and their KV
                    # writes go to the sink block, so stale page reads
                    # are harmless.
                    mb[k] = jax.lax.dynamic_index_in_dim(
                        inputs["pp" + k], mi, 0, keepdims=False)
            # RoPE runs on the locally held rows (sp-sharded in SP mode);
            # attention metadata stays full-microbatch.
            mb["positions_local"] = sl(inputs["positions"], lstart, chunk)
            # Bubble ticks write K/V to the sink block (slot -1).
            mb["slot_mapping"] = jnp.where(valid, mb["slot_mapping"], -1)

            local_ids = sl(inputs["input_ids"], lstart, chunk)
            inject = jnp.equal(stage, 0) & (t < m)
            h_in = jnp.where(
                inject,
                module.embed_lookup(params, local_ids).astype(dt),
                h_cur)
            kv, h_out = scan_layers(params["layers"], arch, kv, h_in,
                                    mb, attn_impl=attn_impl, pctx=pctx)
            done = jnp.equal(stage, pp - 1) & valid
            fin = module.finalize_hidden(params, arch, h_out)
            out = jax.lax.dynamic_update_slice_in_dim(
                out, jnp.where(done, fin, jnp.zeros_like(fin)), lstart, 0)
            h_cur = jax.lax.ppermute(
                h_out, "pp", [(i, (i + 1) % pp) for i in range(pp)])

        # Each (last-stage, sp-shard) device contributed its own rows;
        # everything else is zero.  In shift mode rows are replicated
        # over sp, so only "pp" is reduced.
        axes = ("pp", "sp") if row_shard > 1 else ("pp",)
        return kv, jax.lax.psum(out, axes)

    param_specs = _param_spec_tree(module, quantized, pp=True,
                                   embed_quantized=embed_quantized,
                                   params=params)
    param_specs = {k: v for k, v in param_specs.items() if k in _FWD_KEYS}
    kv_spec = mesh_lib.kv_cache_spec(pp=True)
    smapped = shard_map(
        body, mesh=mesh,
        in_specs=(param_specs, kv_spec, P()),
        out_specs=(kv_spec, P()),
        check_vma=False)

    # ---- in-engine DP x PP ------------------------------------------- #
    # The dp layout packs each group's tokens into its own t_shard
    # window (runner._prepare_inputs_dp) and stacks per-group arrays
    # with a leading [dp] axis.  shard_map hands every (dp, pp, sp, tp)
    # device its group's LOCAL view, so the GPipe tick loop above runs
    # unchanged per dp group — the body only needs the [1] leading axis
    # stripped, exactly like the non-pipelined dp forward
    # (ulysses.py make_sharded_forward).
    PP_DP_KEYS = ("positions", "req_idx", "slot_mapping", "seq_lens",
                  "block_tables") + tuple("pp" + k for k in _ATTN_KEYS)

    def body_dp(params, kv, tok_inputs, dp_inputs, full_inputs):
        inputs = dict(full_inputs)
        inputs.update({k: v[0] for k, v in dp_inputs.items()})
        inputs.update(tok_inputs)
        return body(params, kv, inputs)

    smapped_dp_cache: dict = {}

    def make_smapped_dp(dp_keys: tuple):
        kv_dp = mesh_lib.kv_cache_spec(pp=True, dp=True)
        specs = (
            param_specs,
            kv_dp,
            {"input_ids": P("dp")},
            {k: P("dp") for k in dp_keys},
            P(),
        )
        return shard_map(body_dp, mesh=mesh, in_specs=specs,
                         out_specs=(kv_dp, P("dp")), check_vma=False)

    def fn(params, kv, inputs):
        fwd_params = {k: params[k] for k in _FWD_KEYS if k in params}
        # The FLAT schedule arrays describe the full batch; PP attention
        # uses the stacked per-microbatch "pp"-prefixed schedules instead
        # (absent e.g. in the fused decode step, which then runs the jnp
        # reference attention under PP).
        clean = {k: v for k, v in inputs.items()
                 if not k.startswith("attn_item")
                 and not k.startswith("attn_token")}
        if cfg.data_parallel_size > 1 and "positions_flat" in clean:
            tok_inputs = {"input_ids": clean["input_ids"]}
            dp_keys = tuple(k for k in PP_DP_KEYS if k in clean)
            dp_inputs = {k: clean[k] for k in dp_keys}
            skip = set(dp_inputs) | {"input_ids", "positions_flat",
                                     "logits_indices_dp"}
            full = {k: v for k, v in clean.items() if k not in skip}
            sm = smapped_dp_cache.get(dp_keys)
            if sm is None:
                sm = smapped_dp_cache[dp_keys] = make_smapped_dp(dp_keys)
            return sm(fwd_params, kv, tok_inputs, dp_inputs, full)
        return smapped(fwd_params, kv, clean)

    return fn
