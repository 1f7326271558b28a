"""Ulysses sequence parallelism + shift parallelism as SPMD programs.

TPU-native re-design of reference ``arctic_inference/vllm/ulysses.py``:
instead of swapping NCCL process groups at runtime
(``model_runner.py:73-74``), both execution modes are ``shard_map``
programs over one ``Mesh(dp, sp, tp)`` sharing the same stored weights and
the same paged KV cache:

- **SP (Ulysses) mode** — tokens sharded over ``sp``, weights sharded over
  ``tp``; attention exchanges tokens<->heads with ``lax.all_to_all`` over
  the ``sp`` axis (the hot collective, reference ``ulysses.py:457-519``),
  so each device attends over the FULL token batch with
  ``H/(sp*tp)`` heads; TP reductions are ``psum`` over ``tp``.
- **Shift (full-TP) mode** — tokens replicated, every weight locally
  re-sliced from its tp shard to the fused ``(tp, sp)`` shard (a
  comm-free dynamic slice — the reason weights need no second copy,
  unlike the reference's dual-model load, ``model_runner.py:746-776``);
  reductions are ``psum`` over both axes.

KV-layout invariance: in both modes the cache holds the same
``H/(sp*tp)`` heads per device, sharded over the fused ``("tp","sp")``
axis in that order, so the two programs read/write bit-identical pages
(the property stated in reference ``docs/shift-parallel.rst:34-36``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from arcticinference_tpu.config import ParallelConfig
from arcticinference_tpu.ops.fp8 import QuantizedLinear
from arcticinference_tpu.parallel import mesh as mesh_lib


def _local_slice(w, axis: int, idx, n: int):
    """Take this device's 1/n slice of `w` along `axis` (comm-free)."""
    size = w.shape[axis] // n
    return jax.lax.dynamic_slice_in_dim(w, idx * size, size, axis)


class ParallelContext:
    """Per-device hooks injected into the model forward under shard_map.

    GQA with ``num_kv_heads < sp*tp``: kv heads are replicated
    ``r = sp*tp / num_kv_heads``-fold (the reference's SP_AA/SP_AG
    decomposition, ``ulysses.py:249-295``, reduces to the same wire
    traffic).  In SP mode each tp shard repeats its kv heads so the sp
    all-to-all hands every device exactly the head its q-chunk needs; in
    shift mode the wk/wv shards are sliced at head granularity.
    """

    #: default shift-mode re-slice axes for per-layer [in, out] weights;
    #: MoE modules override via a ``SHIFT_SLICE_AXES`` attribute (expert
    #: weights slice their leading expert axis instead).
    DEFAULT_SLICE_AXES = {"wq": 1, "wk": 1, "wv": 1, "w_gate": 1,
                          "w_up": 1, "wo": 0, "w_down": 0,
                          # Qwen2 qkv biases: [out]-shaped, slice axis 0
                          # (kv biases follow the wk/wv head-granular
                          # slice under GQA replication).
                          "bq": 0, "bk": 0, "bv": 0,
                          # Fused decode layout (llama.fuse_params with
                          # interleave=tp*sp): the tp shard's out axis
                          # is sp consecutive [q_f|k_f|v_f] groups, so
                          # the plain contiguous subchunk slice is
                          # exactly the fused-shard segment.  Gated to
                          # kv_rep == 1 by the runner (head-granular kv
                          # re-slicing cannot reach inside the fusion).
                          "wqkv": 1, "w_gateup": 1, "bqkv": 0}

    def __init__(self, cfg: ParallelConfig, mode: str,
                 num_kv_heads: int = 0, head_dim: int = 0,
                 slice_axes: Optional[dict] = None):
        assert mode in ("sp", "shift")
        self.cfg = cfg
        self.mode = mode
        self.sp = cfg.ulysses_sequence_parallel_size
        self.tp = cfg.tensor_parallel_size
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.slice_axes = dict(self.DEFAULT_SLICE_AXES if slice_axes is None
                               else slice_axes)
        # kv replication factor (1 when heads divide evenly)
        self.kv_rep = (max(self.sp * self.tp // num_kv_heads, 1)
                       if num_kv_heads else 1)

    # -- weights ---------------------------------------------------------

    def layer_params(self, lp: dict) -> dict:
        """In shift mode, re-slice each tp weight shard to the fused
        (tp, sp) shard (sp-th subchunk): pure local slicing."""
        if self.mode == "sp" or self.sp == 1:
            return lp
        s = jax.lax.axis_index("sp")
        out = dict(lp)
        # Axes are for per-layer [in, out] weights (scan strips the L dim).
        for key, axis in self.slice_axes.items():
            if key not in lp:  # e.g. SwiftKV later layers have no wk/wv
                continue
            w = lp[key]
            if key in ("wk", "wv", "bk", "bv") and self.kv_rep > 1:
                # Head-granular slice: device (t, s) needs local kv head
                # floor(s * g / sp) of its tp shard (g heads per shard).
                g = self.num_kv_heads // self.tp
                head = (s * g) // self.sp
                d = self.head_dim

                def slice_head(x, ax=axis):
                    return jax.lax.dynamic_slice_in_dim(
                        x, head * d, d, ax)

                if isinstance(w, QuantizedLinear):
                    out[key] = QuantizedLinear(
                        slice_head(w.weight),
                        self._slice_scale(w, axis, slice_head))
                else:
                    out[key] = slice_head(w)
                continue
            if isinstance(w, QuantizedLinear):
                sl = functools.partial(_local_slice, idx=s, n=self.sp)
                out[key] = QuantizedLinear(
                    _local_slice(w.weight, axis, s, self.sp),
                    self._slice_scale(
                        w, axis, lambda x, ax: sl(x, axis=ax)))
            else:
                out[key] = _local_slice(w, axis, s, self.sp)
        return out

    @staticmethod
    def _slice_scale(w: "QuantizedLinear", axis: int, slice_fn):
        """Shift-mode scale re-slicing for non-scalar granularities.

        Scale ranks (see ``ops/fp8.py``): per-channel scales drop the
        weight's in-axis (``w.ndim - 2``), group scales keep every axis.
        When the sliced weight axis survives in the scale, slice the
        scale at the matching axis; slicing the in-axis of a per-channel
        scale is a no-op.  ``slice_fn(x, ax)`` must apply the SAME
        index window the weight slice used on axis ``ax``.
        """
        sc, wn = w.scale, w.weight.ndim
        if sc.ndim == wn:                      # group scales
            return slice_fn(sc, axis)
        if sc.ndim == wn - 1:                  # per out-channel
            if axis == wn - 2:
                return sc                      # in-axis: scale unaffected
            return slice_fn(sc, axis if axis < wn - 2 else axis - 1)
        return sc                              # per layer/tensor scalar

    # -- expert parallelism ---------------------------------------------

    def moe_expert_range(self, num_experts: int) -> tuple:
        """(global offset, count) of the experts this device holds.

        The reference builds a dedicated EP process group
        (``ulysses.py:199-207``); here expert parallelism is just the
        expert axis of the stacked expert weights sharded over ``tp``
        (SP mode) or the fused ``(tp, sp)`` axis (shift mode — the
        shard_map shard was already re-sliced by :meth:`layer_params`,
        so the count matches the local weight).
        """
        div = self.tp if self.mode == "sp" else self.tp * self.sp
        el = num_experts // max(div, 1)
        t = jax.lax.axis_index("tp") if self.tp > 1 else 0
        if self.mode == "sp" or self.sp == 1:
            return t * el, el
        s = jax.lax.axis_index("sp")
        # fused (tp, sp) order: tp-major, sp minor (same as weight slices)
        return (t * self.sp + s) * el, el

    # -- head counts at qkv time ----------------------------------------

    def arch_view(self, arch):
        div = self.tp if self.mode == "sp" else self.tp * self.sp
        kw = {}
        if hasattr(arch, "fused_seg"):
            # Fused-weight group count in the LOCAL shard: the runner
            # fuses with interleave = tp * (sp if shift-enabled else 1),
            # so the SP-mode tp shard holds sp groups when shift is on;
            # shift's layer_params re-slice leaves exactly one.  Read in
            # _qkv/_mlp only when fused keys are present, so setting it
            # unconditionally is harmless for unfused params.
            shift_on = self.cfg.enable_shift_parallel
            kw["fused_seg"] = (self.sp if (self.mode == "sp" and shift_on
                                           and self.sp > 1) else 1)
        return dataclasses.replace(
            arch,
            num_heads=arch.num_heads // div,
            num_kv_heads=max(arch.num_kv_heads // div, 1), **kw)

    def _rep_kv(self, k):
        """[T, g, D] -> [T, sp, D]: repeat so the sp all-to-all delivers
        each device the kv head its q-chunk uses (consecutive r-fold)."""
        return jnp.repeat(k, self.kv_rep, axis=1)

    # -- collectives -----------------------------------------------------

    def dispatch(self, q, k, v):
        """SP all-to-all: [T/sp, H/tp, D] -> [T, H/(sp*tp), D]."""
        if self.mode != "sp" or self.sp == 1:
            return q, k, v
        if self.kv_rep > 1:
            k = self._rep_kv(k)
            v = self._rep_kv(v)
        a2a = functools.partial(
            jax.lax.all_to_all, axis_name="sp", split_axis=1,
            concat_axis=0, tiled=True)
        return a2a(q), a2a(k), a2a(v)

    def combine(self, o):
        """Reverse all-to-all: [T, H/(sp*tp), D] -> [T/sp, H/tp, D]."""
        if self.mode != "sp" or self.sp == 1:
            return o
        return jax.lax.all_to_all(o, axis_name="sp", split_axis=0,
                                  concat_axis=1, tiled=True)

    def psum(self, x):
        """Row-parallel reduction: tp in SP mode, (tp, sp) in shift."""
        axes = ("tp",) if self.mode == "sp" else ("tp", "sp")
        axes = tuple(a for a in axes
                     if (self.tp if a == "tp" else self.sp) > 1)
        if not axes:
            return x
        return jax.lax.psum(x, axes)

    # -- token-axis views ------------------------------------------------

    def local_inputs(self, inputs: dict) -> dict:
        """Token-indexed arrays the qkv/mlp path sees: sp-sharded in SP
        mode (handled by shard_map in_specs), untouched here."""
        return inputs


def token_in_specs(mode: str, dp: bool = False) -> P:
    if dp:
        # In-engine DP: the token axis is dp-major (each dp group's
        # requests are packed contiguously), further sp-sharded in SP
        # mode.
        return P(("dp", "sp")) if mode == "sp" else P("dp")
    return P("sp") if mode == "sp" else P(None)


#: Per-token / per-request arrays that become PER-DP-GROUP under
#: in-engine data parallelism (stacked with a leading [dp] axis host-side
#: and sharded over "dp"; each group's attention sees only its own
#: requests, schedules and block tables).
DP_KEYS = ("positions", "req_idx", "slot_mapping", "seq_lens",
           "block_tables", "attn_item_req", "attn_item_qstart",
           "attn_item_qlen", "attn_item_pages", "attn_item_pos_base",
           "attn_token_item", "attn_token_off",
           # SwiftKV x dp: per-group local sample-row gather indices and
           # the second (sample-row) attention schedule.
           "logits_indices_dp", "swift_item_req", "swift_item_qstart",
           "swift_item_qlen", "swift_item_pages", "swift_item_pos_base",
           "swift_token_item", "swift_token_off")


def make_sharded_forward(module, arch, mesh: Mesh, cfg: ParallelConfig,
                         mode: str, attn_qb: Optional[int] = None,
                         quantized: bool = False,
                         embed_quantized: bool = False, params=None,
                         decode_qlen: int = 1):
    """Build the shard_map'd forward for one mode.

    Returns fn(params, kv, inputs) -> (kv, hidden[T, D_model]) operating on
    GLOBAL arrays (hidden gathered over sp).
    """
    pctx = ParallelContext(cfg, mode, num_kv_heads=arch.num_kv_heads,
                           head_dim=arch.head_dim,
                           slice_axes=getattr(module, "SHIFT_SLICE_AXES",
                                              None))
    num_experts = getattr(arch, "num_experts", 0)
    if num_experts:
        div = cfg.sp_tp_size if mode == "shift" else \
            cfg.tensor_parallel_size
        if num_experts % max(div, 1) != 0:
            raise NotImplementedError(
                f"num_experts={num_experts} must divide the expert-"
                f"parallel degree {div} ({mode} mode)")
    heads_div = cfg.sp_tp_size
    if arch.num_kv_heads % heads_div != 0:
        # KV replication case: requires whole heads per tp shard and an
        # integer replication factor.
        tp, sp = cfg.tensor_parallel_size, cfg.ulysses_sequence_parallel_size
        if arch.num_kv_heads % tp != 0:
            raise NotImplementedError(
                f"num_kv_heads={arch.num_kv_heads} must divide by tp={tp}")
        g = arch.num_kv_heads // tp
        if sp % g != 0:
            raise NotImplementedError(
                f"sp={sp} must be a multiple of kv-heads-per-shard {g}")

    attn_impl = None
    make_attn = getattr(module, "make_attn_impl", None)
    if make_attn is not None and attn_qb is not None:
        attn_impl = make_attn(attn_qb, decode_qlen=decode_qlen)

    dp = cfg.data_parallel_size > 1
    param_spec_tree = _param_spec_tree(module, quantized,
                                       embed_quantized=embed_quantized,
                                       params=params)
    # Modules that gather + return only the sample rows (SwiftKV) emit a
    # replicated hidden block rather than a token-sharded one.
    rows_out = bool(getattr(module, "RETURNS_SAMPLE_ROWS", False))

    def body(params, kv, tok_inputs, dp_inputs, full_inputs):
        inputs = dict(full_inputs)
        # Per-dp-group arrays arrive with a local leading [1] axis.
        inputs.update({k: v[0] for k, v in dp_inputs.items()})
        inputs.update(tok_inputs)
        if "logits_indices_dp" in inputs:
            # SwiftKV x dp: the model's token-drop gather uses the
            # GROUP-LOCAL indices (the flat global logits_indices in
            # full_inputs addresses the step fn's non-swift path).
            inputs["logits_indices"] = inputs.pop("logits_indices_dp")
        kv, h = module.forward(
            params, arch, kv, inputs, attn_impl=attn_impl, pctx=pctx)
        return kv, h

    def make_smapped(dp_keys: tuple, use_dp: bool):
        tok_spec = token_in_specs(mode, dp=use_dp)
        kv_spec = mesh_lib.kv_cache_spec(dp=use_dp)
        specs = (
            param_spec_tree,
            kv_spec,
            {k: tok_spec for k in ("input_ids", "positions_local")},
            {k: P("dp") for k in dp_keys},
            P(),  # full_inputs replicated
        )
        # SwiftKV returns only the (per-group) sample rows: dp-major
        # sharded under dp, replicated otherwise.
        rows_spec = P("dp") if use_dp else P()
        out_specs = (kv_spec, rows_spec if rows_out else tok_spec)
        return shard_map(body, mesh=mesh, in_specs=specs,
                         out_specs=out_specs, check_vma=False)

    smapped_cache: dict = {}

    def fn(params, kv, inputs):
        # The dp-sharded layout is the runner's (positions_flat +
        # stacked per-group arrays); flat inputs on a dp>1 mesh simply
        # replicate over dp (forward-level callers / dryruns).
        use_dp = dp and "positions_flat" in inputs
        tok_inputs = {
            "input_ids": inputs["input_ids"],
            "positions_local": inputs["positions_flat"]
            if use_dp else inputs["positions"],
        }
        if use_dp:
            dp_inputs = {k: inputs[k] for k in DP_KEYS if k in inputs}
            skip = set(dp_inputs) | {"input_ids", "positions_flat"}
            full_inputs = {k: v for k, v in inputs.items()
                           if k not in skip}
        else:
            dp_inputs = {}
            full_inputs = {k: v for k, v in inputs.items()
                           if k != "input_ids"}
        key = (tuple(sorted(dp_inputs)), use_dp)
        sm = smapped_cache.get(key)
        if sm is None:
            sm = smapped_cache[key] = make_smapped(key[0], use_dp)
        # The LM head is consumed outside shard_map (logits run under
        # auto-GSPMD); pass only the decoder params through.
        fwd_params = {k: params[k] for k in _FWD_KEYS if k in params}
        return sm(fwd_params, kv, tok_inputs, dp_inputs, full_inputs)

    return fn


_FWD_KEYS = ("embed", "layers", "final_norm", "layers_a", "layers_b",
             "wk_swift", "wv_swift", "norm_swiftkv")


def _param_spec_tree(module, quantized: bool, pp: bool = False,
                     embed_quantized: bool = False, params=None):
    """Build the exact-structure spec pytree for shard_map in_specs
    (decoder params only — the LM head stays outside shard_map).

    ``params`` (optional) supplies the actual leaves so scale specs can
    follow the quantization granularity (per-channel int8 scales shard
    with the weight's out axis; see ``mesh.quantized_leaf_spec``).
    """
    hook = getattr(module, "param_specs", None)
    specs = hook(pp=pp) if hook is not None else mesh_lib.param_specs(pp=pp)
    specs = {k: v for k, v in specs.items() if k in _FWD_KEYS}
    # shard_map in_specs must match the param structure exactly: prune
    # variant layer keys (Qwen2 biases / Qwen3 qk norms) the model lacks.
    for lk in ("layers", "layers_a", "layers_b"):
        if lk not in specs or not isinstance(specs[lk], dict):
            continue
        if params is not None and lk in params:
            have = set(params[lk])
            specs[lk] = {k: v for k, v in specs[lk].items() if k in have}
        else:
            specs[lk] = {k: v for k, v in specs[lk].items()
                         if k not in mesh_lib.OPTIONAL_LAYER_KEYS}
    scale_spec = P("pp") if pp else P(None)
    if embed_quantized and "embed" in specs:
        specs["embed"] = QuantizedLinear(specs["embed"], P())

    if not quantized:
        return specs
    q_keys = getattr(module, "_QUANT_KEYS",
                     getattr(__import__(
                         "arcticinference_tpu.models.llama",
                         fromlist=["_QUANT_KEYS"]), "_QUANT_KEYS", ()))

    def qspec(wspec, leaf):
        if isinstance(leaf, QuantizedLinear):
            return QuantizedLinear(*mesh_lib.quantized_leaf_spec(
                wspec, leaf.weight.ndim, leaf.scale.ndim))
        return QuantizedLinear(wspec, scale_spec)

    def quantize_layer_specs(layers, pleaves):
        layers = dict(layers)
        for k in q_keys:
            if k in layers:
                layers[k] = qspec(layers[k],
                                  pleaves.get(k) if pleaves else None)
        return layers

    out = dict(specs)
    for key in ("layers", "layers_a", "layers_b"):
        if key in out:
            out[key] = quantize_layer_specs(
                out[key], params.get(key) if params else None)
    for key in ("wk_swift", "wv_swift"):
        if key in out:
            out[key] = (qspec(out[key], params.get(key))
                        if params else QuantizedLinear(out[key], P(None)))
    return out
