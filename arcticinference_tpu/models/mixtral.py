"""Mixtral-family sparse MoE decoder (expert parallelism).

The reference's MoE support is limited to routing vLLM's ``FusedMoE``
through an EP process group of size DP×TP and bypassing its
data-parallel chunking so the shift model works (reference
``ulysses.py:199-207,592-599``); the CUDA expert compute comes from
vLLM's grouped-GEMM kernels.  The TPU-native design is different:

- Attention/embedding/lm-head reuse the Llama stack unchanged (same
  scan body — the MoE block slots into ``scan_layers``'s ``mlp_fn``
  hook).
- The expert MLP is **dropless** by default: flatten the (token, k)
  assignments, sort by expert, and run the three SwiGLU matmuls with
  ``jax.lax.ragged_dot`` — XLA's grouped matmul, which tiles straight
  onto the MXU (the TPU analogue of vLLM's grouped GEMM).
- **Expert parallelism** is just the expert axis of the stacked expert
  weights sharded over the mesh: over ``tp`` in SP/TP mode, over the
  fused ``(tp, sp)`` axis in shift mode (re-sliced locally like every
  other weight, see ``parallel/ulysses.py``).  Each device computes its
  local experts' contributions and the existing row-parallel ``psum``
  combines them — no separate EP process group, no all-to-all token
  exchange needed within one chip's batch.
- With ``moe_capacity_factor > 0`` each EP shard compresses the sorted
  assignment list to a static per-shard capacity around its own expert
  range (compute scales 1/ep; overflow tokens drop their expert
  contribution, standard GShard-style capacity semantics).  The default
  (0) is exact/dropless: every shard scans all assignments but only
  multiplies by nonzero gate weights for its own rows.

Checkpoint layout follows HF ``MixtralForCausalLM``
(``block_sparse_moe.gate`` + ``experts.N.w{1,2,3}``).  Sliding-window
attention (Mixtral v0.1's 4k window) is intentionally not applied — the
engine's ``max_model_len`` bounds context instead; full attention is a
superset and matches HF's default eager path for later checkpoints.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from arcticinference_tpu.models import llama as llama_mod
from arcticinference_tpu.models.llama import (
    LlamaArch, compute_logits, embed_lookup, finalize_hidden,
    make_attn_impl)
from arcticinference_tpu.ops.fp8 import (QuantizedLinear, fp8_dequantize,
                                         fp8_quantize, weight_quantize)
from arcticinference_tpu.ops.layers import rms_norm

__all__ = ["MixtralArch", "Arch", "init_params", "load_hf_state",
           "forward", "scan_layers", "compute_logits", "embed_lookup",
           "finalize_hidden", "make_attn_impl", "param_specs"]


@dataclasses.dataclass(frozen=True)
class MixtralArch(LlamaArch):
    num_experts: int = 8
    num_experts_per_tok: int = 2
    #: 0 = dropless (every EP shard processes the full assignment list);
    #: >0 = static per-shard capacity ``ceil(T*k*cf/ep)`` (compute scales
    #: with 1/ep, overflow assignments are dropped).
    moe_capacity_factor: float = 0.0

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "MixtralArch":
        base = LlamaArch.from_hf_config(cfg)
        return cls(
            **{f.name: getattr(base, f.name)
               for f in dataclasses.fields(LlamaArch)},
            num_experts=cfg.get("num_local_experts", 8),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
        )


Arch = MixtralArch

# Per-layer weights that re-slice over sp in shift mode: attention
# weights slice their feature axis; expert weights slice the leading
# EXPERT axis (expert parallelism over the fused (tp, sp) axis).
SHIFT_SLICE_AXES = {"wq": 1, "wk": 1, "wv": 1, "wo": 0,
                    "w_gate": 0, "w_up": 0, "w_down": 0}

_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def param_specs(pp: bool = False) -> dict:
    """PartitionSpecs: attention like Llama; expert stacks shard their
    expert axis over ``tp`` (EP); the tiny router is replicated.  With
    ``pp`` the stacked layer axis additionally shards over the pipeline
    axis (each stage holds its own layers' attention + expert weights;
    per-layer fp8 scales follow via ``P("pp")``)."""
    from jax.sharding import PartitionSpec as P

    l_ax = "pp" if pp else None
    col = P(l_ax, None, "tp")
    row = P(l_ax, "tp", None)
    return {
        "embed": P(None, None),
        "final_norm": P(None),
        "lm_head": P(None, "tp"),
        "layers": {
            "input_norm": P(l_ax, None),
            "post_norm": P(l_ax, None),
            "wq": col, "wk": col, "wv": col,
            "wo": row,
            "w_router": P(l_ax, None, None),
            "w_gate": P(l_ax, "tp", None, None),
            "w_up": P(l_ax, "tp", None, None),
            "w_down": P(l_ax, "tp", None, None),
        },
    }


def init_params(arch: MixtralArch, rng: jax.Array,
                dtype: jnp.dtype = jnp.bfloat16,
                quantization: Optional[str] = None) -> dict:
    """Random parameter pytree (benchmarks / tests); experts stacked
    ``[L, E, in, out]`` so one PartitionSpec shards the expert axis."""
    keys = iter(jax.random.split(rng, 20))
    d, hq, hkv, dh = (arch.hidden_size, arch.num_heads, arch.num_kv_heads,
                      arch.head_dim)
    li, lL, e = arch.intermediate_size, arch.num_layers, arch.num_experts
    quant = quantization is not None

    def w(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(
            dtype)

    def qw(key, shape):
        if not quant:
            return w(key, shape)
        x = jax.random.normal(key, shape, jnp.bfloat16) * 0.02
        return weight_quantize(x, quantization)

    params = {
        "embed": w(next(keys), (arch.vocab_size, d)),
        "layers": {
            "input_norm": jnp.ones((lL, d), dtype),
            "post_norm": jnp.ones((lL, d), dtype),
            "wq": qw(next(keys), (lL, d, hq * dh)),
            "wk": qw(next(keys), (lL, d, hkv * dh)),
            "wv": qw(next(keys), (lL, d, hkv * dh)),
            "wo": qw(next(keys), (lL, hq * dh, d)),
            "w_router": w(next(keys), (lL, d, e)),
            "w_gate": qw(next(keys), (lL, e, d, li)),
            "w_up": qw(next(keys), (lL, e, d, li)),
            "w_down": qw(next(keys), (lL, e, li, d)),
        },
        "final_norm": jnp.ones((d,), dtype),
    }
    if not arch.tie_word_embeddings:
        head = w(next(keys), (d, arch.vocab_size))
        params["lm_head"] = (weight_quantize(head, quantization)
                             if quant else head)
    return params


def quantize_params(params: dict, mode: str = "fp8") -> dict:
    out = dict(params)
    layers = dict(params["layers"])
    for k in _QUANT_KEYS:
        if not isinstance(layers[k], QuantizedLinear):
            layers[k] = weight_quantize(layers[k], mode)
    out["layers"] = layers
    if "lm_head" in out and not isinstance(out["lm_head"], QuantizedLinear):
        out["lm_head"] = weight_quantize(out["lm_head"], mode)
    return out


# --------------------------------------------------------------------- #
# The MoE block (scan_layers mlp_fn hook)
# --------------------------------------------------------------------- #

def _deq(w):
    if isinstance(w, QuantizedLinear):
        return fp8_dequantize(w)
    return w


def _moe_mlp(x: jax.Array, lp: dict, arch: MixtralArch, pctx) -> jax.Array:
    """Routed SwiGLU over the locally held experts.

    Returns the LOCAL expert contributions; the caller's ``psum`` (over
    tp, or (tp, sp) in shift mode) completes each token's sum — every
    assignment is owned by exactly one EP shard, so the sum is exact.
    """
    t, d = x.shape
    e_total, k = arch.num_experts, arch.num_experts_per_tok
    logits = jnp.dot(x.astype(jnp.float32),
                     lp["w_router"].astype(jnp.float32))       # [T, E]
    topv, topi = jax.lax.top_k(logits, k)
    gate = jax.nn.softmax(topv, axis=-1)                       # [T, K]

    flat_e = topi.reshape(-1).astype(jnp.int32)                # [T*K]
    order = jnp.argsort(flat_e)
    sorted_e = flat_e[order]
    tok = order // k                                           # [T*K]
    weight = gate.reshape(-1)[order]                           # [T*K]

    if pctx is None:
        e0, el = 0, e_total
    else:
        e0, el = pctx.moe_expert_range(e_total)
    ep = e_total // el

    rows = t * k
    cf = arch.moe_capacity_factor
    if cf and ep > 1:
        cap = min(rows, max(8, -(-int(math.ceil(rows * cf)) // ep)))
        if cap < rows:
            # Compress the sorted list to a static window around this
            # shard's expert range (rows past the window lose their
            # expert contribution — GShard capacity semantics).
            start = jnp.searchsorted(sorted_e, jnp.asarray(e0, sorted_e.dtype))
            start = jnp.clip(start, 0, rows - cap).astype(jnp.int32)
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, cap, 0)
            sorted_e, tok, weight = sl(sorted_e), sl(tok), sl(weight)

    xs = x[tok]                                                # [R, d]
    local = sorted_e - e0
    valid = (local >= 0) & (local < el)
    local = jnp.clip(local, 0, el - 1)
    # Clamping keeps grouping contiguous: out-of-range rows are a prefix
    # (clamped into group 0) and a suffix (into group el-1) of the
    # expert-sorted list; their gate weight is zeroed below.
    counts = jnp.bincount(local, length=el).astype(jnp.int32)

    wg, wu, wd = _deq(lp["w_gate"]), _deq(lp["w_up"]), _deq(lp["w_down"])
    g = jax.lax.ragged_dot(xs, wg, counts,
                           preferred_element_type=jnp.float32)
    u = jax.lax.ragged_dot(xs, wu, counts,
                           preferred_element_type=jnp.float32)
    mid = (jax.nn.silu(g) * u).astype(x.dtype)
    y = jax.lax.ragged_dot(mid, wd, counts,
                           preferred_element_type=jnp.float32)
    y = y * (weight * valid.astype(jnp.float32))[:, None]
    out = jnp.zeros((t, d), jnp.float32).at[tok].add(y)
    return out.astype(x.dtype)


# --------------------------------------------------------------------- #
# Forward (delegates to the Llama scan with the MoE mlp hook)
# --------------------------------------------------------------------- #

def scan_layers(layers: dict, arch: MixtralArch, kv: jax.Array,
                h: jax.Array, inputs: dict, attn_impl=None, pctx=None,
                unroll: bool = False):
    return llama_mod.scan_layers(layers, arch, kv, h, inputs,
                                 attn_impl=attn_impl, pctx=pctx,
                                 unroll=unroll, mlp_fn=_moe_mlp)


def forward(params: dict, arch: MixtralArch, kv: jax.Array,
            inputs: dict, attn_impl=None, pctx=None,
            unroll: bool = False):
    if attn_impl is None:
        attn_impl = make_attn_impl()
    h = embed_lookup(params, inputs["input_ids"])
    kv, h = scan_layers(params["layers"], arch, kv, h, inputs,
                        attn_impl=attn_impl, pctx=pctx, unroll=unroll)
    h = rms_norm(h, params["final_norm"], arch.rms_norm_eps)
    return kv, h


# --------------------------------------------------------------------- #
# HF checkpoint mapping (MixtralForCausalLM)
# --------------------------------------------------------------------- #

_ATTN_MAP = {
    "self_attn.q_proj.weight": "wq",
    "self_attn.k_proj.weight": "wk",
    "self_attn.v_proj.weight": "wv",
    "self_attn.o_proj.weight": "wo",
}
_NORM_MAP = {
    "input_layernorm.weight": "input_norm",
    "post_attention_layernorm.weight": "post_norm",
}
# experts.N.w1 -> gate, w3 -> up, w2 -> down (HF Mixtral naming)
_EXPERT_MAP = {"w1": "w_gate", "w3": "w_up", "w2": "w_down"}


def load_hf_state(arch: MixtralArch, tensors: dict[str, np.ndarray],
                  dtype: jnp.dtype = jnp.bfloat16,
                  quantization: Optional[str] = None) -> dict:
    """Assemble the pytree from a flat HF Mixtral state dict.

    BF16 checkpoints only (quantize with ``quantization="fp8"``);
    pre-quantized fp8 MoE checkpoints are not in the reference's support
    matrix either.
    """
    lL, e = arch.num_layers, arch.num_experts
    attn: dict[str, list] = {k: [None] * lL for k in _ATTN_MAP.values()}
    norms: dict[str, list] = {k: [None] * lL for k in _NORM_MAP.values()}
    routers: list = [None] * lL
    experts: dict[str, list] = {
        k: [[None] * e for _ in range(lL)] for k in _EXPERT_MAP.values()}
    params: dict = {"layers": {}}

    for name, arr in tensors.items():
        if name == "model.embed_tokens.weight":
            params["embed"] = jnp.asarray(arr, dtype)
        elif name == "model.norm.weight":
            params["final_norm"] = jnp.asarray(arr, dtype)
        elif name == "lm_head.weight":
            params["lm_head"] = jnp.asarray(arr.T, dtype)
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx_s, _, leaf = rest.partition(".")
            l = int(idx_s)
            if leaf in _ATTN_MAP:
                attn[_ATTN_MAP[leaf]][l] = arr.T
            elif leaf in _NORM_MAP:
                norms[_NORM_MAP[leaf]][l] = arr
            elif leaf == "block_sparse_moe.gate.weight":
                routers[l] = arr.T                      # [d, E]
            elif leaf.startswith("block_sparse_moe.experts."):
                rest2 = leaf[len("block_sparse_moe.experts."):]
                eidx_s, _, wname = rest2.partition(".")
                wkey = _EXPERT_MAP.get(wname.replace(".weight", ""))
                if wkey is not None:
                    experts[wkey][l][int(eidx_s)] = arr.T   # [in, out]

    layers = params["layers"]
    for key, stack in {**attn, **norms}.items():
        missing = [i for i, s in enumerate(stack) if s is None]
        if missing:
            raise ValueError(f"missing layers {missing} for {key}")
        layers[key] = jnp.stack([jnp.asarray(s, dtype) for s in stack])
    if any(r is None for r in routers):
        raise ValueError("missing block_sparse_moe.gate weights")
    layers["w_router"] = jnp.stack(
        [jnp.asarray(r, dtype) for r in routers])
    for key, per_layer in experts.items():
        for l, row in enumerate(per_layer):
            missing = [i for i, s in enumerate(row) if s is None]
            if missing:
                raise ValueError(
                    f"layer {l} missing experts {missing} for {key}")
        layers[key] = jnp.stack(
            [jnp.stack([jnp.asarray(s, dtype) for s in row])
             for row in per_layer])

    if arch.tie_word_embeddings:
        params.pop("lm_head", None)
    if quantization:
        params = quantize_params(params, quantization)
    return params
