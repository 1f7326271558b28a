"""LlamaSwiftKV: early-exit prefill with projected KV for later layers.

Capability mirror of reference ``vllm/swiftkv/llama_swiftkv.py`` (the
SwiftKV architecture, ``docs/swiftkv.rst``): the first
``num_key_value_layers`` (K) decoder layers run normally; at the K-layer
boundary a single fused projection produces the K/V of ALL remaining
layers from one normed hidden state (``norm_swiftkv`` +
``kv_proj_swiftkv``, reference ``llama_swiftkv.py:259-274``), which is
bulk-written into the paged cache (the reference needs a CUDA kernel for
this, ``csrc/custom_ops/kernels.cu``; here it is one batched scatter).
Only the to-be-sampled rows (``logits_indices``) then run the remaining
layers — the "token drop" early exit (reference
``llama_swiftkv.py:658-685``) that cuts prefill compute up to ~50%.

TPU-first simplifications vs the reference:
- Token drop is a static-shape gather (sample rows are already padded to
  a bucket), so no attention-metadata surgery (cf. the FlashInfer
  re-planning at reference ``llama_swiftkv.py:433-571``) — the host
  simply provides a second ragged-attention schedule over the surviving
  rows (``swift_*`` arrays).
- Later layers reuse the same ragged paged attention kernel in
  read-only mode (their KV is already in the cache).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from arcticinference_tpu.models import llama as llama_mod
from arcticinference_tpu.models.llama import (
    LlamaArch, _mlp, _qkv, _write_kv_layer, compute_logits as
    _compute_logits, make_attn_impl)
from arcticinference_tpu.ops.fp8 import (QuantizedLinear, fp8_quantize,
                                         matmul)
from arcticinference_tpu.ops.layers import (apply_rope, compute_rope_freqs,
                                            rms_norm)

# The runner uses these flags to adapt its step function.
RETURNS_SAMPLE_ROWS = True
NEEDS_SWIFT_SCHEDULE = True

compute_logits = _compute_logits
_QUANT_KEYS = llama_mod._QUANT_KEYS


def param_specs(pp: bool = False):
    """PartitionSpecs for the SwiftKV pytree (shard_map in_specs)."""
    from jax.sharding import PartitionSpec as P

    from arcticinference_tpu.parallel import mesh as mesh_lib

    if pp:
        raise NotImplementedError(
            "SwiftKV does not compose with pipeline parallelism yet")
    base = mesh_lib.param_specs()
    layers_b = {k: v for k, v in base["layers"].items()
                if k not in ("wk", "wv")}
    return {
        "embed": base["embed"],
        "final_norm": base["final_norm"],
        "lm_head": base["lm_head"],
        "layers_a": base["layers"],
        "layers_b": layers_b,
        "wk_swift": P(None, None, "tp"),
        "wv_swift": P(None, None, "tp"),
        "norm_swiftkv": P(None),
    }


@dataclass(frozen=True)
class LlamaSwiftKVArch(LlamaArch):
    num_key_value_layers: int = 0  # 0 -> num_layers (plain llama)

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "LlamaSwiftKVArch":
        base = LlamaArch.from_hf_config(cfg)
        kvl = cfg.get("num_key_value_layers") or base.num_layers
        return cls(**{**base.__dict__, "num_key_value_layers": kvl})

    @property
    def num_swift_layers(self) -> int:
        return self.num_layers - self.num_key_value_layers


Arch = LlamaSwiftKVArch


def init_params(arch: LlamaSwiftKVArch, rng: jax.Array,
                dtype=jnp.bfloat16,
                quantization: Optional[str] = None) -> dict:
    ka = arch.num_key_value_layers
    kb = arch.num_swift_layers
    d, hkv, dh = arch.hidden_size, arch.num_kv_heads, arch.head_dim
    base_a = llama_mod.init_params(
        LlamaArch(**{**{f.name: getattr(arch, f.name)
                        for f in LlamaArch.__dataclass_fields__.values()},
                     "num_layers": ka}),
        rng, dtype, quantization)
    params = {
        "embed": base_a.pop("embed"),
        "final_norm": base_a.pop("final_norm"),
        "layers_a": base_a["layers"],
    }
    if "lm_head" in base_a:
        params["lm_head"] = base_a["lm_head"]
    if kb > 0:
        rng_b, rng_kv = jax.random.split(jax.random.fold_in(rng, 7))
        base_b = llama_mod.init_params(
            LlamaArch(**{**{f.name: getattr(arch, f.name)
                            for f in
                            LlamaArch.__dataclass_fields__.values()},
                         "num_layers": kb}),
            rng_b, dtype, quantization)
        layers_b = base_b["layers"]
        layers_b.pop("wk")
        layers_b.pop("wv")
        params["layers_b"] = layers_b
        rk, rv = jax.random.split(rng_kv)
        wk = (jax.random.normal(rk, (kb, d, hkv * dh),
                                jnp.float32) * 0.02).astype(dtype)
        wv = (jax.random.normal(rv, (kb, d, hkv * dh),
                                jnp.float32) * 0.02).astype(dtype)
        if quantization:
            from arcticinference_tpu.ops.fp8 import weight_quantize
            wk = weight_quantize(wk, quantization)
            wv = weight_quantize(wv, quantization)
        params["wk_swift"] = wk
        params["wv_swift"] = wv
        params["norm_swiftkv"] = jnp.ones((d,), dtype)
    return params


def _stacked_proj(x, w):
    """x [T, D] @ stacked w [L2, D, E] -> [L2, T, E] (fp8-aware)."""
    if isinstance(w, QuantizedLinear):
        from arcticinference_tpu.ops.fp8 import fp8_dequantize
        w = fp8_dequantize(w, x.dtype)
    return jnp.einsum("td,lde->lte", x, w,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def _slice_swift_kv_proj(w, b_ctx):
    """Take this device's (tp, sp)-fused output slice of a stacked
    [L2, D, Hkv*Dh] projection (tp shard stored; sp sub-slice here).

    GQA replication (``num_kv_heads < sp*tp``): like the per-layer
    wk/wv shift slices (``parallel/ulysses.py``), the sp sub-slice is
    head-granular — fused shard (t, s) keeps the one whole head
    ``(s*g)//sp`` of its g-head tp shard, so the r shards sharing a
    head each project an identical replica."""
    if b_ctx.sp == 1:
        return w
    from arcticinference_tpu.parallel.ulysses import _local_slice

    s = jax.lax.axis_index("sp")
    if b_ctx.kv_rep > 1:
        g = b_ctx.num_kv_heads // b_ctx.tp    # heads per tp shard
        d = b_ctx.head_dim

        def slice_head(x):
            head = (s * g) // b_ctx.sp
            return jax.lax.dynamic_slice_in_dim(x, head * d, d, 2)

        if isinstance(w, QuantizedLinear):
            return QuantizedLinear(slice_head(w.weight), w.scale)
        return slice_head(w)
    if isinstance(w, QuantizedLinear):
        return QuantizedLinear(
            _local_slice(w.weight, 2, s, b_ctx.sp), w.scale)
    return _local_slice(w, 2, s, b_ctx.sp)


def forward(params: dict, arch: LlamaSwiftKVArch, kv: jax.Array,
            inputs: dict[str, jax.Array],
            attn_impl=None, pctx=None,
            unroll: bool = False) -> tuple[jax.Array, jax.Array]:
    """Returns (kv, hidden of the SAMPLE ROWS [S_pad, D]).

    Requires inputs["logits_indices"] (the surviving rows) and the
    ``swift_*`` attention schedule over those rows.

    Sharded execution mirrors the reference's layout choices
    (``llama_swiftkv.py:247-257, 295-320``): the first K layers run in
    the incoming mode (Ulysses SP or shift); the hidden states are then
    all-gathered over ``sp`` and the KV projection + remaining layers
    run in the fused full-TP (shift) layout — which is what keeps the
    projected pages bit-identical with the SP-mode cache.
    """
    if attn_impl is None:
        attn_impl = llama_mod._default_attn
    ka = arch.num_key_value_layers
    kb = arch.num_swift_layers
    arch_q = pctx.arch_view(arch) if pctx is not None else arch
    psum = pctx.psum if pctx is not None else (lambda x: x)
    rope_positions = inputs.get("positions_local", inputs["positions"])
    h = llama_mod.embed_lookup(params, inputs["input_ids"])
    inv_freq = compute_rope_freqs(arch.head_dim, arch.rope_theta,
                                  arch.rope_scaling)

    # ---- standard first-K layers -------------------------------------
    def layer_step(carry, xs):
        h, kv = carry
        lp, layer = xs
        if pctx is not None:
            lp = pctx.layer_params(lp)
        res = h
        x = rms_norm(h, lp["input_norm"], arch.rms_norm_eps)
        q, k, v = _qkv(x, lp, arch_q)
        q = apply_rope(q, rope_positions, inv_freq)
        k = apply_rope(k, rope_positions, inv_freq)
        if pctx is not None:
            q, k, v = pctx.dispatch(q, k, v)
        ks = inputs.get("kv_scale")
        kv = _write_kv_layer(kv, layer, k, v, inputs["slot_mapping"],
                             None if ks is None else ks[layer])
        o = llama_mod._attend(q, kv, layer, inputs, arch, attn_impl)
        if pctx is not None:
            o = pctx.combine(o)
        t = o.shape[0]
        h = res + psum(matmul(o.reshape(t, -1), lp["wo"]))
        res = h
        x = rms_norm(h, lp["post_norm"], arch.rms_norm_eps)
        h = res + psum(_mlp(x, lp))
        return (h, kv), None

    if unroll:
        for l in range(ka):
            lp = jax.tree.map(lambda a: a[l], params["layers_a"])
            (h, kv), _ = layer_step((h, kv), (lp, l))
    else:
        (h, kv), _ = jax.lax.scan(
            layer_step, (h, kv),
            (params["layers_a"], jnp.arange(ka)))

    # ---- switch to the full-TP (shift) layout for the second half ----
    b_ctx = None
    if pctx is not None:
        if pctx.mode == "sp" and pctx.sp > 1:
            # All-gather the sp-sharded hidden states (reference
            # llama_swiftkv.py:247-252).
            h = jax.lax.all_gather(h, "sp", axis=0, tiled=True)
        from arcticinference_tpu.parallel.ulysses import ParallelContext

        b_ctx = (pctx if pctx.mode == "shift"
                 else ParallelContext(pctx.cfg, "shift",
                                      num_kv_heads=pctx.num_kv_heads,
                                      head_dim=pctx.head_dim))

    if kb == 0:
        h = rms_norm(h, params["final_norm"], arch.rms_norm_eps)
        return kv, h[inputs["logits_indices"]]

    # ---- one-shot KV projection for the remaining layers -------------
    t = h.shape[0]
    arch_b = b_ctx.arch_view(arch) if b_ctx is not None else arch
    hkv, dh = arch_b.num_kv_heads, arch.head_dim
    x = rms_norm(h, params["norm_swiftkv"], arch.rms_norm_eps)
    wk_s, wv_s = params["wk_swift"], params["wv_swift"]
    if b_ctx is not None:
        wk_s, wv_s = (_slice_swift_kv_proj(w, b_ctx)
                      for w in (wk_s, wv_s))
    k_all = _stacked_proj(x, wk_s).reshape(kb, t, hkv, dh)
    v_all = _stacked_proj(x, wv_s)
    k_all = jax.vmap(
        lambda kl: apply_rope(kl, inputs["positions"], inv_freq))(k_all)
    k_all = k_all.reshape(kb, t, hkv * dh)
    # Each swift layer's projected K/V is scattered inside its own layer
    # step (before its attention): identical semantics to a single bulk
    # write but in place on the carried cache — a standalone all-layer
    # scatter transiently doubles the cache buffer and OOMs at 8B.

    # ---- token drop: only sample rows continue -----------------------
    rows = inputs["logits_indices"]
    hs = h[rows]
    swift_inputs = dict(inputs)
    swift_inputs["positions"] = inputs["positions"][rows]
    swift_inputs["req_idx"] = inputs["req_idx"][rows]
    # The swift_* schedule replaces the attn_* one for the smaller batch.
    for key in ("item_req", "item_qstart", "item_qlen", "item_pages",
                "item_pos_base", "token_item", "token_off"):
        sk = f"swift_{key}"
        if sk in inputs:
            swift_inputs[f"attn_{key}"] = inputs[sk]

    b_psum = b_ctx.psum if b_ctx is not None else (lambda x: x)

    def swift_layer_step(carry, xs):
        h, kv = carry
        lp, layer, k_l, v_l = xs
        ks = inputs.get("kv_scale")
        kv = _write_kv_layer(kv, layer, k_l, v_l,
                             inputs["slot_mapping"],
                             None if ks is None else ks[layer])
        if b_ctx is not None:
            lp = b_ctx.layer_params(lp)
        res = h
        x = rms_norm(h, lp["input_norm"], arch.rms_norm_eps)
        s = x.shape[0]
        q = matmul(x, lp["wq"]).reshape(s, arch_b.num_heads,
                                        arch.head_dim)
        q = apply_rope(q, swift_inputs["positions"], inv_freq)
        o = llama_mod._attend(q, kv, layer, swift_inputs, arch, attn_impl)
        h = res + b_psum(matmul(o.reshape(s, -1), lp["wo"]))
        res = h
        x = rms_norm(h, lp["post_norm"], arch.rms_norm_eps)
        h = res + b_psum(_mlp(x, lp))
        return (h, kv), None

    if unroll:
        for l in range(kb):
            lp = jax.tree.map(lambda a: a[l], params["layers_b"])
            (hs, kv), _ = swift_layer_step(
                (hs, kv), (lp, ka + l, k_all[l], v_all[l]))
    else:
        (hs, kv), _ = jax.lax.scan(
            swift_layer_step, (hs, kv),
            (params["layers_b"], ka + jnp.arange(kb), k_all, v_all))
    hs = rms_norm(hs, params["final_norm"], arch.rms_norm_eps)
    return kv, hs


def quantize_params(params: dict, mode: str = "fp8") -> dict:
    from arcticinference_tpu.ops.fp8 import weight_quantize

    out = dict(params)
    for key in ("layers_a", "layers_b"):
        if key not in out:
            continue
        layers = dict(out[key])
        for k in llama_mod._QUANT_KEYS:
            if k in layers and not isinstance(layers[k], QuantizedLinear):
                layers[k] = weight_quantize(layers[k], mode)
        out[key] = layers
    for key in ("wk_swift", "wv_swift"):
        if key in out and not isinstance(out[key], QuantizedLinear):
            out[key] = weight_quantize(out[key], mode)
    return out


# ---------------------------------------------------------------------- #
# HF checkpoint mapping (Snowflake/Llama-3.1-SwiftKV-* checkpoints)
# ---------------------------------------------------------------------- #

def load_hf_state(arch: LlamaSwiftKVArch, tensors: dict[str, np.ndarray],
                  dtype=jnp.bfloat16,
                  quantization: Optional[str] = None) -> dict:
    ka = arch.num_key_value_layers
    kb = arch.num_swift_layers
    hkv, dh, d = arch.num_kv_heads, arch.head_dim, arch.hidden_size

    # First-K layers load exactly like plain llama.
    sub_a = {}
    passthrough = {}
    wkv_stack = [None] * kb
    b_stacks: dict[str, list] = {
        k: [None] * kb for k in ("wq", "wo", "w_gate", "w_up", "w_down",
                                 "input_norm", "post_norm")}
    name_map_b = {
        "self_attn.q_proj_swiftkv.weight": ("wq", True),
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.o_proj.weight": ("wo", True),
        "mlp.gate_proj.weight": ("w_gate", True),
        "mlp.up_proj.weight": ("w_up", True),
        "mlp.down_proj.weight": ("w_down", True),
        "input_layernorm.weight": ("input_norm", False),
        "post_attention_layernorm.weight": ("post_norm", False),
    }
    for name, arr in tensors.items():
        if name == "model.norm_swiftkv.weight":
            passthrough["norm_swiftkv"] = jnp.asarray(arr, dtype)
            continue
        if name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx_s, _, leaf = rest.partition(".")
            l = int(idx_s)
            if l >= ka:
                i = l - ka
                if leaf == "self_attn.kv_proj_swiftkv.weight":
                    # Fused [2*Hkv*Dh, D] checkpoint tensor -> split halves
                    # (K rows first, then V, matching the reference's
                    # QKV-parallel packing with 0 q heads).
                    a = np.asarray(arr)
                    wkv_stack[i] = (a[:hkv * dh].T, a[hkv * dh:].T)
                    continue
                if leaf in name_map_b:
                    key, transpose = name_map_b[leaf]
                    b_stacks[key][i] = (np.asarray(arr).T if transpose
                                        else np.asarray(arr))
                    continue
                continue
        sub_a[name] = arr

    arch_a = LlamaArch(**{**{f.name: getattr(arch, f.name)
                             for f in
                             LlamaArch.__dataclass_fields__.values()},
                          "num_layers": ka})
    base = llama_mod.load_hf_state(arch_a, sub_a, dtype, quantization)
    params = {
        "embed": base["embed"],
        "final_norm": base["final_norm"],
        "layers_a": base["layers"],
    }
    if "lm_head" in base:
        params["lm_head"] = base["lm_head"]
    if kb > 0:
        layers_b = {}
        for key, stack in b_stacks.items():
            missing = [i for i, s in enumerate(stack) if s is None]
            if missing:
                raise ValueError(f"missing swift layers {missing} "
                                 f"for {key}")
            layers_b[key] = jnp.stack(
                [jnp.asarray(s, dtype) for s in stack])
        params["layers_b"] = layers_b
        params["wk_swift"] = jnp.stack(
            [jnp.asarray(s[0], dtype) for s in wkv_stack])
        params["wv_swift"] = jnp.stack(
            [jnp.asarray(s[1], dtype) for s in wkv_stack])
        params["norm_swiftkv"] = passthrough["norm_swiftkv"]
    if quantization:
        params = quantize_params(params, quantization)
    return params
