"""Llama family as pure functions over a parameter pytree.

TPU-first design notes (vs the reference's torch module tree inherited from
vLLM):

- Layer parameters are *stacked* along a leading layer axis and the forward
  pass is one ``lax.scan`` — one compiled layer body regardless of depth,
  fast XLA compiles, and clean weight sharding with a single PartitionSpec
  per parameter kind.
- The fused paged KV cache (``[L, N_blk, 2, Bs, Hkv*D]``, see
  ``ops/kv_cache.py``) rides the scan carry and is updated with scatters at
  ``[layer, slots]`` only — no per-layer cache copies; with buffer donation
  the update is in place.
- Attention is the ragged paged op from ``ops/attention.py`` (Pallas on
  TPU).  Everything else (RMSNorm, RoPE, SwiGLU) is jnp that XLA fuses.

Weight-only FP8 (``quantization="fp8"``) stores each matmul weight as
float8_e4m3 plus a per-tensor scale; dequant happens inside the matmul
(see ``ops/fp8.py``), mirroring the reference's compressed-tensors FP8
checkpoints (reference ``vllm/spec_dec/fp8.py``).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from arcticinference_tpu.ops.attention import (
    ragged_paged_attention_reference)
from arcticinference_tpu.ops.fp8 import (QuantizedLinear, fp8_quantize,
                                         matmul, weight_quantize)
from arcticinference_tpu.ops.layers import (apply_rope, compute_rope_freqs,
                                            rms_norm)


@dataclass(frozen=True)
class LlamaArch:  # registry alias: Arch (see bottom of module)
    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_layers: int = 4
    num_heads: int = 16
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    rope_scaling: Optional[dict] = None
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    max_position: int = 131072
    eos_token_id: Optional[int] = None
    # Family variants sharing the Llama decoder body:
    attention_bias: bool = False   # Qwen2/2.5: biases on q/k/v projections
    qk_norm: bool = False          # Qwen3: per-head RMSNorm on q and k
    # Number of interleaved [q|k|v] / [gate|up] segment groups in the
    # LOCAL fused wqkv / w_gateup column layout (fuse_params interleave:
    # an sp-enabled mesh stores tp*sp global segments, so the SP-mode tp
    # shard sees sp groups; shift re-slices down to 1).  1 = plain
    # [q|k|v] order (single chip / unfused).
    fused_seg: int = 1

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "LlamaArch":
        num_heads = cfg.get("num_attention_heads", 16)
        hidden = cfg.get("hidden_size", 2048)
        rope_scaling = cfg.get("rope_scaling")
        if rope_scaling is not None:
            rope_scaling = dict(rope_scaling)
            # HF historically uses "type" or "rope_type".
            rope_scaling.setdefault(
                "rope_type", rope_scaling.get("type", "default"))
        return cls(
            vocab_size=cfg.get("vocab_size", 32000),
            hidden_size=hidden,
            intermediate_size=cfg.get("intermediate_size", 4 * hidden),
            num_layers=cfg.get("num_hidden_layers", 4),
            num_heads=num_heads,
            num_kv_heads=cfg.get("num_key_value_heads", num_heads),
            head_dim=cfg.get("head_dim") or hidden // num_heads,
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=rope_scaling,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            max_position=cfg.get("max_position_embeddings", 131072),
            eos_token_id=_first_eos(cfg.get("eos_token_id")),
            attention_bias=cfg.get("attention_bias", False),
            qk_norm=cfg.get("qk_norm", False),
        )


def _first_eos(eos):
    if isinstance(eos, (list, tuple)):
        return eos[0] if eos else None
    return eos


def init_params(arch: LlamaArch, rng: jax.Array,
                dtype: jnp.dtype = jnp.bfloat16,
                quantization: Optional[str] = None) -> dict:
    """Randomly initialised parameter pytree (benchmarks / tests).

    FP8 leaves are quantized one at a time under jit so the full bf16
    model never materialises (an 8B model must stay under one chip's HBM
    during init).
    """
    keys = iter(jax.random.split(rng, 16))
    d, hq, hkv, dh = (arch.hidden_size, arch.num_heads, arch.num_kv_heads,
                      arch.head_dim)
    li, lL = arch.intermediate_size, arch.num_layers
    quant = quantization is not None

    def w(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(
            dtype)

    @functools.partial(jax.jit, static_argnames=("shape",))
    def qw_jit(key, shape):
        x = jax.random.normal(key, shape, jnp.bfloat16) * 0.02
        return weight_quantize(x, quantization)

    def qw(key, shape):
        return qw_jit(key, shape) if quant else w(key, shape)

    @functools.partial(jax.jit, static_argnames=("shape",))
    def embed_q_jit(key, shape):
        # The embedding table is always fp8 when quantized (row-gather
        # dequant needs a scalar scale); int modes cover matmul weights.
        x = jax.random.normal(key, shape, jnp.bfloat16) * 0.02
        return fp8_quantize(x)

    params = {
        "embed": (embed_q_jit(next(keys), (arch.vocab_size, d))
                  if quant and not arch.tie_word_embeddings
                  else w(next(keys), (arch.vocab_size, d))),
        "layers": {
            "input_norm": jnp.ones((lL, d), dtype),
            "post_norm": jnp.ones((lL, d), dtype),
            "wq": qw(next(keys), (lL, d, hq * dh)),
            "wk": qw(next(keys), (lL, d, hkv * dh)),
            "wv": qw(next(keys), (lL, d, hkv * dh)),
            "wo": qw(next(keys), (lL, hq * dh, d)),
            "w_gate": qw(next(keys), (lL, d, li)),
            "w_up": qw(next(keys), (lL, d, li)),
            "w_down": qw(next(keys), (lL, li, d)),
        },
        "final_norm": jnp.ones((d,), dtype),
    }
    if arch.attention_bias:
        params["layers"]["bq"] = w(next(keys), (lL, hq * dh))
        params["layers"]["bk"] = w(next(keys), (lL, hkv * dh))
        params["layers"]["bv"] = w(next(keys), (lL, hkv * dh))
    if arch.qk_norm:
        params["layers"]["q_norm"] = jnp.ones((lL, dh), dtype)
        params["layers"]["k_norm"] = jnp.ones((lL, dh), dtype)
    if not arch.tie_word_embeddings:
        head = w(next(keys), (d, arch.vocab_size))
        params["lm_head"] = (weight_quantize(head, quantization)
                             if quant else head)
    return params


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
               "wqkv", "w_gateup")


def quantize_params(params: dict, mode: str = "fp8") -> dict:
    """Convert the large matmul weights to weight-only fp8/int8/int4.

    Norms stay bf16; the LM head AND the input embedding quantize too
    (the reference's ``Fp8ConfigWithEmbedding`` quantizes
    VocabParallelEmbedding/ParallelLMHead the same way,
    ``vllm/spec_dec/fp8.py:310-337`` — at 128k vocab each table is
    ~0.5 GB of HBM in fp8 vs ~1 GB in bf16).  Tied-embedding models keep
    the table in bf16 (the tied logits matmul reads it transposed).
    """
    out = dict(params)
    layers = dict(params["layers"])
    for k in _QUANT_KEYS:
        if k in layers:
            layers[k] = weight_quantize(layers[k], mode)
    out["layers"] = layers
    if "lm_head" in out and not isinstance(out["lm_head"], QuantizedLinear):
        out["lm_head"] = weight_quantize(out["lm_head"], mode)
    if "lm_head" in out and not isinstance(out["embed"], QuantizedLinear):
        out["embed"] = fp8_quantize(out["embed"])
    return out


def embed_lookup(params: dict, ids: jax.Array) -> jax.Array:
    """Input-embedding gather; dequantizes fp8 tables row-wise (XLA fuses
    the convert+scale into the gather consumer)."""
    e = params["embed"]
    if isinstance(e, QuantizedLinear):
        rows = e.weight[ids].astype(jnp.float32) * e.scale
        return rows.astype(params["final_norm"].dtype)
    return e[ids]


def fuse_params(params: dict, unfuse: bool = False,
                interleave: int = 1) -> dict:
    """Fuse q|k|v -> ``wqkv`` and gate|up -> ``w_gateup`` (one dot each).

    Batched decode on v5e is weight-stream-bound with a fixed per-dot
    cost, so three small attention dots waste device time the fused
    [d, nq+2*nkv] dot does not (``benchmarks/stream_microbench.py``).
    Per-segment quantization scales are preserved exactly (broadcast to
    per-out-channel, applied in the dot epilogue — see
    ``ops/fp8.fuse_quantized``).

    ``interleave=W`` fuses PER-SHARD segments (column order
    ``[q_0|k_0|v_0|q_1|k_1|v_1|..]`` over W fused shards) so the
    concatenated order survives a contiguous W-way split of the out
    axis: the runner passes W = tp * (sp if shift else 1) and the fused
    weights shard over "tp" / re-slice under shift like the unfused
    ones (round-4 verdict item 6; see ``ops/fp8.fuse_quantized`` for
    why no other weight needs reordering).  ``unfuse`` is for
    checkpoint save paths that want the HF layout back.
    """
    from arcticinference_tpu.ops.fp8 import fuse_quantized

    if unfuse:
        raise NotImplementedError("save paths keep unfused params")

    def bias_fuse(parts):
        if interleave == 1:
            return jnp.concatenate(parts, axis=-1)
        segs = []
        for f in range(interleave):
            for p in parts:
                nf = p.shape[-1] // interleave
                segs.append(p[..., f * nf:(f + 1) * nf])
        return jnp.concatenate(segs, axis=-1)

    layers = dict(params["layers"])
    if "wq" in layers:
        layers["wqkv"] = fuse_quantized(
            [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")],
            interleave=interleave)
        if "bq" in layers:
            layers["bqkv"] = bias_fuse(
                [layers.pop("bq"), layers.pop("bk"), layers.pop("bv")])
    if "w_gate" in layers:
        layers["w_gateup"] = fuse_quantized(
            [layers.pop("w_gate"), layers.pop("w_up")],
            interleave=interleave)
    out = dict(params)
    out["layers"] = layers
    return out


def _qkv(h, lp, arch):
    if "wqkv" in lp:
        y = matmul(h, lp["wqkv"])
        if "bqkv" in lp:
            y = y + lp["bqkv"].astype(y.dtype)
        nq = arch.num_heads * arch.head_dim
        nkv = arch.num_kv_heads * arch.head_dim
        g = arch.fused_seg
        if g > 1:
            # Local shard holds g interleaved [q_f|k_f|v_f] groups (the
            # SP-mode tp shard of shift-enabled fused weights); group-
            # major re-concat restores contiguous global head order.
            t = h.shape[0]
            y3 = y.reshape(t, g, (nq + 2 * nkv) // g)
            q = y3[:, :, :nq // g].reshape(t, nq)
            k = y3[:, :, nq // g:(nq + nkv) // g].reshape(t, nkv)
            v = y3[:, :, (nq + nkv) // g:].reshape(t, nkv)
        else:
            q = y[:, :nq]
            k = y[:, nq:nq + nkv]
            v = y[:, nq + nkv:]
    else:
        q = matmul(h, lp["wq"])
        k = matmul(h, lp["wk"])
        v = matmul(h, lp["wv"])
        if "bq" in lp:  # Qwen2-style bias (sliced like the weights)
            q = q + lp["bq"].astype(q.dtype)
            k = k + lp["bk"].astype(k.dtype)
            v = v + lp["bv"].astype(v.dtype)
    t = h.shape[0]
    q = q.reshape(t, arch.num_heads, arch.head_dim)
    k = k.reshape(t, arch.num_kv_heads, arch.head_dim)
    v = v.reshape(t, arch.num_kv_heads, arch.head_dim)
    if "q_norm" in lp:  # Qwen3-style per-head RMSNorm before RoPE
        q = rms_norm(q, lp["q_norm"], arch.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], arch.rms_norm_eps)
    return q, k, v


def _write_kv_layer(kv, layer, k, v, slot_mapping, kv_scale=None):
    """Scatter new tokens' K/V into the stacked cache at one layer.

    Cache layout [L, N_blk, 2, Bs, Hkv*D]: each token's K (all heads) is
    one contiguous row write.  ``kv_scale`` (this layer's [k, v] dequant
    scales) divides values before the fp8 cast so the attention read's
    ``*scale`` dequant round-trips (reference: vLLM per-layer
    k_scale/v_scale, bulk-write kernel ``csrc/custom_ops/kernels.cu``).
    """
    bs = kv.shape[3]
    t = k.shape[0]
    slots = jnp.where(slot_mapping < 0, 0, slot_mapping)
    blk = slots // bs
    off = slots % bs
    if kv_scale is not None and kv.dtype == jnp.float8_e4m3fn:
        k = k.astype(jnp.float32) / kv_scale[0]
        v = v.astype(jnp.float32) / kv_scale[1]
    # ONE scatter for K and V (profiled: each scatter pays ~12 us fixed
    # cost on v5e at decode row counts — 2 per layer was ~4% of the
    # decode step; the k/v axis rides the scatter index instead).
    rows = jnp.concatenate([k.reshape(t, -1), v.reshape(t, -1)],
                           axis=0).astype(kv.dtype)
    blk2 = jnp.concatenate([blk, blk])
    sel = jnp.concatenate([jnp.zeros((t,), jnp.int32),
                           jnp.ones((t,), jnp.int32)])
    off2 = jnp.concatenate([off, off])
    return kv.at[layer, blk2, sel, off2, :].set(rows)


def _attend(q, kv, layer, inputs, arch, attn_impl, knew=None, vnew=None):
    """Run ragged paged attention against one layer of the stacked cache.

    The Pallas path receives the whole stacked cache plus the layer index
    (its page DMAs index ``[layer, page]`` directly — no per-layer slice
    copy); the jnp reference path takes a materialized layer view.

    ``knew``/``vnew`` (cache-dtype rows) are the deferred-write path:
    the grouped decode kernel injects them into the softmax instead of
    reading them back from the cache (see ``scan_layers``).
    """
    if knew is not None:
        return attn_impl(q, kv, layer, inputs, knew=knew, vnew=vnew)
    return attn_impl(q, kv, layer, inputs)


def _quantize_kv_rows(k, v, dtype, kv_scale=None):
    """New K/V rows in CACHE dtype ([t, Hkv*D]) — the exact bytes the
    scatter would store, so the injection path is numerics-identical."""
    t = k.shape[0]
    if kv_scale is not None and dtype == jnp.float8_e4m3fn:
        k = k.astype(jnp.float32) / kv_scale[0]
        v = v.astype(jnp.float32) / kv_scale[1]
    return (k.reshape(t, -1).astype(dtype), v.reshape(t, -1).astype(dtype))


def _bulk_write_kv(kv, k_rows, v_rows, slot_mapping):
    """ONE whole-model scatter for the step's deferred K/V rows
    ([L, t, Hkv*D] each; indices shared across the layer axis).

    Profiled on v5e: an XLA scatter pays ~10 us fixed + ~0.07 us/row —
    32 per-layer scatters cost ~0.65 ms/step at batch 64 while this
    single op is ~0.3 ms, and the attention kernel injection keeps the
    rows visible to the step itself (ops/pallas/ragged_attention.py).
    """
    num_layers, nblk, _, bs, kvd = kv.shape
    t = k_rows.shape[1]
    slots = jnp.where(slot_mapping < 0, 0, slot_mapping)
    blk = slots // bs
    off = slots % bs
    rows = jnp.concatenate([k_rows, v_rows], axis=1)      # [L, 2t, kvd]
    blk2 = jnp.concatenate([blk, blk])
    sel = jnp.concatenate([jnp.zeros((t,), jnp.int32),
                           jnp.ones((t,), jnp.int32)])
    off2 = jnp.concatenate([off, off])
    # Flat row indices over a [L*nblk, ...] view: a leading full-slice
    # batch axis (kv.at[:, blk2, ...]) makes XLA materialise two full
    # cache copies around the scatter; the flat form scatters in place.
    lidx = jnp.arange(num_layers, dtype=jnp.int32)[:, None]
    blkL = (lidx * nblk + blk2[None, :]).reshape(-1)      # [L*2t]
    selL = jnp.tile(sel, num_layers)
    offL = jnp.tile(off2, num_layers)
    flat = kv.reshape(num_layers * nblk, 2, bs, kvd)
    flat = flat.at[blkL, selL, offL, :].set(
        rows.reshape(num_layers * 2 * t, kvd).astype(kv.dtype))
    return flat.reshape(kv.shape)


def _defer_kv_writes(attn_impl, pctx, arch=None) -> bool:
    """Opt-in (ARCTIC_TPU_DEFERRED_KV=1): grouped-kernel softmax
    injection + one whole-model scatter instead of per-layer scatters.
    Kept non-default on v5e — the injection pass costs more than the
    bulk scatter saves (see envs.py)."""
    from arcticinference_tpu import envs

    if pctx is not None or attn_impl is None:
        return False
    if not getattr(attn_impl, "is_grouped_decode", False):
        return False
    if not envs.ARCTIC_TPU_DEFERRED_KV:
        return False
    if arch is not None and arch.head_dim % 128 != 0:
        return False   # mirrors _attn's d_ok gate (jnp fallback path)
    interpret = (envs.ARCTIC_TPU_FORCE_PALLAS_INTERPRET
                 and jax.default_backend() != "tpu")
    return (not envs.ARCTIC_TPU_DISABLE_PALLAS
            and (jax.default_backend() == "tpu" or interpret))


def forward(params: dict, arch: LlamaArch, kv: jax.Array,
            inputs: dict[str, jax.Array],
            attn_impl=None, pctx=None,
            unroll: bool = False) -> tuple[jax.Array, jax.Array]:
    """Run the decoder stack over a flat ragged token batch.

    inputs: input_ids [T], positions [T], req_idx [T], slot_mapping [T],
    block_tables [B, MaxBlk], seq_lens [B].
    Returns (kv, hidden[T, D]).

    ``pctx`` (parallel/ulysses.py:ParallelContext) injects the SPMD hooks
    when running under shard_map: per-mode weight slicing, the Ulysses
    token<->head all-to-all around attention, and TP psum reductions.
    Single-chip execution passes pctx=None and every hook is identity.

    ``unroll=True`` replaces the layer ``lax.scan`` with a Python loop:
    static layer indices let XLA consume each stacked weight slice in
    place instead of materialising a per-iteration copy (a scan slices
    ~param_bytes of weights per step — ~20 ms/step for an 8B model).
    The engine unrolls on TPU; tests keep the scan for compile speed.
    """
    if attn_impl is None:
        attn_impl = _default_attn
    h = embed_lookup(params, inputs["input_ids"])
    kv, h = scan_layers(params["layers"], arch, kv, h, inputs,
                        attn_impl=attn_impl, pctx=pctx, unroll=unroll)
    h = rms_norm(h, params["final_norm"], arch.rms_norm_eps)
    return kv, h


def scan_layers(layers: dict, arch: LlamaArch, kv: jax.Array,
                h: jax.Array, inputs: dict, attn_impl=None, pctx=None,
                unroll: bool = False,
                mlp_fn=None) -> tuple[jax.Array, jax.Array]:
    """Run a (sub)stack of decoder layers over hidden states ``h``.

    ``layers`` is stacked params whose leading axis is the number of
    layers to run; ``kv``'s leading axis must match (under pipeline
    parallelism each stage passes its LOCAL layer shard and kv shard —
    layer indices are local).

    ``mlp_fn(x, lp, arch, pctx) -> y`` replaces the dense SwiGLU block
    (MoE models inject their expert-routed MLP here); its result is
    psum-reduced by the caller's parallel context like the dense path.
    """
    if attn_impl is None:
        attn_impl = _default_attn
    if mlp_fn is None:
        mlp_fn = _dense_mlp_fn
    num_layers = jax.tree.leaves(layers)[0].shape[0]
    arch_q = pctx.arch_view(arch) if pctx is not None else arch
    psum = pctx.psum if pctx is not None else (lambda x: x)
    # Positions of the locally-held tokens (sp-sharded under Ulysses).
    rope_positions = inputs.get("positions_local", inputs["positions"])
    inv_freq = compute_rope_freqs(arch.head_dim, arch.rope_theta,
                                  arch.rope_scaling)

    defer = _defer_kv_writes(attn_impl, pctx, arch)

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
        if defer:
            # Deferred-write decode path: the grouped kernel injects
            # this layer's new rows; ONE whole-model scatter lands them
            # in the cache after the stack (_bulk_write_kv).
            kq, vq = _quantize_kv_rows(
                k, v, kv.dtype, None if ks is None else ks[layer])
            o = _attend(q, kv, layer, inputs, arch, attn_impl,
                        knew=kq, vnew=vq)
            ys = (kq, vq)
        else:
            kv = _write_kv_layer(kv, layer, k, v, inputs["slot_mapping"],
                                 None if ks is None else ks[layer])
            o = _attend(q, kv, layer, inputs, arch, attn_impl)
            ys = None
        if pctx is not None:
            o = pctx.combine(o)
        t = o.shape[0]
        h = res + psum(matmul(o.reshape(t, -1), lp["wo"]))
        res = h
        x = rms_norm(h, lp["post_norm"], arch.rms_norm_eps)
        h = res + psum(mlp_fn(x, lp, arch, pctx))
        return (h, kv), ys

    if unroll:
        all_ys = []
        for l in range(num_layers):
            lp = jax.tree.map(lambda a: a[l], layers)
            (h, kv), ys = layer_step((h, kv), (lp, l))
            all_ys.append(ys)
        ys = (jax.tree.map(lambda *a: jnp.stack(a), *all_ys)
              if defer else None)
    else:
        (h, kv), ys = jax.lax.scan(
            layer_step, (h, kv),
            (layers, jnp.arange(num_layers)))
    if defer:
        kv = _bulk_write_kv(kv, ys[0], ys[1], inputs["slot_mapping"])
    return kv, h


def finalize_hidden(params: dict, arch: LlamaArch,
                    h: jax.Array) -> jax.Array:
    """Final norm applied after the last decoder layer (split out so the
    pipeline-parallel program can run it on the last stage only)."""
    return rms_norm(h, params["final_norm"], arch.rms_norm_eps)


def _mlp(x, lp, groups: int = 1):
    if "w_gateup" in lp:
        y = matmul(x, lp["w_gateup"])
        li = y.shape[-1] // 2
        if groups > 1:
            # g interleaved [gate_f|up_f] groups (see _qkv): group-major
            # re-concat restores contiguous column order, matching
            # w_down's (unpermuted) in-axis rows.
            t = y.shape[0]
            y3 = y.reshape(t, groups, 2 * li // groups)
            g = y3[:, :, :li // groups].reshape(t, li)
            u = y3[:, :, li // groups:].reshape(t, li)
        else:
            g, u = y[:, :li], y[:, li:]
    else:
        g = matmul(x, lp["w_gate"])
        u = matmul(x, lp["w_up"])
    h = (jax.nn.silu(g.astype(jnp.float32)) *
         u.astype(jnp.float32)).astype(x.dtype)
    return matmul(h, lp["w_down"])


def _dense_mlp_fn(x, lp, arch, pctx):
    return _mlp(x, lp, groups=(pctx.arch_view(arch).fused_seg
                               if pctx is not None else arch.fused_seg))


def make_attn_impl(attn_qb: int = 32, decode_qlen: int = 1):
    """Build the attention dispatcher; ``attn_qb`` is the static query-block
    size used by the Pallas schedule (wide for prefill, narrow for decode;
    ``attn_qb == 1`` marks a uniform-decode step — every request
    contributes exactly ``decode_qlen`` frontier rows in request-major
    order — which routes to the grouped decode kernel: gsz sequences per
    program, amortizing the per-program fixed cost the work-item kernel
    pays at short contexts).  ``decode_qlen > 1`` is the fused
    speculative-verify shape (K+1 rows per request)."""

    def _attn(q, kv, layer, inputs, knew=None, vnew=None):
        from arcticinference_tpu import envs

        interpret = (envs.ARCTIC_TPU_FORCE_PALLAS_INTERPRET
                     and jax.default_backend() != "tpu")
        # Mosaic DMAs/lane-slices need the head dim on the 128-lane
        # tile boundary; small-model shapes (tiny checkpoints, d=32/64)
        # run the jnp reference instead (correct everywhere, and such
        # models are not bandwidth-bound anyway).
        d_ok = q.shape[-1] % 128 == 0 or interpret
        pallas_ok = (d_ok and not envs.ARCTIC_TPU_DISABLE_PALLAS
                     and (jax.default_backend() == "tpu" or interpret))
        if attn_qb == 1 and pallas_ok:
            from jax.experimental.pallas import tpu as pltpu

            from arcticinference_tpu.ops.pallas.ragged_attention import (
                grouped_decode_attention_kernel)

            t = q.shape[0]
            b = inputs["block_tables"].shape[0]
            ql = decode_qlen
            # Uniform decode: rows [r*ql, (r+1)*ql) belong to request r.
            # The padded token bucket may be wider or narrower than the
            # request-slot axis; surplus rows on either side are padding
            # (req_idx -1 / seq_lens 0).
            def fit(a, fill=0):
                if t > b * ql:
                    return a[:b * ql]
                if t < b * ql:
                    pad = [(0, b * ql - t)] + [(0, 0)] * (a.ndim - 1)
                    return jnp.pad(a, pad, constant_values=fill)
                return a

            qd = fit(q)
            seq_lens = inputs["seq_lens"]
            inj = {}
            if knew is not None:
                # Deferred-write injection: new rows ride as operands;
                # their cache slots are not yet written.
                inj = dict(knew=fit(knew), vnew=fit(vnew),
                           slot_mapping=fit(inputs["slot_mapping"],
                                            fill=-1))

            def run():
                out = grouped_decode_attention_kernel(
                    qd, kv, jnp.maximum(seq_lens - ql, 0),
                    inputs["block_tables"], seq_lens, qlen=ql,
                    kv_scale=inputs.get("kv_scale"), layer=layer, **inj)
                if t > b * ql:
                    out = jnp.pad(out, ((0, t - b * ql), (0, 0), (0, 0)))
                return out[:t]

            if interpret:
                with pltpu.force_tpu_interpret_mode():
                    return run()
            return run()
        assert knew is None, (
            "deferred KV rows require the grouped decode path "
            "(_defer_kv_writes mirrors this gate)")
        if "attn_item_req" in inputs and pallas_ok:
            from arcticinference_tpu.ops.pallas.ragged_attention import (
                ragged_paged_attention_kernel)
            schedule = (inputs["attn_item_req"], inputs["attn_item_qstart"],
                        inputs["attn_item_qlen"], inputs["attn_item_pages"],
                        inputs["attn_item_pos_base"],
                        inputs["attn_token_item"], inputs["attn_token_off"])
            if "attn_item_tree_start" in inputs:
                schedule = schedule + (inputs["attn_item_tree_start"],
                                       inputs["attn_item_tree_mask"])

            def run():
                return ragged_paged_attention_kernel(
                    q, kv, inputs["positions"], inputs["req_idx"],
                    inputs["block_tables"], inputs["seq_lens"],
                    qb=attn_qb, schedule=schedule,
                    kv_scale=inputs.get("kv_scale"), layer=layer)

            if interpret:
                from jax.experimental import pallas as pl  # noqa: F401
                from jax.experimental.pallas import tpu as pltpu

                with pltpu.force_tpu_interpret_mode():
                    return run()
            return run()
        kv_layer = jax.lax.dynamic_index_in_dim(kv, layer, 0,
                                                keepdims=False)
        ks = inputs.get("kv_scale")
        if ks is None or kv.dtype != jnp.float8_e4m3fn:
            row = None
        else:
            row = ks[layer]
        return ragged_paged_attention_reference(
            q, kv_layer, inputs["positions"], inputs["req_idx"],
            inputs["block_tables"], inputs["seq_lens"], kv_scale=row,
            tree_start=inputs.get("attn_tree_start"),
            row_tree_mask=inputs.get("attn_row_tree_mask"))

    _attn.is_grouped_decode = attn_qb == 1
    return _attn


_default_attn = make_attn_impl()


def compute_logits(params: dict, hidden_rows: jax.Array) -> jax.Array:
    """LM head over selected hidden rows; fp32 logits."""
    head = params.get("lm_head")
    if head is None:
        return jnp.dot(hidden_rows, params["embed"].T,
                       preferred_element_type=jnp.float32)
    return matmul(hidden_rows, head, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# HF checkpoint mapping
# ---------------------------------------------------------------------------

# name templates in HF Llama checkpoints -> (our key, transpose?)
_LAYER_MAP = {
    "self_attn.q_proj.weight": ("wq", True),
    "self_attn.k_proj.weight": ("wk", True),
    "self_attn.v_proj.weight": ("wv", True),
    "self_attn.o_proj.weight": ("wo", True),
    "mlp.gate_proj.weight": ("w_gate", True),
    "mlp.up_proj.weight": ("w_up", True),
    "mlp.down_proj.weight": ("w_down", True),
    "input_layernorm.weight": ("input_norm", False),
    "post_attention_layernorm.weight": ("post_norm", False),
    # Family variants (absent in plain Llama checkpoints):
    "self_attn.q_proj.bias": ("bq", False),       # Qwen2/2.5
    "self_attn.k_proj.bias": ("bk", False),
    "self_attn.v_proj.bias": ("bv", False),
    "self_attn.q_norm.weight": ("q_norm", False),  # Qwen3
    "self_attn.k_norm.weight": ("k_norm", False),
}

_OPTIONAL_LAYER_KEYS = ("bq", "bk", "bv", "q_norm", "k_norm")


def load_hf_state(arch: LlamaArch, tensors: dict[str, np.ndarray],
                  dtype: jnp.dtype = jnp.bfloat16,
                  quantization: Optional[str] = None) -> dict:
    """Assemble the parameter pytree from a flat HF state dict.

    ``tensors`` maps HF names to numpy arrays (from safetensors).  FP8
    checkpoints with ``.weight_scale`` entries are folded into
    QuantizedLinear leaves when ``quantization == "fp8"``.
    """
    lL = arch.num_layers
    layer_stacks: dict[str, list] = {k: [None] * lL
                                     for k, _ in _LAYER_MAP.values()}
    scales: dict[str, list] = {k: [None] * lL
                               for k, _ in _LAYER_MAP.values()}
    # Optional per-layer fp8-KV dequant scales (vLLM k_scale/v_scale).
    kv_scales = np.ones((lL, 2), np.float32)
    have_kv_scales = False
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
            if leaf in ("self_attn.k_scale", "self_attn.v_scale",
                        "self_attn.attn.k_scale", "self_attn.attn.v_scale"):
                col = 0 if leaf.endswith("k_scale") else 1
                kv_scales[l, col] = float(np.asarray(arr).reshape(()))
                have_kv_scales = True
                continue
            is_scale = leaf.endswith(".weight_scale")
            base = leaf.replace(".weight_scale", ".weight")
            if base not in _LAYER_MAP:
                continue
            key, transpose = _LAYER_MAP[base]
            if is_scale:
                scales[key][l] = np.asarray(arr, np.float32)
            else:
                a = arr.T if transpose else arr
                layer_stacks[key][l] = a

    for key, stack in layer_stacks.items():
        if key in _OPTIONAL_LAYER_KEYS and all(s is None for s in stack):
            continue  # variant param not in this checkpoint
        if any(s is None for s in stack):
            missing = [i for i, s in enumerate(stack) if s is None]
            raise ValueError(f"missing layers {missing} for {key}")
        have_scales = all(s is not None for s in scales[key])
        if have_scales:
            # Pre-quantized FP8 checkpoint: keep values, stack scales.
            w = jnp.stack([jnp.asarray(s) for s in stack])
            scale = jnp.stack([jnp.asarray(s).reshape(()) for s in
                               scales[key]])
            params["layers"][key] = QuantizedLinear(weight=w, scale=scale)
        else:
            w = jnp.stack([jnp.asarray(s, dtype) for s in stack])
            params["layers"][key] = w

    if arch.tie_word_embeddings:
        params.pop("lm_head", None)
    if quantization and not isinstance(
            params["layers"]["wq"], QuantizedLinear):
        params = quantize_params(params, quantization)
    if quantization and "lm_head" in params and \
            not isinstance(params["embed"], QuantizedLinear):
        # Pre-quantized checkpoints ship bf16 embeddings; quantize ours
        # like the reference's Fp8ConfigWithEmbedding (fp8.py:310-337).
        # The embedding table always uses fp8 (row-gather dequant needs a
        # scalar scale); int modes apply to the matmul weights + LM head.
        params["embed"] = fp8_quantize(params["embed"])
    if have_kv_scales:
        params["kv_scales"] = kv_scales
    return params


# Registry interface alias.
Arch = LlamaArch
