"""Arctic MLP / LSTM speculators (draft models) in JAX.

Capability mirror of reference ``vllm/spec_dec/arctic_speculator.py``:

- :class:`MLPSpecArch` — the IBM-style multi-head MLP speculator
  (arXiv:2404.19124): per head, embed(last_token) and project(state) are
  combined with the fixed ``state_weight/emb_weight`` blend (reference
  ``arctic_speculator.py:214-217,273-283``), L2-layer-normed, GELU'd, and
  decoded greedily through a per-head LM head.
- :class:`LSTMSpecArch` — the ``sum_lstm`` variant (reference
  ``arctic_speculator.py:662-691``): one fused 4-way projection split
  into forget/input/output gates + cell candidate, LayerNormed cell chain
  with tied embeddings.

TPU-first differences: the whole n_predict-head greedy chain is ONE
jitted function (the role of the reference's CUDA-graphed loop,
``arctic_speculator.py:753-866``) — heads unroll at trace time, the
argmax chain stays on device, and only the final [B, n_predict] draft
token block is returned.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from arcticinference_tpu.ops import fp8 as fp8_ops
from arcticinference_tpu.ops.layers import l2_norm_scaled

SQRT2 = math.sqrt(2.0)


# --------------------------------------------------------------------- #
# Quantization (reference vllm/spec_dec/fp8.py Fp8ConfigWithEmbedding:
# FP8 draft LM head + FP8-weight embedding gather)
# --------------------------------------------------------------------- #

def _mm(x: jax.Array, w) -> jax.Array:
    """x @ w in fp32, where w may be a QuantizedLinear."""
    if isinstance(w, fp8_ops.QuantizedLinear):
        return fp8_ops.matmul(x.astype(jnp.bfloat16), w,
                              preferred_element_type=jnp.float32)
    return jnp.dot(x.astype(w.dtype), w,
                   preferred_element_type=jnp.float32)


def _embed(e, tok: jax.Array) -> jax.Array:
    """Embedding row gather -> fp32, dequantizing gathered rows only
    (the reference's fp8-weight ``F.embedding``, ``fp8.py:310-337``)."""
    if isinstance(e, fp8_ops.QuantizedLinear):
        z = e.weight[tok].astype(jnp.float32)
        s = e.scale
        if s.ndim and s.shape[-1] == e.weight.shape[-1]:
            return z * s                      # int8 per-out-channel
        return z * s.reshape(())              # fp8 per-tensor
    return e[tok].astype(jnp.float32)


def quantize_spec_params(params: dict, mode: str) -> dict:
    """Quantize all draft matmul + embedding weights to fp8/int8.

    LayerNorm vectors stay bf16.  int4 is rejected in config: its packed
    split-half layout can't be row-gathered for embeddings.
    """
    if mode not in ("fp8", "int8"):
        raise ValueError(f"speculator quantization {mode!r} unsupported")

    def q(w):
        return fp8_ops.weight_quantize(w, mode)

    out = dict(params)
    for key in ("emb", "proj", "head", "forget_emb",
                "proj_first", "proj_rest"):
        if key not in out:
            continue
        v = out[key]
        out[key] = [q(w) for w in v] if isinstance(v, list) else q(v)
    return out


# --------------------------------------------------------------------- #
# MLP speculator
# --------------------------------------------------------------------- #

@dataclass(frozen=True)
class MLPSpecArch:
    vocab_size: int = 32000
    emb_dim: int = 4096            # base-model hidden size
    inner_dim: int = 4096
    n_predict: int = 3
    tie_weights: bool = True
    scale_input: bool = True
    method: str = "sum_rnn"

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "MLPSpecArch":
        inner = cfg.get("inner_dim", 0)
        if isinstance(inner, str):
            inner = int(inner.split(".")[-1])
        emb = cfg.get("emb_dim", 4096)
        if isinstance(emb, str):
            emb = int(emb.split(".")[-1])
        return cls(
            vocab_size=cfg.get("vocab_size", 32000),
            emb_dim=emb,
            inner_dim=inner or emb,
            n_predict=cfg.get("n_predict", 3),
            tie_weights=cfg.get("tie_weights", True),
            scale_input=cfg.get("scale_input", True),
        )

    @property
    def state_weight(self) -> float:
        return 0.5 ** (0.5 / self.n_predict)

    @property
    def emb_weight(self) -> float:
        return math.sqrt(
            (1 - self.state_weight ** 2) * (self.inner_dim / 2))


def mlp_init_params(arch: MLPSpecArch, rng: jax.Array,
                    dtype=jnp.bfloat16) -> dict:
    n_uniq = 1 if arch.tie_weights else arch.n_predict
    n_proj = min(2, arch.n_predict) if arch.tie_weights else arch.n_predict
    ks = iter(jax.random.split(rng, 4 * arch.n_predict + 4))

    def w(shape):
        return (jax.random.normal(next(ks), shape, jnp.float32)
                * 0.02).astype(dtype)

    proj_in = [arch.emb_dim if i == 0 else arch.inner_dim
               for i in range(n_proj)]
    params = {
        "emb": [w((arch.vocab_size, arch.inner_dim)) for _ in range(n_uniq)],
        "proj": [w((proj_in[i], arch.inner_dim)) for i in range(n_proj)],
        "head": [w((arch.inner_dim, arch.vocab_size))
                 for _ in range(n_uniq)],
        "ln_w": [jnp.ones((arch.inner_dim,), dtype) for _ in range(n_uniq)],
        "ln_b": [jnp.zeros((arch.inner_dim,), dtype)
                 for _ in range(n_uniq)],
    }
    return params


def _mlp_head_params(params: dict, arch: MLPSpecArch, i: int):
    if arch.tie_weights:
        e = params["emb"][0]
        p = params["proj"][min(i, 1)]
        h = params["head"][0]
        lw, lb = params["ln_w"][0], params["ln_b"][0]
    else:
        e = params["emb"][i]
        p = params["proj"][i]
        h = params["head"][i]
        lw, lb = params["ln_w"][i], params["ln_b"][i]
    return e, p, h, lw, lb


def mlp_generate_proposals(params: dict, arch: MLPSpecArch,
                           last_tokens: jax.Array,
                           hidden: jax.Array,
                           num_predict: int) -> jax.Array:
    """Greedy draft chain: [B] last tokens + [B, emb_dim] hidden ->
    [B, num_predict] draft tokens.  Jit-friendly (static unroll)."""
    state = hidden.astype(jnp.float32)
    if arch.scale_input:
        state = l2_norm_scaled(state, None, None) / SQRT2
    tok = last_tokens
    alpha = arch.emb_weight / arch.state_weight
    drafts = []
    for i in range(num_predict):
        e, p, h, lw, lb = _mlp_head_params(params, arch, i)
        z = _embed(e, tok)
        states = _mm(state, p)
        states = states + alpha * z
        states = jax.nn.gelu(
            l2_norm_scaled(states, lw, lb).astype(jnp.float32),
            approximate=False)
        logits = _mm(states, h)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        drafts.append(tok)
        state = states
    return jnp.stack(drafts, axis=1)


# --------------------------------------------------------------------- #
# LSTM speculator (sum_lstm)
# --------------------------------------------------------------------- #

@dataclass(frozen=True)
class LSTMSpecArch:
    vocab_size: int = 32000
    input_hidden_dim: int = 4096
    emb_dim: tuple[int, ...] = (4096,)
    inner_dim: tuple[int, ...] = (4096,)
    proj_dim: tuple[int, ...] = (4096,)
    n_predict: int = 3
    tie_weights: bool = True
    tie_lstm_embs: bool = True
    scale_input: bool = True
    method: str = "sum_lstm"

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "LSTMSpecArch":
        def dims(x, default):
            if x is None:
                return default
            if isinstance(x, str):
                return tuple(int(v) for v in x.split("."))
            if isinstance(x, int):
                return (x,)
            return tuple(x)

        hid = cfg.get("input_hidden_dim", 4096)
        return cls(
            vocab_size=cfg.get("vocab_size", 32000),
            input_hidden_dim=hid,
            emb_dim=dims(cfg.get("emb_dim"), (hid,)),
            inner_dim=dims(cfg.get("inner_dim"), (hid,)),
            proj_dim=dims(cfg.get("proj_dim"), (hid,)),
            n_predict=cfg.get("n_predict", 3),
            tie_weights=cfg.get("tie_weights", True),
            tie_lstm_embs=cfg.get("tie_lstm_embs", True),
            scale_input=cfg.get("scale_input", True),
            method=cfg.get("method", "sum_lstm"),
        )

    @property
    def state_weight(self) -> float:
        return 0.5 ** (0.5 / self.n_predict)

    @property
    def emb_weight(self) -> float:
        return math.sqrt(
            (1 - self.state_weight ** 2) * (self.inner_dim[0] / 2))


def lstm_init_params(arch: LSTMSpecArch, rng: jax.Array,
                     dtype=jnp.bfloat16) -> dict:
    assert arch.tie_weights, "sum_lstm requires tie_weights"
    ks = iter(jax.random.split(rng, 8))
    p0 = arch.proj_dim[0]

    def w(shape):
        return (jax.random.normal(next(ks), shape, jnp.float32)
                * 0.02).astype(dtype)

    return {
        "forget_emb": w((arch.vocab_size, arch.emb_dim[0])),
        "proj_first": w((arch.input_hidden_dim, p0 * 4)),
        "proj_rest": w((arch.inner_dim[-1], p0 * 4)),
        "cell_ln_w": jnp.ones((arch.inner_dim[0],), dtype),
        "cell_ln_b": jnp.zeros((arch.inner_dim[0],), dtype),
        "state_ln_w": jnp.ones((arch.inner_dim[0],), dtype),
        "state_ln_b": jnp.zeros((arch.inner_dim[0],), dtype),
        "head": w((arch.inner_dim[-1], arch.vocab_size)),
    }


def lstm_generate_proposals(params: dict, arch: LSTMSpecArch,
                            last_tokens: jax.Array,
                            hidden: jax.Array,
                            num_predict: int) -> jax.Array:
    """sum_lstm greedy chain (reference arctic_speculator.py:662-691)."""
    b = last_tokens.shape[0]
    p0 = arch.proj_dim[0]
    state = hidden.astype(jnp.float32)
    if arch.scale_input:
        state = l2_norm_scaled(state, None, None) / SQRT2
    cell = jnp.zeros((b, arch.inner_dim[0]), jnp.float32)
    tok = last_tokens
    alpha = arch.emb_weight / arch.state_weight
    drafts = []
    for i in range(num_predict):
        proj = params["proj_first"] if i == 0 else params["proj_rest"]
        z = _embed(params["forget_emb"], tok)
        z4 = jnp.tile(z, (1, 4))
        states = _mm(state, proj) + alpha * z4
        gates, cand = states[:, :3 * p0], states[:, 3 * p0:]
        gates = jax.nn.sigmoid(gates)
        fg, ig, og = gates[:, :p0], gates[:, p0:2 * p0], gates[:, 2 * p0:]
        cand = jax.nn.gelu(
            l2_norm_scaled(cand, params["cell_ln_w"],
                           params["cell_ln_b"]).astype(jnp.float32),
            approximate=False) * ig
        cell = cell * fg + cand
        state = jax.nn.gelu(
            l2_norm_scaled(cell, params["state_ln_w"],
                           params["state_ln_b"]).astype(jnp.float32),
            approximate=False) * og
        logits = _mm(state, params["head"])
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        drafts.append(tok)
    return jnp.stack(drafts, axis=1)


# --------------------------------------------------------------------- #
# Checkpoint loading (HF safetensors name remap)
# --------------------------------------------------------------------- #

def load_mlp_state(arch: MLPSpecArch, tensors: dict[str, np.ndarray],
                   dtype=jnp.bfloat16) -> dict:
    """Map IBM/Arctic MLP speculator checkpoints (emb.N / proj.N / head.N /
    ln.N) into the pytree; reference remaps a ``speculator.`` prefix the
    same way (``arctic_speculator.py:391-401``)."""
    t = {k.replace("speculator.", ""): v for k, v in tensors.items()}
    n_uniq = 1 if arch.tie_weights else arch.n_predict
    n_proj = min(2, arch.n_predict) if arch.tie_weights else arch.n_predict

    def get(name):
        if name not in t:
            raise KeyError(f"missing speculator tensor {name}; "
                           f"have {sorted(t)[:8]}...")
        return t[name]

    return {
        "emb": [jnp.asarray(get(f"emb.{i}.weight"), dtype)
                for i in range(n_uniq)],
        "proj": [jnp.asarray(get(f"proj.{i}.weight").T, dtype)
                 for i in range(n_proj)],
        "head": [jnp.asarray(get(f"head.{i}.weight").T, dtype)
                 for i in range(n_uniq)],
        "ln_w": [jnp.asarray(get(f"ln.{i}.weight"), dtype)
                 for i in range(n_uniq)],
        "ln_b": [jnp.asarray(get(f"ln.{i}.bias"), dtype)
                 for i in range(n_uniq)],
    }


def load_lstm_state(arch: LSTMSpecArch, tensors: dict[str, np.ndarray],
                    dtype=jnp.bfloat16) -> dict:
    t = {k.replace("speculator.", ""): v for k, v in tensors.items()}

    def get(*names):
        for n in names:
            if n in t:
                return t[n]
        raise KeyError(f"missing speculator tensor {names}")

    return {
        "forget_emb": jnp.asarray(get("forget_emb.0.weight"), dtype),
        "proj_first": jnp.asarray(get("projs.0.weight").T, dtype),
        "proj_rest": jnp.asarray(get("projs.1.weight").T, dtype),
        "cell_ln_w": jnp.asarray(get("cell_ln.0.weight"), dtype),
        "cell_ln_b": jnp.asarray(get("cell_ln.0.bias"), dtype),
        "state_ln_w": jnp.asarray(get("state_ln.0.weight"), dtype),
        "state_ln_b": jnp.asarray(get("state_ln.0.bias"), dtype),
        "head": jnp.asarray(get("head.0.weight").T, dtype),
    }


# Registry interface: pick MLP by default; the loader inspects configs.
Arch = MLPSpecArch
