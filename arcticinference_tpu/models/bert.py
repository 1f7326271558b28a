"""BERT-family bidirectional encoders as pure functions.

The reference's embedding service serves encoder checkpoints through
vLLM's encode mode (reference ``embedding/replica.py:213-224``); this
module is the TPU-native encoder family behind the same service here.

TPU-first design notes:

- Encoders are one-shot: no KV cache, no paging, no incremental state.
  The right shape for the MXU is a *dense* ``[B, T]`` batch padded to
  bucketed lengths — attention is two big batched matmuls per layer, and
  XLA fuses the bias/LayerNorm/GELU chains around them.
- Layer parameters are stacked on a leading ``L`` axis and the encoder
  stack is one ``lax.scan`` (same compile-once property as the llama
  module).
- Post-LN (original BERT) residual ordering, learned absolute position
  embeddings, GELU MLP — matching HuggingFace ``BertModel`` semantics so
  real sentence-embedding checkpoints load bit-compatibly.

Pooling (cls / mean / max, optional L2 normalisation) runs on device so
the host transfer is ``[B, D]``, not ``[B, T, D]``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

IS_ENCODER = True


@dataclass(frozen=True)
class BertArch:
    vocab_size: int = 30522
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    head_dim: int = 64
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    hidden_act: str = "gelu"

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "BertArch":
        d = int(cfg.get("hidden_size", 768))
        heads = int(cfg.get("num_attention_heads", 12))
        return cls(
            vocab_size=int(cfg.get("vocab_size", 30522)),
            hidden_size=d,
            intermediate_size=int(cfg.get("intermediate_size", 4 * d)),
            num_layers=int(cfg.get("num_hidden_layers", 12)),
            num_heads=heads,
            head_dim=d // heads,
            max_position_embeddings=int(
                cfg.get("max_position_embeddings", 512)),
            type_vocab_size=int(cfg.get("type_vocab_size", 2)),
            layer_norm_eps=float(cfg.get("layer_norm_eps", 1e-12)),
            pad_token_id=int(cfg.get("pad_token_id") or 0),
            hidden_act=str(cfg.get("hidden_act", "gelu")),
        )


Arch = BertArch

_LAYER_KEYS_2D = ("wq", "wk", "wv", "wo", "w_in", "w_out")


def init_params(arch: BertArch, rng: jax.Array, dtype=jnp.float32,
                quantization: Optional[str] = None) -> dict:
    """Random init (benchmarks / tests). fp8 is pointless for encoders of
    this size, so ``quantization`` is accepted but ignored."""
    d, f, l = arch.hidden_size, arch.intermediate_size, arch.num_layers
    ks = jax.random.split(rng, 8)
    std = 0.02

    def w(key, shape):
        return (std * jax.random.normal(key, shape)).astype(dtype)

    layers = {
        "wq": w(ks[0], (l, d, d)), "wk": w(ks[1], (l, d, d)),
        "wv": w(ks[2], (l, d, d)), "wo": w(ks[3], (l, d, d)),
        "bq": jnp.zeros((l, d), dtype), "bk": jnp.zeros((l, d), dtype),
        "bv": jnp.zeros((l, d), dtype), "bo": jnp.zeros((l, d), dtype),
        "ln1_g": jnp.ones((l, d), dtype), "ln1_b": jnp.zeros((l, d), dtype),
        "w_in": w(ks[4], (l, d, f)), "b_in": jnp.zeros((l, f), dtype),
        "w_out": w(ks[5], (l, f, d)), "b_out": jnp.zeros((l, d), dtype),
        "ln2_g": jnp.ones((l, d), dtype), "ln2_b": jnp.zeros((l, d), dtype),
    }
    return {
        "word_emb": w(ks[6], (arch.vocab_size, d)),
        "pos_emb": w(ks[7], (arch.max_position_embeddings, d)),
        "type_emb": jnp.zeros((arch.type_vocab_size, d), dtype),
        "emb_ln_g": jnp.ones((d,), dtype),
        "emb_ln_b": jnp.zeros((d,), dtype),
        "layers": layers,
    }


def _layer_norm(x, g, b, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _act(name: str):
    if name in ("gelu", "gelu_new", "gelu_pytorch_tanh"):
        approx = name != "gelu"
        return lambda x: jax.nn.gelu(x, approximate=approx)
    if name == "relu":
        return jax.nn.relu
    if name == "silu":
        return jax.nn.silu
    raise ValueError(f"unsupported hidden_act {name!r}")


def forward(params: dict, arch: BertArch, inputs: dict,
            pctx=None) -> jax.Array:
    """Dense bidirectional encode.

    inputs: ``input_ids`` [B, T] int32, ``attention_mask`` [B, T]
    (1 = real token).  Returns hidden states [B, T, D].
    """
    ids = inputs["input_ids"]
    mask = inputs["attention_mask"]
    b, t = ids.shape
    h = params["word_emb"][ids]
    h = h + params["pos_emb"][:t][None, :, :]
    h = h + params["type_emb"][0][None, None, :]
    h = _layer_norm(h, params["emb_ln_g"], params["emb_ln_b"],
                    arch.layer_norm_eps)

    nh, hd = arch.num_heads, arch.head_dim
    eps = arch.layer_norm_eps
    act = _act(arch.hidden_act)
    # Additive mask in f32 (scores accumulate in f32).
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e30)
    bias = bias.astype(jnp.float32)
    scale = 1.0 / np.sqrt(hd)

    def layer(h, lp):
        q = (h @ lp["wq"] + lp["bq"]).reshape(b, t, nh, hd)
        k = (h @ lp["wk"] + lp["bk"]).reshape(b, t, nh, hd)
        v = (h @ lp["wv"] + lp["bv"]).reshape(b, t, nh, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores * scale + bias, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(h.dtype), v)
        o = o.reshape(b, t, nh * hd) @ lp["wo"] + lp["bo"]
        h = _layer_norm(h + o, lp["ln1_g"], lp["ln1_b"], eps)
        m = act(h @ lp["w_in"] + lp["b_in"]) @ lp["w_out"] + lp["b_out"]
        h = _layer_norm(h + m, lp["ln2_g"], lp["ln2_b"], eps)
        return h, None

    h, _ = jax.lax.scan(layer, h, params["layers"])
    return h


def pool(hidden: jax.Array, mask: jax.Array, method: str = "mean",
         normalize: bool = True) -> jax.Array:
    """[B, T, D] -> [B, D] on device. ``mask`` [B, T] 1 = real token."""
    m = mask.astype(jnp.float32)[:, :, None]
    h = hidden.astype(jnp.float32)
    if method == "mean":
        out = (h * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
    elif method == "cls":
        out = h[:, 0, :]
    elif method == "max":
        out = jnp.where(m > 0, h, -jnp.inf).max(1)
    elif method == "last":
        last = jnp.maximum(mask.sum(-1).astype(jnp.int32) - 1, 0)
        out = h[jnp.arange(h.shape[0]), last]
    else:
        raise ValueError(f"unknown pooling {method!r}")
    if normalize:
        out = out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
    return out


def load_hf_state(arch: BertArch, tensors: dict[str, np.ndarray],
                  dtype=jnp.float32,
                  quantization: Optional[str] = None) -> dict:
    """Map HuggingFace ``BertModel`` checkpoint names (with or without a
    ``bert.`` prefix) onto the stacked-layer pytree."""

    def get(name):
        for cand in (name, "bert." + name):
            if cand in tensors:
                return np.asarray(tensors[cand])
        raise KeyError(name)

    def stack(fmt, transpose=False):
        ws = [get(fmt.format(i)) for i in range(arch.num_layers)]
        out = np.stack([w.T if transpose else w for w in ws])
        return jnp.asarray(out, dtype)

    p = "encoder.layer.{}."
    layers = {
        # HF Linear stores [out, in]; ours multiply as x @ w -> [in, out].
        "wq": stack(p + "attention.self.query.weight", True),
        "bq": stack(p + "attention.self.query.bias"),
        "wk": stack(p + "attention.self.key.weight", True),
        "bk": stack(p + "attention.self.key.bias"),
        "wv": stack(p + "attention.self.value.weight", True),
        "bv": stack(p + "attention.self.value.bias"),
        "wo": stack(p + "attention.output.dense.weight", True),
        "bo": stack(p + "attention.output.dense.bias"),
        "ln1_g": stack(p + "attention.output.LayerNorm.weight"),
        "ln1_b": stack(p + "attention.output.LayerNorm.bias"),
        "w_in": stack(p + "intermediate.dense.weight", True),
        "b_in": stack(p + "intermediate.dense.bias"),
        "w_out": stack(p + "output.dense.weight", True),
        "b_out": stack(p + "output.dense.bias"),
        "ln2_g": stack(p + "output.LayerNorm.weight"),
        "ln2_b": stack(p + "output.LayerNorm.bias"),
    }
    params = {
        "word_emb": jnp.asarray(
            get("embeddings.word_embeddings.weight"), dtype),
        "pos_emb": jnp.asarray(
            get("embeddings.position_embeddings.weight"), dtype),
        "type_emb": jnp.asarray(
            get("embeddings.token_type_embeddings.weight"), dtype),
        "emb_ln_g": jnp.asarray(get("embeddings.LayerNorm.weight"), dtype),
        "emb_ln_b": jnp.asarray(get("embeddings.LayerNorm.bias"), dtype),
        "layers": layers,
    }
    return params
