"""Qwen3 family: the Llama decoder body + per-head RMSNorm on q/k.

Same registry contract and reuse story as :mod:`.qwen2` (the reference
gets Qwen3 from vLLM's zoo). Architectural deltas vs Llama: a per-head
RMSNorm applied to q and k after the projections and before RoPE (HF
``Qwen3Attention.q_norm/k_norm``), no attention biases, and an explicit
``head_dim`` that need not equal ``hidden_size / num_heads``.

The qk-norm weights are ``[L, head_dim]`` vectors, replicated across the
mesh (``parallel/mesh.py param_specs``) — they act per head, so TP/SP
head sharding never splits them.
"""

from __future__ import annotations

from typing import Any

# Re-exported module interface (registry contract, models/__init__.py):
from arcticinference_tpu.models.llama import (  # noqa: F401
    LlamaArch, _QUANT_KEYS, compute_logits, embed_lookup, finalize_hidden,
    forward, fuse_params, init_params, load_hf_state, make_attn_impl,
    quantize_params,
    scan_layers)


class Qwen3Arch(LlamaArch):

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "Qwen3Arch":
        c = dict(cfg)
        c["qk_norm"] = True
        c.setdefault("attention_bias", False)
        c.setdefault("rope_theta", 1000000.0)
        return super().from_hf_config(c)


Arch = Qwen3Arch
