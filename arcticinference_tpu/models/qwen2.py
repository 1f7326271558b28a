"""Qwen2 / Qwen2.5 family: the Llama decoder body + attention QKV biases.

The reference serves Qwen-class checkpoints through vLLM's model zoo (its
plugin patches apply to any vLLM model, reference
``arctic_inference/vllm/plugins.py:96-109`` registers only the extra
architectures); this engine owns its model registry, so the family is a
thin variant of :mod:`arcticinference_tpu.models.llama` — same stacked
scan/unroll forward, paged KV cache, quantization, and parallelism hooks.
The only architectural deltas are biases on the q/k/v projections (HF
``Qwen2Attention`` always uses them) and, for the small 0.5B/1.5B
checkpoints, tied word embeddings (already handled by the base loader).

Bias sharding: ``[L, out]`` biases shard with their weight's out axis
over ``tp`` (``parallel/mesh.py param_specs``), re-slice to the fused
``(tp, sp)`` shard in shift mode, and follow the head-granular kv slice
under GQA replication (``parallel/ulysses.py DEFAULT_SLICE_AXES``).
"""

from __future__ import annotations

from typing import Any

# Re-exported module interface (registry contract, models/__init__.py):
from arcticinference_tpu.models.llama import (  # noqa: F401
    LlamaArch, _QUANT_KEYS, compute_logits, embed_lookup, finalize_hidden,
    forward, fuse_params, init_params, load_hf_state, make_attn_impl,
    quantize_params,
    scan_layers)


class Qwen2Arch(LlamaArch):
    """LlamaArch with attention biases on by default (HF Qwen2Config has
    no ``attention_bias`` field — the architecture always uses them)."""

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "Qwen2Arch":
        c = dict(cfg)
        c.setdefault("attention_bias", True)
        c.setdefault("rope_theta", 1000000.0)
        return super().from_hf_config(c)


Arch = Qwen2Arch
