"""Checkpoint loading: HF directory -> (arch, params pytree).

Replaces the vLLM weight-loading machinery the reference leans on
(reference ``llama_swiftkv.py:727-793`` customizes it for stacked params).
Supports:

- HF model directories: ``config.json`` + ``*.safetensors`` shards.
- Architecture-name + ``hf_overrides`` with random init (benchmarks, tests
  — no checkpoint required).
- FP8 compressed-tensors checkpoints (``.weight_scale`` companions) and
  on-the-fly weight-only FP8 quantization of bf16 checkpoints.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from arcticinference_tpu.config import ModelConfig
from arcticinference_tpu.models import get_model_module

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.bfloat16,  # fp16 not native on TPU; bf16 is strictly safer
}


def resolve_dtype(name: str) -> jnp.dtype:
    if name not in _DTYPES:
        raise ValueError(f"Unsupported dtype {name!r}")
    return _DTYPES[name]


def read_hf_config(model: str) -> Optional[dict[str, Any]]:
    p = Path(model) / "config.json"
    if p.exists():
        return json.loads(p.read_text())
    return None


def _iter_safetensors(model_dir: Path):
    from safetensors import safe_open

    files = sorted(model_dir.glob("*.safetensors"))
    for f in files:
        with safe_open(str(f), framework="numpy") as st:
            for name in st.keys():
                yield name, st.get_tensor(name)


def load_model(cfg: ModelConfig, rng: Optional[jax.Array] = None):
    """Returns (module, arch, params).

    ``module`` is the architecture module from the registry; ``arch`` its
    frozen dims dataclass; ``params`` the weight pytree (possibly
    fp8-quantized).
    """
    hf_cfg = read_hf_config(cfg.model)
    if hf_cfg is not None:
        arch_name = (hf_cfg.get("architectures") or ["LlamaForCausalLM"])[0]
        merged = {**hf_cfg, **cfg.hf_overrides}
    else:
        arch_name = cfg.model
        merged = dict(cfg.hf_overrides)
    module = get_model_module(arch_name)
    arch = module.Arch.from_hf_config(merged)

    dtype = resolve_dtype(cfg.dtype)
    model_dir = Path(cfg.model)
    has_weights = hf_cfg is not None and any(model_dir.glob("*.safetensors"))
    if has_weights:
        tensors = dict(_iter_safetensors(model_dir))
        params = module.load_hf_state(arch, tensors, dtype,
                                      quantization=cfg.quantization)
    else:
        if rng is None:
            rng = jax.random.PRNGKey(cfg.seed)
        params = module.init_params(arch, rng, dtype,
                                    quantization=cfg.quantization)
    return module, arch, params
