"""Model registry.

The reference registers models into vLLM's ModelRegistry
(``plugins.py:96-109``); here the registry is ours.  Each entry maps an
architecture name to a module exposing:

- ``Arch.from_hf_config(dict) -> Arch`` (frozen dataclass of dims)
- ``init_params(arch, rng, dtype) -> params pytree``
- ``load_hf_state(arch, state_dict, dtype) -> params pytree``
- ``forward(params, arch, kc, vc, inputs) -> (kc, vc, hidden)``
- ``compute_logits(params, hidden_rows) -> logits``
"""

from importlib import import_module

_REGISTRY = {
    "llama": "arcticinference_tpu.models.llama",
    "LlamaForCausalLM": "arcticinference_tpu.models.llama",
    "llama_swiftkv": "arcticinference_tpu.models.llama_swiftkv",
    "LlamaSwiftKVForCausalLM": "arcticinference_tpu.models.llama_swiftkv",
    "bert": "arcticinference_tpu.models.bert",
    "BertModel": "arcticinference_tpu.models.bert",
    "BertForMaskedLM": "arcticinference_tpu.models.bert",
    "BertForSequenceClassification": "arcticinference_tpu.models.bert",
    "mixtral": "arcticinference_tpu.models.mixtral",
    "MixtralForCausalLM": "arcticinference_tpu.models.mixtral",
    "qwen2": "arcticinference_tpu.models.qwen2",
    "Qwen2ForCausalLM": "arcticinference_tpu.models.qwen2",
    "qwen3": "arcticinference_tpu.models.qwen3",
    "Qwen3ForCausalLM": "arcticinference_tpu.models.qwen3",
    "mlp_speculator": "arcticinference_tpu.models.speculators",
    "ArcticMLPSpeculatorPreTrainedModel":
        "arcticinference_tpu.models.speculators",
    "ArcticLSTMSpeculatorPreTrainedModel":
        "arcticinference_tpu.models.speculators",
}


def get_model_module(name: str):
    if name not in _REGISTRY:
        raise ValueError(
            f"Unknown model architecture {name!r}; known: {sorted(_REGISTRY)}")
    return import_module(_REGISTRY[name])
