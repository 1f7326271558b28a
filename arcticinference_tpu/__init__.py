"""ArcticInference-TPU: a TPU-native LLM serving framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
ArcticInference (reference: /root/reference): continuous batching over a
paged KV cache, FP8 weight + KV quantization, speculative decoding
(Arctic MLP/LSTM speculators + suffix decoding), SwiftKV early-exit
prefill, and Shift Parallelism (dynamic Ulysses-SP <-> TP switching)
over a ``jax.sharding.Mesh``.

Unlike the reference — which is a monkey-patching plugin on top of vLLM
(see reference ``arctic_inference/patching.py``, ``vllm/plugins.py``) —
this engine owns every layer, so there is no patch framework: the
configuration tree, scheduler, model runner, kernels and servers are all
first-class modules here.
"""

__version__ = "0.1.0"

from arcticinference_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    ParallelConfig,
    SchedulerConfig,
    SpeculativeConfig,
)

__all__ = [
    "CacheConfig",
    "EngineConfig",
    "ModelConfig",
    "ParallelConfig",
    "SchedulerConfig",
    "SpeculativeConfig",
    "__version__",
]
