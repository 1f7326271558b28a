"""Environment-variable flag registry.

Lazy module-``__getattr__`` registry in the spirit of the reference's
``arctic_inference/envs.py:22-31`` — flags are read from the environment at
access time so tests can monkeypatch ``os.environ``.
"""

import os
from typing import Any, Callable

environment_variables: dict[str, Callable[[], Any]] = {
    # Skip the draft-model <-> base-model architecture compatibility check
    # (reference envs.py: ARCTIC_INFERENCE_SKIP_SPEC_MODEL_CHECK).
    "ARCTIC_TPU_SKIP_SPEC_MODEL_CHECK":
        lambda: os.environ.get("ARCTIC_TPU_SKIP_SPEC_MODEL_CHECK", "0") == "1",
    # Force the jnp reference implementations instead of Pallas kernels
    # (useful on CPU test meshes and for numerics A/B checks).
    "ARCTIC_TPU_DISABLE_PALLAS":
        lambda: os.environ.get("ARCTIC_TPU_DISABLE_PALLAS", "0") == "1",
    # Directory for the compiled native suffix-tree library.
    "ARCTIC_TPU_NATIVE_BUILD_DIR":
        lambda: os.environ.get("ARCTIC_TPU_NATIVE_BUILD_DIR", ""),
    # Force the pure-Python suffix tree (no C++ build).
    "ARCTIC_TPU_PURE_PYTHON_SUFFIX":
        lambda: os.environ.get("ARCTIC_TPU_PURE_PYTHON_SUFFIX", "0") == "1",
    # Disable the device-resident fused decode loop (engine/fused_decode.py)
    # regardless of SpeculativeConfig.enable_fused_decode.
    "ARCTIC_TPU_DISABLE_FUSED":
        lambda: os.environ.get("ARCTIC_TPU_DISABLE_FUSED", "0") == "1",
    # Opt-IN deferred KV-write path (grouped-kernel softmax injection +
    # one whole-model scatter).  Measured on v5e batch 64: the in-kernel
    # injection costs ~18 us/layer — more than the ~4 us/layer the
    # bulk scatter saves — so the merged per-layer scatter stays the
    # default; the machinery is kept for chips where the scatter/
    # injection balance differs.
    "ARCTIC_TPU_DEFERRED_KV":
        lambda: os.environ.get("ARCTIC_TPU_DEFERRED_KV", "0") == "1",
    # Disable the fused qkv / gate+up weight layout (models/llama.py
    # fuse_params); A/B lever for the decode weight stream.
    "ARCTIC_TPU_DISABLE_FUSED_WEIGHTS":
        lambda: os.environ.get(
            "ARCTIC_TPU_DISABLE_FUSED_WEIGHTS", "0") == "1",
    # Force lax.scan over layers for ALL buckets (skip the decode-bucket
    # unroll; A/B lever for compile-time/throughput experiments).
    "ARCTIC_TPU_NO_UNROLL":
        lambda: os.environ.get("ARCTIC_TPU_NO_UNROLL", "0") == "1",
    # Disable the grouped decode attention kernel (pure-decode steps fall
    # back to the work-item ragged kernel).
    "ARCTIC_TPU_DISABLE_GROUPED_DECODE":
        lambda: os.environ.get(
            "ARCTIC_TPU_DISABLE_GROUPED_DECODE", "0") == "1",
    # Disable the DFA-compiled guided-decoding path (device-applied vocab
    # bitmasks); falls back to host-side top-K candidate filtering.
    "ARCTIC_TPU_DISABLE_GUIDED_DFA":
        lambda: os.environ.get(
            "ARCTIC_TPU_DISABLE_GUIDED_DFA", "0") == "1",
    # Run the Pallas attention kernel in TPU-interpret mode on CPU (tests:
    # exercises the kernel code path, e.g. under a virtual PP mesh, where
    # the backend gate would otherwise pick the jnp reference).
    "ARCTIC_TPU_FORCE_PALLAS_INTERPRET":
        lambda: os.environ.get(
            "ARCTIC_TPU_FORCE_PALLAS_INTERPRET", "0") == "1",
    # Pin the fused suffix loop's wide/narrow program choice ("wide" |
    # "narrow" | "" = policy).  A/B lever for the width-policy serving
    # matrix (benchmarks/serve_bench.py --force-width): "wide" is the
    # round-3 always-speculate behaviour, "narrow" never verifies.
    "ARCTIC_TPU_FUSED_FORCE_WIDTH":
        lambda: os.environ.get("ARCTIC_TPU_FUSED_FORCE_WIDTH", ""),
}


def __getattr__(name: str) -> Any:
    if name in environment_variables:
        return environment_variables[name]()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__() -> list[str]:
    return list(environment_variables.keys())
