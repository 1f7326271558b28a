"""Typed configuration tree for the engine.

The reference spreads configuration over vLLM dataclass patches
(``arctic_inference/vllm/config.py:27-133``, ``args.py:24-148``).  Here the
whole tree is owned by us: one dataclass per concern, composed into
``EngineConfig``.  Flag names deliberately mirror the reference CLI so users
can migrate configs 1:1 (``--ulysses-sequence-parallel-size``,
``--enable-shift-parallel``, ``--shift-parallel-threshold``, and the
speculative-config JSON keys at reference ``config.py:56-62``).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional


def _positive(name: str, value: int) -> None:
    if value <= 0:
        raise ValueError(f"{name} must be positive, got {value}")


@dataclass
class ModelConfig:
    """What model to run and at which precision.

    ``model`` may be a HuggingFace repo path on disk or a registered
    architecture name (e.g. ``llama``, ``llama_swiftkv``).  When no
    checkpoint directory exists the engine builds randomly-initialised
    weights from ``hf_overrides`` — useful for benchmarking.
    """

    model: str = "llama"
    tokenizer: Optional[str] = None
    dtype: str = "bfloat16"                  # activation / default weight dtype
    #: None | "fp8" | "int8" | "int4" (weight-only; fp8 also covers
    #: pre-quantized fp8 checkpoints, int4 uses group-128 scales)
    quantization: Optional[str] = None
    max_model_len: int = 8192
    # Direct architecture overrides (used when no config.json is found, and
    # merged on top of one when it is).
    hf_overrides: dict[str, Any] = field(default_factory=dict)
    seed: int = 0
    enforce_eager: bool = False              # disable per-bucket precompile warmup

    def __post_init__(self) -> None:
        _positive("max_model_len", self.max_model_len)
        if self.quantization not in (None, "fp8", "int8", "int4"):
            raise ValueError(f"Unknown quantization {self.quantization!r}")
        if self.tokenizer is None:
            self.tokenizer = self.model


@dataclass
class ParallelConfig:
    """Device-mesh layout: DP x PP x SP x TP (reference ``config.py:27-52``).

    The reference computes ``world_size = PP * TP * SP`` (reference
    ``config.py:41-48``); here the same product must equal the number of
    mesh devices.  Shift parallelism (reference ``model_runner.py:54-87``)
    runs the *same* weights under a second sharding where the sp and tp
    axes are fused into one tensor-parallel axis of size SP*TP.
    """

    tensor_parallel_size: int = 1
    ulysses_sequence_parallel_size: int = 1
    data_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    enable_shift_parallel: bool = False
    shift_parallel_threshold: int = 512      # tokens; <=: run full-TP program

    def __post_init__(self) -> None:
        _positive("tensor_parallel_size", self.tensor_parallel_size)
        _positive("ulysses_sequence_parallel_size",
                  self.ulysses_sequence_parallel_size)
        _positive("data_parallel_size", self.data_parallel_size)
        _positive("pipeline_parallel_size", self.pipeline_parallel_size)
        if self.enable_shift_parallel and \
                self.ulysses_sequence_parallel_size <= 1:
            # Mirrors the validation at reference config.py:34-38.
            raise ValueError(
                "enable_shift_parallel requires "
                "ulysses_sequence_parallel_size > 1")

    @property
    def world_size(self) -> int:
        return (self.pipeline_parallel_size * self.tensor_parallel_size *
                self.ulysses_sequence_parallel_size * self.data_parallel_size)

    @property
    def sp_tp_size(self) -> int:
        """Size of the fused tensor-parallel axis used in shift mode."""
        return (self.tensor_parallel_size *
                self.ulysses_sequence_parallel_size)


@dataclass
class CacheConfig:
    """Paged KV cache layout.

    ``kv_cache_dtype="fp8"`` stores K/V as float8_e4m3 with per-layer scales
    (the reference relies on vLLM fp8 kv + its bulk-write CUDA kernel,
    ``csrc/custom_ops/kernels.cu:15-69``; ours is a Pallas scatter-write).
    """

    block_size: int = 32                     # tokens per page (TPU-friendly)
    num_blocks: Optional[int] = None         # None => size from hbm budget
    hbm_utilization: float = 0.9
    kv_cache_dtype: str = "auto"             # auto | bfloat16 | fp8
    #: Automatic prefix caching (content-addressed full-block KV reuse
    #: across requests) — on by default, matching vLLM V1, which is
    #: where the reference inherits it from.
    enable_prefix_caching: bool = True

    def __post_init__(self) -> None:
        _positive("block_size", self.block_size)
        if self.kv_cache_dtype not in ("auto", "bfloat16", "fp8"):
            raise ValueError(
                f"Unknown kv_cache_dtype {self.kv_cache_dtype!r}")


@dataclass
class SchedulerConfig:
    """Continuous-batching limits (vLLM-v1-style token budget scheduler).

    ``async_scheduling`` pipelines engine steps: step N+1 is dispatched
    with device-side token passthrough before step N's results reach the
    host, hiding the host<->device round trip (it is disabled
    automatically when speculative decoding needs host-side drafts).
    """

    max_num_seqs: int = 64
    max_num_batched_tokens: int = 2048
    enable_chunked_prefill: bool = True
    async_scheduling: bool = True
    pipeline_depth: int = 2  # in-flight steps before forcing a sync

    def __post_init__(self) -> None:
        _positive("max_num_seqs", self.max_num_seqs)
        _positive("max_num_batched_tokens", self.max_num_batched_tokens)
        _positive("pipeline_depth", self.pipeline_depth)


@dataclass
class SpeculativeConfig:
    """Speculative decoding configuration.

    Defaults mirror reference ``ArcticSpeculativeConfig``
    (``config.py:56-62``): ``method`` is one of

    - ``"suffix"``          — suffix decoding only (num_speculative_tokens
                              defaults to ``suffix_cache_max_depth``,
                              reference ``config.py:98-102``)
    - ``"arctic"``          — Arctic MLP/LSTM speculator (draft model),
                              optionally combined with suffix decoding
    - ``"mlp_speculator"``  — alias accepted for compat
    """

    method: Optional[str] = None
    model: Optional[str] = None              # draft model path / name
    num_speculative_tokens: int = 3
    disable_by_batch_size: Optional[int] = 64  # reference config.py:93-96
    # Device-resident fused decode loop (engine/fused_decode.py): runs
    # verification + drafting inside the jitted step so speculative
    # decoding pipelines like greedy decoding.  Falls back automatically
    # for prefill/guided/logprobs steps.
    enable_fused_decode: bool = True
    # Per-step cap on suffix-path draft consumption inside the fused loop
    # (the uploaded path itself may be longer and spans multiple steps).
    # 7 keeps r = k+1 = 8 inside the small decode row bucket (qb=8); 8+
    # would bucket every fused step at 32 rows/seq — 4x the activation
    # memory and measurably slower on a 16 GB chip.
    fused_suffix_spec_len: int = 7
    # Weight quantization for the draft model (reference quantizes the
    # speculator LM head + embeddings with FP8, ``vllm/spec_dec/fp8.py``
    # ``Fp8ConfigWithEmbedding``).  The draft LM head [hidden, vocab]
    # dominates draft latency, so halving its HBM traffic matters.
    quantization: Optional[str] = None       # None | "fp8" | "int8"
    # Token-tree speculation (reference suffix_tree.cc:245-274 emits
    # best-first parent-linked trees): verify a branching draft tree in
    # one target pass via ancestor-masked attention.  Runs on the
    # synchronous engine path (accepted tokens are re-fed next step, so
    # the device-resident fused loop is disabled); single-chip,
    # non-SwiftKV models.
    use_tree_spec: bool = False
    # Suffix decoding knobs (reference config.py:56-62):
    enable_suffix_decoding: bool = False
    suffix_cache_max_depth: int = 64
    suffix_max_spec_factor: float = 1.0
    suffix_max_spec_offset: float = 0.0
    suffix_min_token_prob: float = 0.1

    def __post_init__(self) -> None:
        if self.method not in (None, "suffix", "arctic", "mlp_speculator",
                               "lstm_speculator"):
            raise ValueError(f"Unknown speculative method {self.method!r}")
        if self.method == "suffix":
            self.enable_suffix_decoding = True
            # Suffix drafts are variable-length up to tree depth.
            self.num_speculative_tokens = self.suffix_cache_max_depth
        if self.use_tree_spec:
            if self.method != "suffix":
                raise ValueError(
                    "use_tree_spec requires method='suffix' (the MLP/"
                    "LSTM drafters emit linear chains)")
            # Tree verify runs on the synchronous path: accepted tokens'
            # KV lives at scratch slots and is re-fed next step, which
            # the device-resident loop cannot mirror.
            self.enable_fused_decode = False
        if self.quantization not in (None, "fp8", "int8"):
            raise ValueError(
                f"Unknown speculator quantization {self.quantization!r} "
                "(int4's packed layout cannot be gathered for the draft "
                "embedding tables)")
        _positive("num_speculative_tokens", self.num_speculative_tokens)

    @classmethod
    def from_json(cls, text: str) -> "SpeculativeConfig":
        """Parse the reference's ``--speculative-config`` JSON dict."""
        return cls(**json.loads(text))


@dataclass
class ObservabilityConfig:
    collect_spec_metrics: bool = True
    log_interval_s: float = 10.0
    enable_profiling: bool = False
    profile_dir: Optional[str] = None


@dataclass
class EngineConfig:
    """Top-level configuration composed from the pieces above."""

    model: ModelConfig = field(default_factory=ModelConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    speculative: Optional[SpeculativeConfig] = None
    observability: ObservabilityConfig = field(
        default_factory=ObservabilityConfig)

    def __post_init__(self) -> None:
        if self.scheduler.max_num_batched_tokens < self.cache.block_size:
            raise ValueError(
                "max_num_batched_tokens must be >= cache block_size")

    def replace(self, **kwargs: Any) -> "EngineConfig":
        return dataclasses.replace(self, **kwargs)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "EngineConfig":
        spec = d.get("speculative")
        return cls(
            model=ModelConfig(**d.get("model", {})),
            parallel=ParallelConfig(**d.get("parallel", {})),
            cache=CacheConfig(**d.get("cache", {})),
            scheduler=SchedulerConfig(**d.get("scheduler", {})),
            speculative=SpeculativeConfig(**spec) if spec else None,
            observability=ObservabilityConfig(**d.get("observability", {})),
        )
