import pytest

from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                        ModelConfig, ParallelConfig,
                                        SchedulerConfig, SpeculativeConfig)


def test_world_size_product():
    p = ParallelConfig(tensor_parallel_size=2,
                       ulysses_sequence_parallel_size=4,
                       data_parallel_size=1)
    assert p.world_size == 8
    assert p.sp_tp_size == 8


def test_shift_requires_sp():
    with pytest.raises(ValueError):
        ParallelConfig(enable_shift_parallel=True,
                       ulysses_sequence_parallel_size=1)


def test_suffix_method_expands_spec_tokens():
    s = SpeculativeConfig(method="suffix", suffix_cache_max_depth=32)
    assert s.enable_suffix_decoding
    assert s.num_speculative_tokens == 32


def test_speculative_from_json():
    s = SpeculativeConfig.from_json(
        '{"method": "suffix", "suffix_max_spec_factor": 2.0}')
    assert s.method == "suffix"
    assert s.suffix_max_spec_factor == 2.0


def test_engine_config_roundtrip():
    cfg = EngineConfig(
        model=ModelConfig(model="llama", max_model_len=1024),
        parallel=ParallelConfig(tensor_parallel_size=2,
                                ulysses_sequence_parallel_size=2,
                                enable_shift_parallel=True),
        cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=8),
        speculative=SpeculativeConfig(method="arctic"),
    )
    again = EngineConfig.from_dict(cfg.to_dict())
    assert again == cfg


def test_invalid_quantization():
    with pytest.raises(ValueError):
        ModelConfig(quantization="awq")
    for ok in ("fp8", "int8", "int4"):
        assert ModelConfig(quantization=ok).quantization == ok


def test_kv_dtype_validation():
    with pytest.raises(ValueError):
        CacheConfig(kv_cache_dtype="fp16")
