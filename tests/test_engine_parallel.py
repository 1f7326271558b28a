"""Engine-level SPMD tests: the full engine on a CPU mesh must reproduce
single-chip outputs, including per-step shift<->SP mode switching."""

import numpy as np
import pytest

from arcticinference_tpu.config import ParallelConfig
from arcticinference_tpu.engine.llm import LLM
from arcticinference_tpu.engine.request import SamplingParams
from tests.test_engine import tiny_config

PROMPTS = [[3, 14, 15, 92, 65, 35, 89, 79], [27, 18, 28, 18]]

# Enough kv heads to shard over sp*tp <= 8.
PAR_HF = dict(num_attention_heads=8, num_key_value_heads=8, head_dim=8)


@pytest.fixture(scope="module")
def single_outputs():
    llm = LLM(tiny_config(hf=dict(PAR_HF)))
    return llm.generate(prompt_token_ids=PROMPTS,
                        sampling_params=SamplingParams(max_tokens=10))


def _parallel_cfg(**kw):
    cfg = tiny_config(hf=dict(PAR_HF))
    return cfg.replace(parallel=ParallelConfig(**kw))


@pytest.mark.parametrize("tp,sp", [(2, 1), (2, 2), (1, 4)])
def test_engine_tp_sp_matches_single(single_outputs, tp, sp):
    cfg = _parallel_cfg(tensor_parallel_size=tp,
                        ulysses_sequence_parallel_size=sp)
    llm = LLM(cfg)
    assert llm.engine.runner.mesh is not None
    outs = llm.generate(prompt_token_ids=PROMPTS,
                        sampling_params=SamplingParams(max_tokens=10))
    for o, ref in zip(outs, single_outputs):
        assert o.token_ids == ref.token_ids


def test_engine_shift_parallel_switching(single_outputs):
    """Threshold between decode batch size and prefill size: prefill runs
    the SP program, decode runs the full-TP shift program, sharing KV."""
    cfg = _parallel_cfg(tensor_parallel_size=2,
                        ulysses_sequence_parallel_size=2,
                        enable_shift_parallel=True,
                        shift_parallel_threshold=4)
    llm = LLM(cfg)
    outs = llm.generate(prompt_token_ids=PROMPTS,
                        sampling_params=SamplingParams(max_tokens=10))
    for o, ref in zip(outs, single_outputs):
        assert o.token_ids == ref.token_ids
    # Both programs were actually compiled & used.
    modes = {k[3] for k in llm.engine.runner._step_fns}
    assert {"sp", "shift"} <= modes


def test_engine_parallel_suffix_decoding(single_outputs):
    from arcticinference_tpu.config import SpeculativeConfig

    cfg = tiny_config(speculative=SpeculativeConfig(method="suffix"),
                      hf=dict(PAR_HF))
    cfg = cfg.replace(parallel=ParallelConfig(
        tensor_parallel_size=2, ulysses_sequence_parallel_size=2,
        enable_shift_parallel=True, shift_parallel_threshold=16))
    llm = LLM(cfg)
    outs = llm.generate(prompt_token_ids=PROMPTS,
                        sampling_params=SamplingParams(max_tokens=10))
    for o, ref in zip(outs, single_outputs):
        assert o.token_ids == ref.token_ids


@pytest.mark.parametrize("tp,sp,hkv", [(2, 2, 2), (1, 4, 2), (2, 4, 2)])
def test_engine_gqa_kv_replication(single_outputs_gqa, tp, sp, hkv):
    """num_kv_heads < sp*tp: kv heads replicate across the fused axis."""
    cfg = tiny_config(hf=dict(num_attention_heads=8,
                              num_key_value_heads=hkv, head_dim=8))
    cfg = cfg.replace(parallel=ParallelConfig(
        tensor_parallel_size=tp, ulysses_sequence_parallel_size=sp))
    llm = LLM(cfg)
    outs = llm.generate(prompt_token_ids=PROMPTS,
                        sampling_params=SamplingParams(max_tokens=10))
    for o, ref in zip(outs, single_outputs_gqa):
        assert o.token_ids == ref.token_ids


@pytest.fixture(scope="module")
def single_outputs_gqa():
    llm = LLM(tiny_config(hf=dict(num_attention_heads=8,
                                  num_key_value_heads=2, head_dim=8)))
    return llm.generate(prompt_token_ids=PROMPTS,
                        sampling_params=SamplingParams(max_tokens=10))


def test_engine_gqa_replication_with_shift(single_outputs_gqa):
    cfg = tiny_config(hf=dict(num_attention_heads=8,
                              num_key_value_heads=2, head_dim=8))
    cfg = cfg.replace(parallel=ParallelConfig(
        tensor_parallel_size=2, ulysses_sequence_parallel_size=2,
        enable_shift_parallel=True, shift_parallel_threshold=4))
    llm = LLM(cfg)
    outs = llm.generate(prompt_token_ids=PROMPTS,
                        sampling_params=SamplingParams(max_tokens=10))
    for o, ref in zip(outs, single_outputs_gqa):
        assert o.token_ids == ref.token_ids
    modes = {k[3] for k in llm.engine.runner._step_fns}
    assert {"sp", "shift"} <= modes


class TestShardedSwiftKV:

    SWIFT_HF = dict(num_attention_heads=8, num_key_value_heads=8,
                    head_dim=8, num_key_value_layers=1,
                    num_hidden_layers=2)

    def _cfg(self, parallel=None):
        cfg = tiny_config(hf=dict(self.SWIFT_HF))
        cfg.model.model = "llama_swiftkv"
        if parallel:
            cfg = cfg.replace(parallel=parallel)
        return cfg

    @pytest.fixture(scope="class")
    def single(self):
        llm = LLM(self._cfg())
        return llm.generate(prompt_token_ids=PROMPTS,
                            sampling_params=SamplingParams(max_tokens=10))

    @pytest.mark.parametrize("tp,sp,shift", [
        (2, 1, False), (2, 2, False), (1, 4, False), (2, 2, True)])
    def test_sharded_matches_single(self, single, tp, sp, shift):
        cfg = self._cfg(ParallelConfig(
            tensor_parallel_size=tp, ulysses_sequence_parallel_size=sp,
            enable_shift_parallel=shift,
            shift_parallel_threshold=4 if shift else 512))
        llm = LLM(cfg)
        outs = llm.generate(prompt_token_ids=PROMPTS,
                            sampling_params=SamplingParams(max_tokens=10))
        for o, ref in zip(outs, single):
            assert o.token_ids == ref.token_ids

    GQA_HF = dict(num_attention_heads=8, num_key_value_heads=2,
                  head_dim=8, num_key_value_layers=1,
                  num_hidden_layers=2)

    def _gqa_cfg(self, parallel=None):
        cfg = tiny_config(hf=dict(self.GQA_HF))
        cfg.model.model = "llama_swiftkv"
        if parallel:
            cfg = cfg.replace(parallel=parallel)
        return cfg

    @pytest.fixture(scope="class")
    def single_gqa(self):
        llm = LLM(self._gqa_cfg())
        return llm.generate(prompt_token_ids=PROMPTS,
                            sampling_params=SamplingParams(max_tokens=10))

    @pytest.mark.parametrize("tp,sp,shift", [
        (2, 2, False), (1, 4, False), (2, 4, False), (2, 2, True)])
    def test_swiftkv_kv_replication(self, single_gqa, tp, sp, shift):
        """SwiftKV second half under kv-head replication: the fused
        shards sharing a head project identical replicas (head-granular
        slice of wk/wv_swift)."""
        cfg = self._gqa_cfg(ParallelConfig(
            tensor_parallel_size=tp, ulysses_sequence_parallel_size=sp,
            enable_shift_parallel=shift,
            shift_parallel_threshold=4 if shift else 512))
        llm = LLM(cfg)
        outs = llm.generate(prompt_token_ids=PROMPTS,
                            sampling_params=SamplingParams(max_tokens=10))
        for o, ref in zip(outs, single_gqa):
            assert o.token_ids == ref.token_ids


class TestInt8OnMesh:
    """int8 per-out-channel scales shard with the weight's out axis and
    re-slice under shift mode; outputs must match single-chip int8."""

    LAYOUTS = [dict(tensor_parallel_size=2),
               dict(ulysses_sequence_parallel_size=2,
                    tensor_parallel_size=2),
               dict(ulysses_sequence_parallel_size=2,
                    tensor_parallel_size=2, enable_shift_parallel=True,
                    shift_parallel_threshold=8),
               dict(pipeline_parallel_size=2, tensor_parallel_size=2)]

    @pytest.mark.parametrize("layout", LAYOUTS)
    def test_matches_single_chip(self, layout):
        from arcticinference_tpu.config import ParallelConfig

        hf = dict(num_hidden_layers=4, num_attention_heads=8,
                  num_key_value_heads=8, head_dim=8)
        prompts = [[3, 14, 15, 92, 65, 35], [27, 18, 28, 18]]
        sp = SamplingParams(max_tokens=10)
        ref = LLM(tiny_config(hf=hf, model_kw=dict(
            quantization="int8"))).generate(prompt_token_ids=prompts,
                                            sampling_params=sp)
        cfg = tiny_config(hf=hf, model_kw=dict(quantization="int8"))
        cfg = cfg.replace(parallel=ParallelConfig(**layout))
        llm = LLM(cfg)
        # The per-channel scale actually sharded over tp (not replicated).
        wq = llm.engine.runner.params["layers"]["wq"]
        if "pipeline_parallel_size" not in layout:
            assert wq.scale.sharding.spec[-1] == "tp"
            assert (wq.scale.addressable_shards[0].data.shape[-1]
                    == wq.scale.shape[-1] // 2)
        outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp)
        for o, r in zip(outs, ref):
            assert o.token_ids == r.token_ids

    def test_int4_mesh_rejected(self):
        from arcticinference_tpu.config import ParallelConfig

        cfg = tiny_config(model_kw=dict(quantization="int4"))
        cfg = cfg.replace(parallel=ParallelConfig(tensor_parallel_size=2))
        with pytest.raises(NotImplementedError, match="int4"):
            LLM(cfg)


class TestInEngineDP:
    """In-engine data parallelism: the token batch is dp-sharded inside
    ONE program (per-shard block spaces, schedules and attention), not
    routed replicas — round-2 item; outputs must match single-chip
    exactly."""

    def _run(self, single_outputs, **par):
        cfg = _parallel_cfg(**par)
        llm = LLM(cfg)
        eng = llm.engine
        assert eng.runner.dp == par["data_parallel_size"]
        reqs = [eng.add_request(f"r{i}", p, SamplingParams(max_tokens=10))
                for i, p in enumerate(PROMPTS)]
        done = {}
        steps = 0
        while eng.has_unfinished:
            steps += 1
            assert steps < 200
            for r in eng.step():
                done[r.req_id] = r.output_token_ids
        shards = {r.dp_shard for r in reqs}
        for i, ref in enumerate(single_outputs):
            assert done[f"r{i}"] == ref.token_ids, i
        return shards

    def test_dp2_tp2_matches_single(self, single_outputs):
        shards = self._run(single_outputs, data_parallel_size=2,
                           tensor_parallel_size=2)
        assert shards == {0, 1}   # both dp groups actually decoded

    def test_dp2_sp2_matches_single(self, single_outputs):
        shards = self._run(single_outputs, data_parallel_size=2,
                           ulysses_sequence_parallel_size=2)
        assert shards == {0, 1}

    def test_dp4_matches_single(self, single_outputs):
        self._run(single_outputs, data_parallel_size=4,
                  tensor_parallel_size=2)

    def test_dp_shift_matches_single(self, single_outputs):
        self._run(single_outputs, data_parallel_size=2,
                  tensor_parallel_size=1,
                  ulysses_sequence_parallel_size=2,
                  enable_shift_parallel=True,
                  shift_parallel_threshold=4)


class TestDPFusedSpec:
    """In-engine DP composed with the device-resident fused spec loop
    (round-3 item): dp-major slots, shard-local block tables, spec
    verify through the dp-sharded forward."""

    def _run(self, single_outputs, spec, **par):
        cfg = tiny_config(hf=dict(PAR_HF), speculative=spec)
        cfg = cfg.replace(parallel=ParallelConfig(**par))
        llm = LLM(cfg)
        eng = llm.engine
        outs = llm.generate(prompt_token_ids=PROMPTS,
                            sampling_params=SamplingParams(max_tokens=10))
        for o, ref in zip(outs, single_outputs):
            assert o.token_ids == ref.token_ids
        return eng

    def test_dp2_tp2_fused_arctic(self, single_outputs):
        from arcticinference_tpu.config import SpeculativeConfig

        spec = SpeculativeConfig(method="arctic",
                                 num_speculative_tokens=3,
                                 enable_fused_decode=True)
        eng = self._run(single_outputs, spec, data_parallel_size=2,
                        tensor_parallel_size=2)
        # The fused loop actually drafted (device-side, across shards).
        assert eng.spec_stats.num_drafts > 0
        assert eng._fused is not None

    def test_dp2_sp2_fused_suffix(self, single_outputs):
        from arcticinference_tpu.config import SpeculativeConfig

        spec = SpeculativeConfig(method="suffix",
                                 suffix_cache_max_depth=32,
                                 enable_fused_decode=True)
        eng = self._run(single_outputs, spec, data_parallel_size=2,
                        ulysses_sequence_parallel_size=2)
        assert eng._fused is not None


class TestDPSwiftKV:
    """In-engine DP composed with SwiftKV (round-3 item): the token-drop
    gather and the second (sample-row) attention schedule are per-dp-
    group; outputs must match the single-chip SwiftKV engine exactly."""

    SWIFT_HF = dict(num_attention_heads=8, num_key_value_heads=8,
                    head_dim=8, num_hidden_layers=4,
                    num_key_value_layers=2)

    def _swift_cfg(self, **par):
        import dataclasses

        cfg = tiny_config(hf=dict(self.SWIFT_HF))
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, model="llama_swiftkv"))
        if par:
            cfg = cfg.replace(parallel=ParallelConfig(**par))
        return cfg

    @pytest.fixture(scope="class")
    def swift_single(self):
        llm = LLM(self._swift_cfg())
        return llm.generate(prompt_token_ids=PROMPTS,
                            sampling_params=SamplingParams(max_tokens=10))

    def test_dp2_tp2_swiftkv_matches_single(self, swift_single):
        llm = LLM(self._swift_cfg(data_parallel_size=2,
                                  tensor_parallel_size=2))
        outs = llm.generate(prompt_token_ids=PROMPTS,
                            sampling_params=SamplingParams(max_tokens=10))
        for o, ref in zip(outs, swift_single):
            assert o.token_ids == ref.token_ids

    def test_dp2_sp2_shift_swiftkv_matches_single(self, swift_single):
        llm = LLM(self._swift_cfg(data_parallel_size=2,
                                  ulysses_sequence_parallel_size=2,
                                  enable_shift_parallel=True,
                                  shift_parallel_threshold=4))
        outs = llm.generate(prompt_token_ids=PROMPTS,
                            sampling_params=SamplingParams(max_tokens=10))
        for o, ref in zip(outs, swift_single):
            assert o.token_ids == ref.token_ids


def test_dp_swiftkv_fused_spec_matches_single():
    """The triple composition: in-engine dp x SwiftKV x fused spec loop
    (review finding: the fused step's token-drop gather must use
    group-local indices under dp)."""
    import dataclasses

    from arcticinference_tpu.config import SpeculativeConfig

    hf = dict(num_attention_heads=8, num_key_value_heads=8, head_dim=8,
              num_hidden_layers=4, num_key_value_layers=2)

    def cfg(par=None, spec=None):
        c = tiny_config(hf=dict(hf), speculative=spec)
        c = c.replace(model=dataclasses.replace(c.model,
                                                model="llama_swiftkv"))
        if par:
            c = c.replace(parallel=par)
        return c

    want = [o.token_ids for o in LLM(cfg()).generate(
        prompt_token_ids=PROMPTS,
        sampling_params=SamplingParams(max_tokens=10))]
    spec = SpeculativeConfig(method="arctic", num_speculative_tokens=3,
                             enable_fused_decode=True)
    llm = LLM(cfg(par=ParallelConfig(data_parallel_size=2,
                                     tensor_parallel_size=2),
                  spec=spec))
    got = [o.token_ids for o in llm.generate(
        prompt_token_ids=PROMPTS,
        sampling_params=SamplingParams(max_tokens=10))]
    assert got == want
    assert llm.engine.spec_stats.num_drafts > 0


class TestFusedWeightsOnMesh:
    """fuse_params composes with tp / sp / shift (round-5 item 6): the
    fused wqkv / w_gateup columns are interleaved per fused shard
    (ops/fp8.fuse_quantized interleave) so the contiguous tp split and
    the shift re-slice each hand a device exactly its [q_f|k_f|v_f]
    segment — engine outputs must equal the single-chip (also fused)
    run AND the unfused mesh run exactly."""

    CASES = {
        "tp2": dict(tensor_parallel_size=2),
        "sp2": dict(ulysses_sequence_parallel_size=2),
        "tp2_sp2": dict(tensor_parallel_size=2,
                        ulysses_sequence_parallel_size=2),
        "shift": dict(tensor_parallel_size=2,
                      ulysses_sequence_parallel_size=2,
                      enable_shift_parallel=True,
                      shift_parallel_threshold=4),
    }

    @pytest.mark.parametrize("case", list(CASES))
    def test_fused_matches_unfused_on_mesh(self, case, single_outputs,
                                           monkeypatch):
        cfg = _parallel_cfg(**self.CASES[case])
        llm = LLM(cfg)
        layers = llm.engine.runner.params["layers"]
        assert "wqkv" in layers and "w_gateup" in layers, \
            "fusion must engage on this mesh"
        outs = llm.generate(prompt_token_ids=PROMPTS,
                            sampling_params=SamplingParams(max_tokens=10))
        for o, ref in zip(outs, single_outputs):
            assert o.token_ids == ref.token_ids
        if case == "shift":  # both programs compiled & used
            modes = {k[3] for k in llm.engine.runner._step_fns}
            assert {"sp", "shift"} <= modes
        monkeypatch.setenv("ARCTIC_TPU_DISABLE_FUSED_WEIGHTS", "1")
        llm_u = LLM(cfg)
        assert "wqkv" not in llm_u.engine.runner.params["layers"]
        outs_u = llm_u.generate(
            prompt_token_ids=PROMPTS,
            sampling_params=SamplingParams(max_tokens=10))
        for o, ref in zip(outs, outs_u):
            assert o.token_ids == ref.token_ids

    def test_gqa_replication_gates_fusion_off(self):
        """num_kv_heads < tp*sp (head-granular kv re-slice) cannot reach
        inside a fused wqkv: the runner must keep the unfused layout and
        still match single-chip (covered by the existing GQA tests)."""
        cfg = tiny_config(hf=dict(num_attention_heads=8,
                                  num_key_value_heads=2, head_dim=8))
        cfg = cfg.replace(parallel=ParallelConfig(
            tensor_parallel_size=2, ulysses_sequence_parallel_size=2,
            enable_shift_parallel=True, shift_parallel_threshold=4))
        llm = LLM(cfg)
        assert "wqkv" not in llm.engine.runner.params["layers"]

    def test_int8_fused_on_mesh_matches_single(self):
        """Quantized fusion on a mesh: per-out-channel int8 scales ride
        the interleaved column order and the tp split."""
        import dataclasses
        base = tiny_config(hf=dict(PAR_HF))
        base = base.replace(model=dataclasses.replace(
            base.model, quantization="int8"))
        want = [o.token_ids for o in LLM(base).generate(
            prompt_token_ids=PROMPTS,
            sampling_params=SamplingParams(max_tokens=10))]
        cfg = base.replace(parallel=ParallelConfig(
            tensor_parallel_size=2, ulysses_sequence_parallel_size=2,
            enable_shift_parallel=True, shift_parallel_threshold=4))
        llm = LLM(cfg)
        layers = llm.engine.runner.params["layers"]
        assert "wqkv" in layers
        got = [o.token_ids for o in llm.generate(
            prompt_token_ids=PROMPTS,
            sampling_params=SamplingParams(max_tokens=10))]
        assert got == want
