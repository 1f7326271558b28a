"""DFA-compiled guided decoding: compiler, native sweeper, device masks.

Layers under test (reference parity: vLLM's xgrammar/outlines token-
bitmask guided decoding, exercised by the reference's ``test_json_mode``
benchmark at ``tests/benchmarks/test_benchmarks.py:46-76``):

1. ``regex_dfa.compile_dfa`` differential vs the ``regex`` module's
   partial matching (liveness + accept at every prefix).
2. ``csrc/token_dfa.cc`` trie sweeper vs the pure-Python twin.
3. ``ops.sampling.apply_vocab_mask``: exact renormalised constrained
   sampling (disallowed tokens never sampled, allowed ratios preserved).
4. Engine end-to-end: adversarial random-weight model at high
   temperature emits schema-conforming JSON through the device-mask
   path (the host top-K path would have to fall back constantly here).
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arcticinference_tpu.serving.guided_dfa import (DfaGuidedDecoder,
                                                    TokenDfaIndex,
                                                    VocabCodepoints,
                                                    compile_guided_dfa)
from arcticinference_tpu.serving.regex_dfa import (UnsupportedRegex,
                                                   compile_dfa)
from arcticinference_tpu.serving.schema_regex import schema_to_regex

regex_mod = pytest.importorskip("regex")


SCHEMAS = [
    {"type": "object",
     "properties": {"a": {"type": "integer"},
                    "b": {"type": "boolean"}},
     "required": ["a", "b"]},
    {"type": "object",
     "properties": {"name": {"type": "string", "maxLength": 8},
                    "tags": {"type": "array",
                             "items": {"enum": ["x", "y"]},
                             "maxItems": 3}},
     "required": ["name"]},
    {"type": "array", "items": {"type": "number"}, "minItems": 1,
     "maxItems": 4},
    {"enum": ["red", "green", "blue", 17, None]},
]


class ByteTokenizer:
    """ids 0..127 are char codes; a few multi-char merges on top."""

    MERGES = ['{"', '":', '", "', "true", "false", "null", '"}',
              "12", "3.5", '{"a": ', '"b": ']

    def __init__(self):
        self.vocab = [chr(i) for i in range(128)] + self.MERGES

    def __len__(self):
        return len(self.vocab)

    def decode(self, ids, **kw):
        return "".join(self.vocab[i] for i in ids)

    def encode(self, text, **kw):
        return [ord(c) for c in text]


class TestCompileDfa:

    @pytest.mark.parametrize("schema", SCHEMAS,
                             ids=[f"schema{i}" for i in range(len(SCHEMAS))])
    def test_differential_vs_regex_partial(self, schema):
        pat = schema_to_regex(schema)
        dfa = compile_dfa(pat)
        cre = regex_mod.compile(pat)
        rng = np.random.default_rng(0)
        alphabet = list('abxy {}[]":,.0123456789truefalsn-+eE\n\t"')
        for _ in range(200):
            n = int(rng.integers(0, 24))
            s = "".join(rng.choice(alphabet, n))
            st = dfa.start
            for i, ch in enumerate(s):
                st = dfa.step(st, ord(ch))
                pref = s[: i + 1]
                assert (st >= 0) == bool(
                    cre.fullmatch(pref, partial=True)), (pat, pref)
                assert dfa.is_accept(st) == bool(
                    cre.fullmatch(pref)), (pat, pref)
                if st < 0:
                    break

    def test_walks_conforming_documents(self):
        docs = ['{"a": -12, "b": true}', '{ "a": 0, "b": false }']
        pat = schema_to_regex(SCHEMAS[0])
        dfa = compile_dfa(pat)
        for doc in docs:
            st = dfa.walk(dfa.start, doc)
            assert dfa.is_accept(st), doc
        assert dfa.walk(dfa.start, '{"b": true}') == -1   # a required first

    def test_unsupported_constructs_raise(self):
        for pat in (r"(a)\1", r"a(?=b)", r"\bword\b", r"a^b"):
            with pytest.raises(UnsupportedRegex):
                compile_dfa(pat)

    def test_quantifier_blowup_capped(self):
        with pytest.raises(UnsupportedRegex):
            compile_dfa(r"(?:ab{0,900}){0,900}c", max_nfa=5000)

    def test_open_min_quantifier(self):
        """'{,n}' is the {0,n} quantifier in re/regex, not a literal."""
        dfa = compile_dfa(r"a{,3}b")
        for text, ok in (("b", True), ("ab", True), ("aaab", True),
                         ("aaaab", False), ("a{,3}b", False)):
            st = dfa.walk(dfa.start, text)
            assert (st >= 0 and dfa.is_accept(st)) == ok, text
        # '{,}' is the {0,inf} quantifier too (== '*').
        dfa = compile_dfa(r"a{,}b")
        for text, ok in (("b", True), ("aaaaab", True),
                         ("a{,}b", False)):
            st = dfa.walk(dfa.start, text)
            assert (st >= 0 and dfa.is_accept(st)) == ok, text

    def test_reversed_quantifier_bounds_rejected(self):
        # re/regex raise on 'a{3,1}'; compiling it as anything would
        # enforce the wrong language, so it must leave the subset.
        with pytest.raises(UnsupportedRegex):
            compile_dfa(r"a{3,1}")

    def test_literal_brace_still_literal(self):
        dfa = compile_dfa(r"a{b}")
        st = dfa.walk(dfa.start, "a{b}")
        assert dfa.is_accept(st)


class TestTokenSweep:

    def _index_pair(self, pattern):
        tok = ByteTokenizer()
        vc = VocabCodepoints(tok, len(tok))
        dfa = compile_dfa(pattern)
        native = TokenDfaIndex(dfa, vc)
        python = TokenDfaIndex(dfa, vc, force_python=True)
        return tok, native, python

    def test_native_matches_python_twin(self):
        tok, native, python = self._index_pair(
            schema_to_regex(SCHEMAS[0]))
        if native._handle is None:
            pytest.skip("no native toolchain")
        frontier, seen = [native.dfa.start], set()
        while frontier and len(seen) < 200:
            s = frontier.pop()
            if s in seen:
                continue
            seen.add(s)
            assert (native.mask(s) == python.mask(s)).all(), s
            for t in range(len(tok)):
                ns = native.advance(s, t)
                assert ns == python.advance(s, t), (s, t)
                if ns >= 0 and ns not in seen:
                    frontier.append(ns)
        assert len(seen) > 5

    def test_mask_semantics_oracle(self):
        """Bit t set iff walking token t's text stays alive; zero-length
        tokens are never allowed."""
        tok, native, _ = self._index_pair(r'\{"a": (?:12)+\}')
        idx = native
        dfa = idx.dfa
        cre = regex_mod.compile(r'\{"a": (?:12)+\}')
        state = dfa.start
        consumed = ""
        for step_text in ['{"a": ', "1"]:
            m = idx.mask(state)
            for t in range(len(tok)):
                text = tok.vocab[t]
                bit = bool((m[t >> 5] >> (t & 31)) & 1)
                if not text:
                    assert not bit
                    continue
                want = bool(cre.fullmatch(consumed + text, partial=True))
                assert bit == want, (consumed, repr(text))
            state = idx.advance(
                state, tok.vocab.index(step_text)
                if step_text in tok.vocab else ord(step_text[0]))
            consumed += step_text if step_text in tok.vocab \
                else step_text[0]


class TestApplyVocabMask:

    def test_disallowed_never_sampled_allowed_renormalised(self):
        from arcticinference_tpu.ops.sampling import (apply_vocab_mask,
                                                      sample)

        v = 40
        rng = np.random.default_rng(3)
        logits = jnp.asarray(rng.normal(0, 1, (2, v)), jnp.float32)
        mask = np.zeros((1, (v + 31) // 32), np.uint32)
        allowed = [1, 7, 33]
        for t in allowed:
            mask[0, t >> 5] |= np.uint32(1 << (t & 31))
        rows = jnp.asarray([1], jnp.int32)
        out = apply_vocab_mask(logits, rows,
                               jnp.asarray(mask.view(np.int32)))
        out_np = np.asarray(out)
        # row 0 untouched; row 1 masked
        np.testing.assert_array_equal(out_np[0], np.asarray(logits)[0])
        dis = sorted(set(range(v)) - set(allowed))
        assert (out_np[1, dis] <= np.finfo(np.float32).min).all()
        np.testing.assert_array_equal(out_np[1, allowed],
                                      np.asarray(logits)[1, allowed])

        # Sampling from the masked logits only ever yields allowed ids,
        # with frequencies matching the renormalised distribution.
        temp = jnp.ones(2, jnp.float32)
        zk = jnp.zeros(2, jnp.int32)
        op = jnp.ones(2, jnp.float32)
        zp = jnp.zeros(2, jnp.float32)
        seeds = jnp.full(2, -1, jnp.int32)
        counts = {t: 0 for t in allowed}
        n_trials = 400
        for i in range(n_trials):
            s = sample(out, temp, zk, op, jax.random.PRNGKey(i),
                       min_p=zp, seeds=seeds, counters=zk)
            tokid = int(np.asarray(s)[1])
            assert tokid in counts, tokid
            counts[tokid] += 1
        probs = np.exp(np.asarray(logits)[1, allowed])
        probs /= probs.sum()
        freqs = np.asarray([counts[t] for t in allowed], float) / n_trials
        np.testing.assert_allclose(freqs, probs, atol=0.08)

    def test_padding_row_dropped(self):
        from arcticinference_tpu.ops.sampling import apply_vocab_mask

        logits = jnp.zeros((3, 33), jnp.float32)
        mask = jnp.zeros((2, 2), jnp.int32)
        rows = jnp.asarray([-1, 2], jnp.int32)
        out = np.asarray(apply_vocab_mask(logits, rows, mask))
        np.testing.assert_array_equal(out[0], 0)   # -1 pad: untouched
        assert (out[2] <= np.finfo(np.float32).min).all()


class TestFactory:

    def test_dfa_selected_for_compilable_specs(self):
        from arcticinference_tpu.serving.structured import (
            make_guided_decoder)

        tok = ByteTokenizer()
        for spec in ({"regex": "ab+c"},
                     {"choice": ["alpha", "beta"]},
                     {"json": SCHEMAS[0]}):
            d = make_guided_decoder(tok, spec)
            assert isinstance(d, DfaGuidedDecoder), spec

    def test_disable_flag_falls_back(self, monkeypatch):
        from arcticinference_tpu.serving.structured import (
            RegexGuidedDecoder, make_guided_decoder)

        monkeypatch.setenv("ARCTIC_TPU_DISABLE_GUIDED_DFA", "1")
        d = make_guided_decoder(ByteTokenizer(), {"regex": "ab+c"})
        assert isinstance(d, RegexGuidedDecoder)

    def test_uncompilable_pattern_falls_back(self):
        from arcticinference_tpu.serving.structured import (
            RegexGuidedDecoder, make_guided_decoder)

        d = make_guided_decoder(ByteTokenizer(), {"regex": r"a(?=b)c"})
        assert isinstance(d, RegexGuidedDecoder)

    def test_plain_json_keeps_pushdown(self):
        from arcticinference_tpu.serving.structured import (
            JsonGuidedDecoder, make_guided_decoder)

        d = make_guided_decoder(ByteTokenizer(), {"json": True})
        assert isinstance(d, JsonGuidedDecoder)

    def test_vocab_disjoint_grammar_falls_back(self):
        """Grammar whose alphabet lies outside the model vocab must NOT
        take the mask path (it would dead-end into an empty output);
        the partial-match decoder forces tokens host-side instead."""
        from arcticinference_tpu.serving.structured import (
            ChoiceGuidedDecoder, RegexGuidedDecoder, make_guided_decoder)

        tok = ByteTokenizer()
        # Model logits narrower than the grammar's alphabet: 'a' = 97.
        d = make_guided_decoder(tok, {"choice": ["alpha", "beta"]},
                                vocab_size=97)
        assert isinstance(d, ChoiceGuidedDecoder)
        d = make_guided_decoder(tok, {"regex": r"id-\d+"}, vocab_size=60)
        assert isinstance(d, RegexGuidedDecoder)

    def test_token_dead_ends_detection(self):
        tok = ByteTokenizer()
        # Full vocab: every needed char is a token -> no dead ends.
        idx = compile_guided_dfa(tok, len(tok), "abc")
        assert not idx.token_dead_ends()
        # vocab_size=98 keeps 'a'(97) but loses 'b'(98): the state after
        # consuming 'a' has an empty allowed set.
        idx = compile_guided_dfa(tok, 98, "abc")
        assert idx.token_dead_ends()


class TestEngineEndToEnd:

    def _run(self, schema, temperature, seed=0, vocab=139):
        from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                                ModelConfig,
                                                SchedulerConfig)
        from arcticinference_tpu.engine.llm import LLM
        from arcticinference_tpu.engine.request import SamplingParams

        tok = ByteTokenizer()
        assert len(tok) == vocab
        idx = compile_guided_dfa(tok, vocab, schema_to_regex(schema))
        guided = DfaGuidedDecoder(idx, schema=schema)
        cfg = EngineConfig(
            model=ModelConfig(model="llama",
                              hf_overrides=dict(
                                  vocab_size=vocab, hidden_size=64,
                                  intermediate_size=128,
                                  num_hidden_layers=2,
                                  num_attention_heads=4,
                                  num_key_value_heads=4, head_dim=16),
                              max_model_len=256, dtype="float32"),
            cache=CacheConfig(block_size=8, num_blocks=64),
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=64))
        llm = LLM(cfg)
        # The device mask must constrain sampling; the host-side rescue
        # paths existing for degraded states must stay cold.
        def _no_fallback():
            raise AssertionError("fallback_token called: device mask "
                                 "was not applied")
        guided.fallback_token = _no_fallback
        out = llm.generate(
            prompt_token_ids=[[3, 14, 15, 9, 26]],
            sampling_params=SamplingParams(
                max_tokens=120, temperature=temperature, seed=seed,
                guided=guided))
        text = "".join(tok.vocab[t] for t in out[0].token_ids)
        return guided, text

    def test_adversarial_high_temperature_conforms(self):
        # Random weights + temperature 1.5: an unconstrained model emits
        # grammar-valid top-16 candidates essentially never, so this
        # passing proves the device-applied mask constrained every
        # sampling step (not host-side candidate filtering).
        guided, text = self._run(SCHEMAS[0], temperature=1.5)
        doc = json.loads(text)
        assert set(doc) == {"a", "b"}
        assert isinstance(doc["a"], int)
        assert isinstance(doc["b"], bool)
        assert guided.schema_ok is True

    def test_greedy_conforms(self):
        # Bounded grammar (enum): greedy argmax under the mask must land
        # exactly on one of the fixed literals.  (Unbounded grammars can
        # legitimately absorb the whole token budget — e.g. an integer
        # field growing one digit per step — and finish length-stopped.)
        guided, text = self._run(SCHEMAS[3], temperature=0.0)
        assert json.loads(text) in ["red", "green", "blue", 17, None]

    def test_unbounded_grammar_can_length_stop(self):
        # Number arrays may consume every token; the engine must stop at
        # max_tokens with the grammar still live rather than wedging.
        guided, text = self._run(SCHEMAS[2], temperature=0.8, seed=5)
        try:
            doc = json.loads(text)
            assert isinstance(doc, list)
        except json.JSONDecodeError:
            assert not guided.finished()   # honest length truncation

    def test_guided_rides_pipeline_and_matches_sync(self):
        """Device-resident grammar state: guided requests run on the
        pipelined path (no per-step host feedback), and with per-request
        seeds the pipelined output is bit-identical to the synchronous
        device-mask path."""
        from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                                ModelConfig,
                                                SchedulerConfig)
        from arcticinference_tpu.engine.llm import LLM
        from arcticinference_tpu.engine.request import SamplingParams

        tok = ByteTokenizer()
        schema = SCHEMAS[0]

        def run(async_sched: bool):
            idx = compile_guided_dfa(tok, 139, schema_to_regex(schema))
            guided = DfaGuidedDecoder(idx, schema=schema)
            cfg = EngineConfig(
                model=ModelConfig(model="llama",
                                  hf_overrides=dict(
                                      vocab_size=139, hidden_size=64,
                                      intermediate_size=128,
                                      num_hidden_layers=2,
                                      num_attention_heads=4,
                                      num_key_value_heads=4, head_dim=16),
                                  max_model_len=256, dtype="float32"),
                cache=CacheConfig(block_size=8, num_blocks=64),
                scheduler=SchedulerConfig(max_num_seqs=4,
                                          max_num_batched_tokens=64,
                                          async_scheduling=async_sched))
            llm = LLM(cfg)
            out = llm.generate(
                prompt_token_ids=[[3, 14, 15]],
                sampling_params=SamplingParams(
                    max_tokens=100, temperature=1.2, seed=11,
                    guided=guided))
            kinds = dict(llm.engine.step_times._counts)
            return out[0].token_ids, kinds, guided

        toks_pipe, kinds_pipe, g_pipe = run(True)
        toks_sync, kinds_sync, _ = run(False)
        assert kinds_pipe.get("pipelined", 0) > 0, kinds_pipe
        assert kinds_sync.get("pipelined", 0) == 0, kinds_sync
        assert toks_pipe == toks_sync
        doc = json.loads("".join(ByteTokenizer().vocab[t]
                                 for t in toks_pipe))
        assert set(doc) == {"a", "b"}
        assert g_pipe.schema_ok is True

    def test_guided_on_tp_sp_mesh(self):
        """Device masks + device-resident grammar state compose with the
        sharded step (tp x sp mesh on the virtual CPU devices): output
        conforms and matches the single-chip run bit-for-bit."""
        from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                                ModelConfig,
                                                ParallelConfig,
                                                SchedulerConfig)
        from arcticinference_tpu.engine.llm import LLM
        from arcticinference_tpu.engine.request import SamplingParams

        tok = ByteTokenizer()
        schema = SCHEMAS[0]

        def run(par):
            idx = compile_guided_dfa(tok, 139, schema_to_regex(schema))
            guided = DfaGuidedDecoder(idx, schema=schema)
            cfg = EngineConfig(
                model=ModelConfig(model="llama",
                                  hf_overrides=dict(
                                      vocab_size=139, hidden_size=64,
                                      intermediate_size=128,
                                      num_hidden_layers=2,
                                      num_attention_heads=8,
                                      num_key_value_heads=8, head_dim=8),
                                  max_model_len=256, dtype="float32"),
                cache=CacheConfig(block_size=8, num_blocks=64),
                scheduler=SchedulerConfig(max_num_seqs=4,
                                          max_num_batched_tokens=64),
                parallel=par or ParallelConfig())
            llm = LLM(cfg)
            out = llm.generate(
                prompt_token_ids=[[3, 14, 15]],
                sampling_params=SamplingParams(
                    max_tokens=60, temperature=1.0, seed=4,
                    guided=guided))
            return out[0].token_ids, llm.engine.step_times._counts

        toks_mesh, kinds = run(ParallelConfig(
            tensor_parallel_size=2, ulysses_sequence_parallel_size=2))
        toks_single, _ = run(None)
        text = "".join(ByteTokenizer().vocab[t] for t in toks_mesh)
        doc = json.loads(text)
        assert set(doc) == {"a", "b"}
        assert kinds.get("pipelined", 0) > 0, kinds
        assert toks_mesh == toks_single

    def test_n_greater_one_clones_decoder(self):
        """Offline n>1 fan-out: each child gets its own automaton state
        and every completion conforms independently."""
        from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                                ModelConfig,
                                                SchedulerConfig)
        from arcticinference_tpu.engine.llm import LLM
        from arcticinference_tpu.engine.request import SamplingParams

        tok = ByteTokenizer()
        schema = SCHEMAS[3]
        idx = compile_guided_dfa(tok, 139, schema_to_regex(schema))
        cfg = EngineConfig(
            model=ModelConfig(model="llama",
                              hf_overrides=dict(
                                  vocab_size=139, hidden_size=64,
                                  intermediate_size=128,
                                  num_hidden_layers=2,
                                  num_attention_heads=4,
                                  num_key_value_heads=4, head_dim=16),
                              max_model_len=256, dtype="float32"),
            cache=CacheConfig(block_size=8, num_blocks=64),
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=64))
        llm = LLM(cfg)
        outs = llm.generate(
            prompt_token_ids=[[3, 14, 15]],
            sampling_params=SamplingParams(
                max_tokens=40, temperature=1.0, seed=3, n=3,
                guided=DfaGuidedDecoder(idx, schema=schema)))
        assert len(outs) == 3
        for o in outs:
            text = "".join(tok.vocab[t] for t in o.token_ids)
            assert json.loads(text) in ["red", "green", "blue", 17, None]

    def test_pool_overflow_falls_back_to_sync(self, monkeypatch):
        """More distinct grammars than device pool slots: the engine
        falls back to the synchronous host-mask path and stays correct."""
        from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                                ModelConfig,
                                                SchedulerConfig)
        from arcticinference_tpu.engine.llm import LLM
        from arcticinference_tpu.engine.request import SamplingParams
        from arcticinference_tpu.engine.runner import ModelRunner

        monkeypatch.setattr(ModelRunner, "GUIDED_POOL_SLOTS", 1)
        tok = ByteTokenizer()
        cfg = EngineConfig(
            model=ModelConfig(model="llama",
                              hf_overrides=dict(
                                  vocab_size=139, hidden_size=64,
                                  intermediate_size=128,
                                  num_hidden_layers=2,
                                  num_attention_heads=4,
                                  num_key_value_heads=4, head_dim=16),
                              max_model_len=256, dtype="float32"),
            cache=CacheConfig(block_size=8, num_blocks=64),
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=64))
        llm = LLM(cfg)
        eng = llm.engine
        for i, schema in enumerate((SCHEMAS[0], SCHEMAS[3])):
            idx = compile_guided_dfa(tok, 139, schema_to_regex(schema))
            eng.add_request(
                f"o{i}", [3 + i, 14],
                SamplingParams(max_tokens=80, temperature=1.0, seed=i,
                               guided=DfaGuidedDecoder(idx,
                                                       schema=schema)))
        outs = {}
        while eng.has_unfinished:
            for r in eng.step():
                outs[r.req_id] = "".join(tok.vocab[t]
                                         for t in r.output_token_ids)
        # While both grammars live the engine must fall back to sync
        # (pool can hold only one); once a request finishes it may
        # resume pipelining for the survivor.
        assert eng.step_times._counts.get("sync", 0) > 0
        assert set(json.loads(outs["o0"])) == {"a", "b"}
        assert json.loads(outs["o1"]) in ["red", "green", "blue", 17,
                                          None]

    def test_multiple_guided_requests_batched(self):
        from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                                ModelConfig,
                                                SchedulerConfig)
        from arcticinference_tpu.engine.llm import LLM
        from arcticinference_tpu.engine.request import SamplingParams

        tok = ByteTokenizer()
        cfg = EngineConfig(
            model=ModelConfig(model="llama",
                              hf_overrides=dict(
                                  vocab_size=139, hidden_size=64,
                                  intermediate_size=128,
                                  num_hidden_layers=2,
                                  num_attention_heads=4,
                                  num_key_value_heads=4, head_dim=16),
                              max_model_len=256, dtype="float32"),
            cache=CacheConfig(block_size=8, num_blocks=64),
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=64))
        llm = LLM(cfg)
        eng = llm.engine
        schemas = [SCHEMAS[0], SCHEMAS[3]]
        decoders = []
        for i, schema in enumerate(schemas):
            idx = compile_guided_dfa(tok, 139, schema_to_regex(schema))
            d = DfaGuidedDecoder(idx, schema=schema)
            decoders.append(d)
            eng.add_request(
                f"g{i}", [3 + i, 14, 15],
                SamplingParams(max_tokens=80, temperature=1.0,
                               seed=i, guided=d))
        outs = {}
        while eng.has_unfinished:
            for r in eng.step():
                outs[r.req_id] = "".join(tok.vocab[t]
                                         for t in r.output_token_ids)
        doc0 = json.loads(outs["g0"])
        assert set(doc0) == {"a", "b"}
        assert json.loads(outs["g1"]) in ["red", "green", "blue", 17,
                                          None]


class TestGuidedUnderDP:

    def test_guided_masks_on_dp_mesh(self):
        """In-engine dp: the host-mask guided path ships device-applied
        vocab bitmasks through the dp layout (applied to the logits
        outside shard_map); output conforms and matches single-chip."""
        from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                                ModelConfig,
                                                ParallelConfig,
                                                SchedulerConfig)
        from arcticinference_tpu.engine.llm import LLM
        from arcticinference_tpu.engine.request import SamplingParams

        tok = ByteTokenizer()
        schema = SCHEMAS[0]

        def run(par):
            idx = compile_guided_dfa(tok, 139, schema_to_regex(schema))
            cfg = EngineConfig(
                model=ModelConfig(model="llama",
                                  hf_overrides=dict(
                                      vocab_size=139, hidden_size=64,
                                      intermediate_size=128,
                                      num_hidden_layers=2,
                                      num_attention_heads=8,
                                      num_key_value_heads=8, head_dim=8),
                                  max_model_len=256, dtype="float32"),
                cache=CacheConfig(block_size=8, num_blocks=64),
                scheduler=SchedulerConfig(max_num_seqs=4,
                                          max_num_batched_tokens=64),
                parallel=par or ParallelConfig())
            llm = LLM(cfg)
            out = llm.generate(
                prompt_token_ids=[[3, 14, 15], [7, 9]],
                sampling_params=[SamplingParams(
                    max_tokens=60, temperature=1.0, seed=4,
                    guided=DfaGuidedDecoder(idx, schema=schema)),
                    SamplingParams(max_tokens=10, ignore_eos=True)])
            return [o.token_ids for o in out]

        dp_toks = run(ParallelConfig(data_parallel_size=2,
                                     tensor_parallel_size=2))
        single = run(None)
        text = "".join(ByteTokenizer().vocab[t] for t in dp_toks[0])
        doc = json.loads(text)
        assert set(doc) == {"a", "b"}
        assert dp_toks == single


class TestGuidedDevicePoolUnderDP:

    def test_device_pool_pipelined_on_dp_mesh(self):
        """In-engine dp now carries the DEVICE-resident guided pool
        (round-4 item): the grammar state advances on device and rides
        the async pipeline — zero per-step host mask computation — and
        the output matches the single-chip device path exactly."""
        from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                                ModelConfig,
                                                ParallelConfig,
                                                SchedulerConfig)
        from arcticinference_tpu.engine.llm import LLM
        from arcticinference_tpu.engine.request import SamplingParams

        tok = ByteTokenizer()
        schema = SCHEMAS[0]

        def run(par):
            idx = compile_guided_dfa(tok, 139, schema_to_regex(schema))
            cfg = EngineConfig(
                model=ModelConfig(model="llama",
                                  hf_overrides=dict(
                                      vocab_size=139, hidden_size=64,
                                      intermediate_size=128,
                                      num_hidden_layers=2,
                                      num_attention_heads=8,
                                      num_key_value_heads=8, head_dim=8),
                                  max_model_len=256, dtype="float32"),
                cache=CacheConfig(block_size=8, num_blocks=64),
                scheduler=SchedulerConfig(max_num_seqs=4,
                                          max_num_batched_tokens=64,
                                          async_scheduling=True),
                parallel=par or ParallelConfig())
            llm = LLM(cfg)
            eng = llm.engine
            assert eng.runner.guided_device_ok
            dec = DfaGuidedDecoder(idx, schema=schema)
            assert eng.runner.guided_fits_pool(dec.index)
            out = llm.generate(
                prompt_token_ids=[[3, 14, 15], [7, 9]],
                sampling_params=[SamplingParams(
                    max_tokens=60, temperature=1.0, seed=4, guided=dec),
                    SamplingParams(max_tokens=10, ignore_eos=True)])
            # The device pool actually engaged: tables uploaded and the
            # sync-forcing predicate never saw a reason to bail.
            assert eng._guided_slots, "device pool never engaged"
            assert eng.runner._guided_pool is not None
            return [o.token_ids for o in out]

        dp_toks = run(ParallelConfig(data_parallel_size=2,
                                     tensor_parallel_size=2))
        single = run(None)
        text = "".join(ByteTokenizer().vocab[t] for t in dp_toks[0])
        doc = json.loads(text)
        assert set(doc) == {"a", "b"}
        assert dp_toks == single
