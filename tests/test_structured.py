"""Structured-output (JSON mode) tests."""

import json

import numpy as np
import pytest

from arcticinference_tpu.engine.llm import LLM
from arcticinference_tpu.engine.request import SamplingParams
from arcticinference_tpu.serving.structured import (JsonGuidedDecoder,
                                                    JsonPrefixValidator)
from tests.test_engine import tiny_config


class TestJsonValidator:

    @pytest.mark.parametrize("text,ok,complete", [
        ('{"a": 1}', True, True),
        ('{"a": [1, 2, {"b": null}]}', True, True),
        ('  {"a": true} ', True, True),
        ('{"a": "he\\"llo"}', True, True),
        ('{"a": 1.5e-3}', True, True),
        ('{"a": ', True, False),
        ('{"a": 1', True, False),      # number may still extend
        ('[1, 2', True, False),
        ('{', True, False),
        ('{]', False, False),
        ('{"a" 1}', False, False),
        ('{"a": 1,}', False, False),
        ('tru', True, False),
        ('trux', False, False),
        ('{"a": 01}', True, True),     # lenient: leading zeros accepted
        ('}', False, False),
        ('"plain string"', True, True),
        ('42', True, False),           # could still extend (42.5)
    ])
    def test_prefixes(self, text, ok, complete):
        v = JsonPrefixValidator()
        assert v.feed(text) == ok, text
        if ok:
            assert v.complete == complete, text

    def test_done_rejects_more(self):
        v = JsonPrefixValidator()
        assert v.feed('{"a": 1}')
        assert not v.accepts("x")
        assert not v.accepts("{")

    def test_suggest_always_valid(self):
        for prefix in ('{', '{"a"', '{"a":', '{"a": 1', '[1,', '{"a": [',
                       '{"k'):
            v = JsonPrefixValidator()
            v.feed(prefix)
            s = v.suggest_char()
            assert s and v.accepts(s), (prefix, s)


class CharTokenizer:
    """ids are char codes — enough to drive guided decoding in tests."""

    def decode(self, ids, **kw):
        return "".join(chr(i) for i in ids)

    def encode(self, text, **kw):
        return [ord(c) for c in text]


class TestGuidedEngine:

    def test_engine_emits_valid_json(self):
        cfg = tiny_config(hf=dict(vocab_size=128))
        llm = LLM(cfg)
        guided = JsonGuidedDecoder(CharTokenizer())
        out = llm.generate(
            prompt_token_ids=[[3, 14, 15]],
            sampling_params=SamplingParams(max_tokens=40, guided=guided))
        text = "".join(chr(t) for t in out[0].token_ids)
        parsed = json.loads(text)  # must be valid JSON
        assert isinstance(parsed, (dict, list, str, int, float, bool)) \
            or parsed is None

    def test_guided_and_unguided_coexist(self):
        cfg = tiny_config(hf=dict(vocab_size=128))
        llm = LLM(cfg)
        guided = JsonGuidedDecoder(CharTokenizer())
        outs = llm.generate(
            prompt_token_ids=[[3, 14, 15], [5, 6, 7]],
            sampling_params=[
                SamplingParams(max_tokens=30, guided=guided),
                SamplingParams(max_tokens=10),
            ])
        json.loads("".join(chr(t) for t in outs[0].token_ids))
        assert len(outs[1].token_ids) == 10


class TestRegexGuided:

    def _dec(self, pattern):
        from arcticinference_tpu.serving.structured import RegexGuidedDecoder
        return RegexGuidedDecoder(CharTokenizer(), pattern)

    def test_prefix_acceptance(self):
        d = self._dec(r"[a-c]+\d\d")
        assert d.accepts_text("a")
        assert d.accepts_text("abcba")
        assert not d.accepts_text("z")
        d.feed_text("ab")
        assert d.accepts_text("c")
        assert d.accepts_text("1")
        assert not d.accepts_text("!")
        d.feed_text("12")
        assert d.finished()

    def test_engine_emits_matching_text(self):
        cfg = tiny_config(hf=dict(vocab_size=128))
        llm = LLM(cfg)
        import re
        pattern = r"(yes|no|maybe) ?(yes|no|maybe)?"
        d = self._dec(pattern)
        out = llm.generate(
            prompt_token_ids=[[3, 14, 15]],
            sampling_params=SamplingParams(max_tokens=30, guided=d))
        text = "".join(chr(t) for t in out[0].token_ids)
        assert re.fullmatch(pattern, text), text

    def test_fallback_probe(self):
        d = self._dec(r"\{x=\d+\}")
        d.feed_text("{x=")
        assert d.suggest_text() in "0123456789"


class TestChoiceGuided:

    def _dec(self, choices):
        from arcticinference_tpu.serving.structured import (
            ChoiceGuidedDecoder)
        return ChoiceGuidedDecoder(CharTokenizer(), choices)

    def test_prefix_logic(self):
        d = self._dec(["positive", "negative", "neutral"])
        assert d.accepts_text("p")
        assert d.accepts_text("ne")
        assert not d.accepts_text("x")
        d.feed_text("ne")
        assert d.accepts_text("g") and d.accepts_text("u")
        assert not d.accepts_text("p")
        d.feed_text("utral")
        assert d.finished()

    def test_longest_match_semantics(self):
        d = self._dec(["a", "ab"])
        d.feed_text("a")
        assert not d.finished()      # "ab" still extends
        d.feed_text("b")
        assert d.finished()

    def test_engine_emits_a_choice(self):
        cfg = tiny_config(hf=dict(vocab_size=128))
        llm = LLM(cfg)
        choices = ["red", "green", "blue"]
        d = self._dec(choices)
        out = llm.generate(
            prompt_token_ids=[[3, 14, 15]],
            sampling_params=SamplingParams(max_tokens=20, guided=d))
        text = "".join(chr(t) for t in out[0].token_ids)
        assert text in choices, text


class TestJsonSchemaGuided:

    def test_root_type_and_validation(self):
        from arcticinference_tpu.serving.structured import (
            JsonSchemaGuidedDecoder)
        schema = {"type": "object"}
        cfg = tiny_config(hf=dict(vocab_size=128))
        llm = LLM(cfg)
        d = JsonSchemaGuidedDecoder(CharTokenizer(), schema)
        out = llm.generate(
            prompt_token_ids=[[3, 14, 15]],
            sampling_params=SamplingParams(max_tokens=120, guided=d))
        text = "".join(chr(t) for t in out[0].token_ids)
        # Root type forced by the schema; prefix always stays valid.
        assert text.lstrip()[0] == "{", text
        assert not d.validator.dead
        if d.finished():   # budget permitting, the doc completed
            parsed = json.loads(text)
            assert isinstance(parsed, dict), text
            assert d.schema_ok is True

    def test_schema_validation_flags_mismatch(self):
        from arcticinference_tpu.serving.structured import (
            JsonSchemaGuidedDecoder)
        d = JsonSchemaGuidedDecoder(
            CharTokenizer(), {"type": "object",
                              "required": ["name"],
                              "properties": {"name": {"type": "string"}}})
        for ch in '{"a": 1}':
            d.advance_token(ord(ch))
        assert d.finished()
        assert d.schema_ok is False   # "name" missing

    def test_schema_validation_accepts_match(self):
        from arcticinference_tpu.serving.structured import (
            JsonSchemaGuidedDecoder)
        d = JsonSchemaGuidedDecoder(
            CharTokenizer(), {"type": "object", "required": ["a"]})
        for ch in '{"a": 1}':
            d.advance_token(ord(ch))
        assert d.finished()
        assert d.schema_ok is True


class TestFactory:

    def test_make_guided_decoder(self):
        from arcticinference_tpu.serving.structured import (
            ChoiceGuidedDecoder, JsonGuidedDecoder, JsonSchemaGuidedDecoder,
            RegexGuidedDecoder, make_guided_decoder)
        tok = CharTokenizer()
        assert isinstance(make_guided_decoder(tok, {"json": True}),
                          JsonGuidedDecoder)
        assert isinstance(make_guided_decoder(tok, {"json": {"type": "object"}}),
                          JsonSchemaGuidedDecoder)
        assert isinstance(make_guided_decoder(tok, {"regex": "a+"}),
                          RegexGuidedDecoder)
        assert isinstance(make_guided_decoder(tok, {"choice": ["a"]}),
                          ChoiceGuidedDecoder)
        d = make_guided_decoder(tok, {"choice": ["a"]})
        assert make_guided_decoder(tok, d) is d
        with pytest.raises(ValueError):
            make_guided_decoder(tok, {"nope": 1})
