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


class TestSchemaRegex:
    """schema_to_regex compiler: language must equal the conforming set."""

    def _pat(self, schema):
        import regex
        from arcticinference_tpu.serving.schema_regex import schema_to_regex
        return regex.compile(schema_to_regex(schema))

    @pytest.mark.parametrize("schema,pos,neg", [
        ({"type": "object",
          "properties": {"name": {"type": "string"},
                         "age": {"type": "integer"}},
          "required": ["name", "age"]},
         ['{"name": "bob", "age": 3}', '{ "name": "x",\n"age": 42 }'],
         ['{"age": 3, "name": "bob"}', '{"name": "bob"}',
          '{"name": 1, "age": 3}']),
        # optional property before a required one
        ({"type": "object",
          "properties": {"a": {"type": "integer"},
                         "b": {"type": "boolean"}},
          "required": ["b"]},
         ['{"b": true}', '{"a": 1, "b": false}'],
         ['{"a": 1}', '{}', '{"b": 1}']),
        # everything optional (empty object legal)
        ({"type": "object",
          "properties": {"a": {"type": "integer"},
                         "b": {"type": "boolean"}},
          "required": []},
         ['{}', '{"a": 1}', '{"b": true}', '{"a": 2, "b": false}'],
         ['{"b": true, "a": 1}', '{"a": true}']),
        ({"enum": ["red", "green", 3, None]},
         ['"red"', '"green"', '3', 'null'], ['"blue"', '4']),
        ({"type": "array", "items": {"type": "integer"},
          "minItems": 2, "maxItems": 3},
         ['[1, 2]', '[1,2,3]'], ['[1]', '[1,2,3,4]', '["a","b"]']),
        ({"type": "string", "minLength": 2, "maxLength": 4},
         ['"ab"', '"abcd"'], ['"a"', '"abcde"']),
        ({"type": "string", "pattern": "^[A-Z]{2}-\\d+$"},
         ['"AB-12"'], ['"ab-12"', '"AB-"']),
        ({"anyOf": [{"type": "integer"}, {"type": "null"}]},
         ['7', 'null'], ['"x"', 'true']),
        ({"type": ["integer", "boolean"]}, ['5', 'true'], ['null', '"x"']),
        # $defs reference, nested objects
        ({"type": "object", "properties": {"p": {"$ref": "#/$defs/pt"}},
          "required": ["p"],
          "$defs": {"pt": {"type": "object",
                           "properties": {"x": {"type": "number"}},
                           "required": ["x"]}}},
         ['{"p": {"x": 1.5}}'], ['{"p": {"x": "a"}}', '{"p": {}}']),
        ({"type": "object",
          "properties": {"t": {"const": "fixed"},
                         "v": {"type": "number"}}},
         ['{"t": "fixed", "v": -2.5e3}'], ['{"t": "other", "v": 1}']),
        # free-form object
        ({"type": "object"},
         ['{}', '{"k": [1, {"z": null}]}'], ['[]']),
        ({"type": "object",
          "properties": {"a": {"prefixItems": [{"type": "integer"},
                                               {"type": "boolean"}]}},
          "required": ["a"]},
         ['{"a": [1, true]}'], ['{"a": [1]}', '{"a": [true, 1]}']),
    ])
    def test_language(self, schema, pos, neg):
        pat = self._pat(schema)
        for p in pos:
            assert pat.fullmatch(p), (schema, p)
            # every prefix must stay partial-matchable (decodability)
            for i in range(1, len(p)):
                assert pat.fullmatch(p[:i], partial=True), (schema, p[:i])
        for n in neg:
            assert not pat.fullmatch(n), (schema, n)

    def test_unsupported_raises(self):
        from arcticinference_tpu.serving.schema_regex import (
            UnsupportedSchema, schema_to_regex)
        with pytest.raises(UnsupportedSchema):
            schema_to_regex({"type": "object", "required": ["ghost"]})
        with pytest.raises(UnsupportedSchema):
            schema_to_regex({"allOf": [{"type": "integer"},
                                       {"minimum": 3}]})


class TestSchemaEnforcement:
    """Per-token schema enforcement in the engine (vLLM guided-json /
    reference test_json_mode parity)."""

    SCHEMA = {"type": "object",
              "properties": {"name": {"type": "string", "maxLength": 8},
                             "score": {"type": "integer"},
                             "tag": {"enum": ["x", "y"]}},
              "required": ["name", "score", "tag"]}

    def test_engine_emits_conforming_doc(self):
        from arcticinference_tpu.serving.structured import (
            JsonSchemaGuidedDecoder)
        cfg = tiny_config(hf=dict(vocab_size=128))
        llm = LLM(cfg)
        d = JsonSchemaGuidedDecoder(CharTokenizer(), self.SCHEMA)
        assert d._re is not None   # schema compiled
        out = llm.generate(
            prompt_token_ids=[[3, 14, 15]],
            sampling_params=SamplingParams(max_tokens=100, guided=d))
        text = "".join(chr(t) for t in out[0].token_ids)
        assert d.finished(), text
        assert d.schema_ok is True
        import jsonschema
        jsonschema.validate(json.loads(text), self.SCHEMA)

    def test_per_token_filtering(self):
        from arcticinference_tpu.serving.structured import (
            JsonSchemaGuidedDecoder)
        d = JsonSchemaGuidedDecoder(CharTokenizer(), self.SCHEMA)
        # Only tokens on the grammar are allowed at each point.
        assert d.allows_token(ord("{"))
        assert not d.allows_token(ord("["))
        d.advance_token(ord("{"))
        assert d.allows_token(ord('"'))
        assert not d.allows_token(ord("}"))   # required props missing
        for ch in '"name": "a", "score": -12, "tag": "':
            assert d.allows_token(ord(ch)), ch
            d.advance_token(ord(ch))
        assert d.allows_token(ord("x")) and d.allows_token(ord("y"))
        assert not d.allows_token(ord("z"))
        for ch in 'x"}':
            d.advance_token(ord(ch))
        assert d.finished()
        assert d.schema_ok is True
        assert not d.allows_token(ord(" "))   # doc complete: nothing more

    def test_force_feed_degrades_not_wedges(self):
        from arcticinference_tpu.serving.structured import (
            JsonSchemaGuidedDecoder)
        d = JsonSchemaGuidedDecoder(CharTokenizer(), self.SCHEMA)
        for ch in '{"a": 1}':    # off-grammar tokens forced in
            d.advance_token(ord(ch))
        assert d.finished()
        assert d.schema_ok is False

    def test_root_scalar_completion(self):
        from arcticinference_tpu.serving.structured import (
            JsonSchemaGuidedDecoder)
        d = JsonSchemaGuidedDecoder(CharTokenizer(), {"type": "integer"})
        d.advance_token(ord("4"))
        d.advance_token(ord("2"))
        # "42" fully matches (and could extend) — completion must be
        # detected even though a syntactic validator can't know.
        assert d.finished()
        assert d.schema_ok is True

    def test_fallback_token_stays_on_grammar(self):
        from arcticinference_tpu.serving.structured import (
            JsonSchemaGuidedDecoder)
        d = JsonSchemaGuidedDecoder(CharTokenizer(), self.SCHEMA)
        while not d.finished():
            tok = d.fallback_token()
            assert tok is not None
            assert d.allows_token(tok)
            d.advance_token(tok)
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
