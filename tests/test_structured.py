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
