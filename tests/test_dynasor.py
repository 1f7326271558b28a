"""Dynasor tests: evaluator, certainty logic, proxy against a fake backend."""

import asyncio
import json

import pytest
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer

from arcticinference_tpu.dynasor import entropy, evaluator
from arcticinference_tpu.dynasor.proxy import DynasorProxy


class TestEvaluator:

    @pytest.mark.parametrize("a,b,eq", [
        ("42", "42", True),
        ("42", "42.0", True),
        ("1/2", "0.5", True),
        (r"\frac{1}{2}", "0.5", True),
        (r"\frac{3}{4}", "6/8", True),
        ("50%", "0.5", True),
        ("1,234", "1234", True),
        ("42", "43", False),
        ("x+1", "1+x", True),
        (r"2\pi", "2*pi", True),
        ("", "", True),
        (None, "5", False),
    ])
    def test_math_equal(self, a, b, eq):
        assert evaluator.math_equal(a, b) == eq

    def test_extract_boxed(self):
        assert evaluator.extract_boxed(r"so \boxed{42}") == "42"
        assert evaluator.extract_boxed(r"\boxed{\frac{1}{2}}") == \
            r"\frac{1}{2}"
        assert evaluator.extract_boxed("no box") is None
        # last box wins
        assert evaluator.extract_boxed(
            r"\boxed{1} then \boxed{2}") == "2"

    def test_extract_answer_fallback(self):
        assert evaluator.extract_answer("the answer is 7") == "7"
        assert evaluator.extract_answer(r"thus \boxed{9}") == "9"


class TestCertainty:

    def test_should_early_exit_agreement(self):
        answers = ["41", "42", "42"]
        texts = ["41}", "42}", "42}"]
        assert entropy.should_early_exit(answers, texts, window=2)
        assert not entropy.should_early_exit(answers, texts, window=3)

    def test_hedging_vetoes_exit(self):
        answers = ["42", "42"]
        texts = ["42} wait, but maybe", "42}"]
        assert not entropy.should_early_exit(answers, texts, window=2)

    def test_empty_answers_dont_exit(self):
        assert not entropy.should_early_exit([None, None], ["", ""], 2)

    def test_majority_and_entropy(self):
        answers = ["1/2", "0.5", "3"]
        assert evaluator.math_equal(
            entropy.majority_answer(answers), "0.5")
        assert entropy.answer_entropy(["5", "5", "5"]) == 0.0
        assert entropy.answer_entropy(["5", "6"]) > 0.0


class FakeBackend:
    """Streams a long fake CoT; probe requests return a fixed answer."""

    def __init__(self, cot_tokens=200, probe_answer="42"):
        self.cot_tokens = cot_tokens
        self.probe_answer = probe_answer
        self.probe_calls = 0
        self.app = web.Application()
        self.app.add_routes([web.post("/v1/completions", self.completions),
                             web.get("/health", self.health)])

    async def health(self, request):
        return web.json_response({"status": "ok"})

    async def completions(self, request):
        body = await request.json()
        if not body.get("stream"):
            # probe request
            self.probe_calls += 1
            return web.json_response({
                "choices": [{"text": self.probe_answer + "} done"}]})
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream"})
        await resp.prepare(request)
        for i in range(self.cot_tokens):
            payload = {"choices": [{"text": f" step{i}",
                                    "token_ids": [i]}]}
            await resp.write(f"data: {json.dumps(payload)}\n\n".encode())
            await asyncio.sleep(0)
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp


@pytest.fixture()
def loop():
    loop = asyncio.new_event_loop()
    yield loop
    loop.close()


def test_proxy_early_exit(loop):
    async def run():
        backend = FakeBackend(cot_tokens=500, probe_answer="42")
        bclient = TestClient(TestServer(backend.app))
        await bclient.start_server()
        burl = str(bclient.make_url("")).rstrip("/")

        proxy = DynasorProxy(burl, probe_interval=20, certainty_window=2)
        pclient = TestClient(TestServer(proxy.app))
        async with pclient:
            r = await pclient.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hard math"}],
                "max_tokens": 500,
            })
            data = await r.json()
        await bclient.close()
        assert data["dynasor"]["early_exit"] is True
        assert "\\boxed{42}" in data["choices"][0]["message"]["content"]
        # Early exit means far fewer than 500 steps streamed.
        assert data["choices"][0]["message"]["content"].count("step") < 400
        assert backend.probe_calls >= 2

    loop.run_until_complete(run())


def test_proxy_no_exit_when_uncertain(loop):
    async def run():
        backend = FakeBackend(cot_tokens=60, probe_answer="")
        bclient = TestClient(TestServer(backend.app))
        await bclient.start_server()
        burl = str(bclient.make_url("")).rstrip("/")
        proxy = DynasorProxy(burl, probe_interval=20, certainty_window=2)
        pclient = TestClient(TestServer(proxy.app))
        async with pclient:
            r = await pclient.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hard math"}]})
            data = await r.json()
        await bclient.close()
        assert data["dynasor"]["early_exit"] is False
        assert data["choices"][0]["message"]["content"].count("step") == 60

    loop.run_until_complete(run())


class TestMathEqualDepth:
    """Extended equivalence coverage (reference dynasor/evaluator.py
    handles these via its Qwen2.5-Math-derived checker)."""

    @pytest.mark.parametrize("a,b", [
        ("(1, 2)", "(1,2)"),
        ("(1/2, 3)", "(0.5, 3.0)"),
        ("[0, \\frac{1}{2}]", "[0, 0.5]"),
        ("x = 5", "5"),
        ("f(x)=2", "2"),
        ("1\\frac{1}{2}", "1.5"),
        ("2 \\pm \\sqrt{4}", "(0, 4)"),
        ("3 \\pm 1", "4"),
        ("Yes", "yes"),
        ("90^\\circ", "90"),
        ("50\\%", "0.5"),
    ])
    def test_equal(self, a, b):
        from arcticinference_tpu.dynasor.evaluator import math_equal
        assert math_equal(a, b), (a, b)

    @pytest.mark.parametrize("a,b", [
        ("(1, 2)", "(1, 3)"),
        ("(1, 2)", "(1, 2, 3)"),
        ("x = 5", "6"),
        ("3 \\pm 1", "5"),
        ("Yes", "No"),
        ("(1, 2)", "3"),
    ])
    def test_not_equal(self, a, b):
        from arcticinference_tpu.dynasor.evaluator import math_equal
        assert not math_equal(a, b), (a, b)


class TestMathEqualSymbolicDepth:
    """The capability depth the round-1 review flagged (reference
    math_equal handles symbolic forms, word numbers, matrices and
    percentage variants, ``dynasor/evaluator.py``)."""

    @pytest.mark.parametrize("a,b", [
        # symbolic equivalence (sympy-backed)
        ("\\frac{\\sqrt{2}}{2}", "\\frac{1}{\\sqrt{2}}"),
        ("\\frac{1}{\\sqrt{3}}", "\\frac{\\sqrt{3}}{3}"),
        ("2\\sqrt{2}", "\\sqrt{8}"),
        ("\\frac{6}{4}", "\\frac{3}{2}"),
        ("e^{2}", "e^2"),
        # english number words
        ("twenty-three", "23"),
        ("one hundred and five", "105"),
        ("two thousand", "2000"),
        # percentage variants (reference include_percentage)
        ("25", "0.25"),
        ("0.25", "25"),
        ("12.5\\%", "0.125"),
        # matrices
        ("\\begin{pmatrix}1&2\\\\3&4\\end{pmatrix}",
         "\\begin{bmatrix}1&2\\\\3&4\\end{bmatrix}"),
        ("\\begin{pmatrix}\\frac{1}{2}\\\\1\\end{pmatrix}",
         "\\begin{pmatrix}0.5\\\\1.0\\end{pmatrix}"),
        ("\\begin{pmatrix}1\\\\2\\end{pmatrix}", "(1, 2)"),
    ])
    def test_equal(self, a, b):
        from arcticinference_tpu.dynasor.evaluator import math_equal
        assert math_equal(a, b), (a, b)

    @pytest.mark.parametrize("a,b", [
        ("\\sqrt{2}", "2"),
        ("twenty-three", "24"),
        ("\\begin{pmatrix}1&2\\\\3&4\\end{pmatrix}",
         "\\begin{pmatrix}1&2\\\\3&5\\end{pmatrix}"),
        ("\\begin{pmatrix}1\\\\2\\end{pmatrix}", "(1, 2, 3)"),
        ("one hundred and five", "twenty"),
    ])
    def test_not_equal(self, a, b):
        from arcticinference_tpu.dynasor.evaluator import math_equal
        assert not math_equal(a, b), (a, b)
