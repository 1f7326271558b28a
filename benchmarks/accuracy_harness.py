"""lm_eval-style accuracy harness over offline task fixtures.

The reference scores serving configs with lm_eval (arc_challenge / gsm8k /
ifeval / mmlu_pro) plus a json-mode structured-output task against live
servers (reference ``tests/benchmarks/test_benchmarks.py:46-76,115-151``,
task defs ``benchmark_utils.py:99-151``).  This environment has no dataset
egress, so the harness is task-file driven: a task is a JSON document

    {"name": ..., "type": "multiple_choice" | "generate" | "json",
     "items": [...]}

with items (token-id based; a ``prompt`` string form works when the
client has a tokenizer):

- multiple_choice: {"prompt_token_ids", "choices_token_ids": [[...], ...],
  "answer": int} — scored by summed continuation logprob (lm_eval
  ``loglikelihood``), metric = accuracy.
- generate: {"prompt_token_ids", "expected_token_ids" | "expected_regex",
  "max_tokens"} — greedy generation, metric = match rate (token-prefix
  match or regex on text).
- json: {"prompt_token_ids", "schema"} — schema-guided generation,
  metric = conformance rate (parses as JSON + required keys typed).

Two clients: LocalClient wraps an in-process LLM; HTTPClient drives an
OpenAI-compatible server (scoring via ``echo`` prompt logprobs).
"""

from __future__ import annotations

import json
import re
import urllib.request
from dataclasses import dataclass
from typing import Any, Optional


@dataclass
class Task:
    name: str
    type: str
    items: list[dict]


def load_task(path) -> Task:
    d = json.loads(open(path).read())
    return Task(name=d["name"], type=d["type"], items=d["items"])


class LocalClient:
    """In-process engine client (fast path for CI)."""

    def __init__(self, llm):
        self.llm = llm

    def continuation_logprob(self, prompt_ids, cont_ids) -> float:
        lp = self.llm.score([list(prompt_ids) + list(cont_ids)])[0]
        return float(lp[len(prompt_ids) - 1:].sum())

    def generate(self, prompt_ids, max_tokens: int,
                 schema: Optional[dict] = None):
        from arcticinference_tpu.engine.request import SamplingParams

        guided = None
        if schema is not None:
            from arcticinference_tpu.serving.structured import (
                make_guided_decoder)
            guided = make_guided_decoder(
                self.llm.tokenizer, {"json": schema})
        sp = SamplingParams(max_tokens=max_tokens, ignore_eos=schema is
                            None, guided=guided)
        out = self.llm.generate(prompt_token_ids=[list(prompt_ids)],
                                sampling_params=sp)[0]
        return out.token_ids, out.text


class HTTPClient:
    """OpenAI-server client (the reference scores against live servers)."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def _post(self, body: dict) -> dict:
        req = urllib.request.Request(
            self.base_url + "/v1/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    def continuation_logprob(self, prompt_ids, cont_ids) -> float:
        full = list(prompt_ids) + list(cont_ids)
        resp = self._post({"prompt_token_ids": full, "echo": True,
                           "max_tokens": 0})
        lps = resp["choices"][0]["logprobs"]["token_logprobs"]
        return float(sum(lps[len(prompt_ids):]))

    def generate(self, prompt_ids, max_tokens: int,
                 schema: Optional[dict] = None):
        body: dict[str, Any] = {"prompt_token_ids": list(prompt_ids),
                                "max_tokens": max_tokens}
        if schema is not None:
            body["response_format"] = {
                "type": "json_schema",
                "json_schema": {"schema": schema}}
        else:
            body["ignore_eos"] = True
        resp = self._post(body)
        c = resp["choices"][0]
        return c.get("token_ids", []), c.get("text", "")


def _json_conforms(text: str, schema: dict) -> bool:
    try:
        obj = json.loads(text)
    except Exception:
        return False
    if schema.get("type") == "object":
        if not isinstance(obj, dict):
            return False
        props = schema.get("properties", {})
        for key in schema.get("required", []):
            if key not in obj:
                return False
            want = props.get(key, {}).get("type")
            if want == "integer" and not isinstance(obj[key], int):
                return False
            if want == "string" and not isinstance(obj[key], str):
                return False
            if want == "number" and not isinstance(obj[key],
                                                   (int, float)):
                return False
    return True


def run_task(client, task: Task) -> dict:
    """Score one task; returns {"task", "type", "metric", "value", "n"}."""
    n = len(task.items)
    if task.type == "multiple_choice":
        correct = 0
        for it in task.items:
            scores = [client.continuation_logprob(it["prompt_token_ids"],
                                                  c)
                      for c in it["choices_token_ids"]]
            if max(range(len(scores)), key=scores.__getitem__) == \
                    it["answer"]:
                correct += 1
        return dict(task=task.name, type=task.type, metric="accuracy",
                    value=correct / n, n=n)
    if task.type == "generate":
        hits = 0
        for it in task.items:
            toks, text = client.generate(it["prompt_token_ids"],
                                         it.get("max_tokens", 8))
            if "expected_token_ids" in it:
                want = it["expected_token_ids"]
                hits += toks[:len(want)] == list(want)
            else:
                hits += bool(re.search(it["expected_regex"], text or ""))
        return dict(task=task.name, type=task.type, metric="match",
                    value=hits / n, n=n)
    if task.type == "json":
        ok = 0
        for it in task.items:
            _, text = client.generate(it["prompt_token_ids"],
                                      it.get("max_tokens", 48),
                                      schema=it["schema"])
            ok += _json_conforms(text or "", it["schema"])
        return dict(task=task.name, type=task.type, metric="conformance",
                    value=ok / n, n=n)
    raise ValueError(f"unknown task type {task.type!r}")


def run_suite(clients: dict, tasks: list) -> "object":
    """Score every (config, task) pair into a pandas frame (the
    reference collects the same shape of summary,
    ``benchmark_utils.py:167-188``)."""
    import pandas as pd

    rows = []
    for cfg_name, client in clients.items():
        for task in tasks:
            r = run_task(client, task)
            r["config"] = cfg_name
            rows.append(r)
    return pd.DataFrame(rows).set_index(["config", "task"]).sort_index()
