"""Suffix simulator tests (host only, no accelerator)."""

from arcticinference_tpu.spec.simulator import simulate


def test_repetitive_responses_accelerate():
    # Second identical response should draft almost entirely from the
    # first one via the global tree.
    prompt = list(range(100, 120))
    response = [1, 2, 3, 4, 5] * 8
    res = simulate([(prompt, response), (prompt, response)],
                   max_depth=32, max_spec_tokens=8, max_spec_factor=4.0)
    s = res.summary()
    per = res.per_request()
    assert per[1]["est_speedup"] > per[0]["est_speedup"]
    assert per[1]["est_speedup"] > 2.0
    assert s["total_tokens"] == 80


def test_random_responses_no_benefit():
    import random

    rng = random.Random(0)
    rows = [([rng.randrange(1000) for _ in range(20)],
             [rng.randrange(1000) for _ in range(30)])
            for _ in range(3)]
    res = simulate(rows, max_depth=16)
    # Unpredictable tokens: speedup stays near 1.
    assert res.summary()["est_speedup"] < 1.5


def test_prompt_echo_is_fast():
    # A response that copies its prompt drafts from the prompt tree.
    prompt = list(range(50))
    response = list(range(50))
    res = simulate([(prompt, response)], max_depth=64,
                   max_spec_tokens=16, max_spec_factor=8.0)
    assert res.per_request()[0]["est_speedup"] > 3.0
