"""Suffix tree & cache tests.

Strategy (beyond the reference's, which has no suffix-tree unit tests): the
native C++ tree and the pure-Python twin are verified against each other and
against a brute-force n-gram oracle on random corpora.
"""

import random

import pytest

from arcticinference_tpu.spec.suffix_tree import (SuffixTree, _PySuffixTree,
                                                  _load_native)
from arcticinference_tpu.spec.suffix_cache import SuffixCache


def brute_force_path(corpus: list[list[int]], pattern: list[int],
                     max_depth: int, max_spec: int, factor: float,
                     offset: float, min_prob: float):
    """Oracle: greedy continuation from raw window-suffix statistics.

    Considers every suffix of `pattern` (up to max_depth); extends greedily by
    the most frequent next token among corpus windows matching the context,
    with context capped to the last `max_depth` tokens seen (matching the
    sliding-window semantics of the online tree).
    """
    best = ([], 0.0, 0)

    def count_continuations(ctx):
        counts = {}
        for seq in corpus:
            L = len(ctx)
            for i in range(len(seq) - L):
                # Window constraint: a suffix indexed by the tree never spans
                # more than max_depth tokens.
                if L >= max_depth:
                    break
                if seq[i:i + L] == ctx:
                    nxt = seq[i + L]
                    counts[nxt] = counts.get(nxt, 0) + 1
        return counts

    for s in range(max(0, len(pattern) - max_depth), len(pattern)):
        ctx = pattern[s:]
        match_len = len(ctx)
        budget = min(max_spec, int(match_len * factor + offset + 1e-6))
        toks, probs = [], []
        p = 1.0
        cur = list(ctx)
        while len(toks) < budget and p >= min_prob:
            counts = count_continuations(cur)
            if not counts:
                break
            total = sum(counts.values())
            tok, hits = max(counts.items(), key=lambda kv: kv[1])
            p *= hits / total
            if p < min_prob and not toks:
                pass
            toks.append(tok)
            probs.append(p)
            cur = (cur + [tok])[-(max_depth - 1):]
        score = sum(probs)
        if score > best[1]:
            best = (toks, score, match_len)
    return best


@pytest.fixture(params=["native", "python"])
def tree_impl(request):
    if request.param == "native":
        if _load_native() is None:
            pytest.skip("native suffix tree unavailable")
        return False  # force_python
    return True


class TestSuffixTree:

    def test_empty_speculate(self, tree_impl):
        t = SuffixTree(8, force_python=tree_impl)
        cand = t.speculate([1, 2, 3], 4)
        assert cand.token_ids == []
        assert cand.score == 0.0

    def test_exact_repeat(self, tree_impl):
        t = SuffixTree(16, force_python=tree_impl)
        seq = [1, 2, 3, 4, 5, 1, 2, 3, 4, 5]
        t.extend(0, seq)
        cand = t.speculate([1, 2, 3], 4, max_spec_factor=10.0)
        assert cand.token_ids[:2] == [4, 5]
        assert cand.probs[0] == pytest.approx(1.0)
        assert cand.match_len >= 3

    def test_num_seqs(self, tree_impl):
        t = SuffixTree(8, force_python=tree_impl)
        t.extend(0, [1, 2])
        t.extend(7, [3, 4])
        assert t.num_seqs() == 2

    def test_spec_budget_respected(self, tree_impl):
        t = SuffixTree(32, force_python=tree_impl)
        t.extend(0, list(range(20)) * 3)
        cand = t.speculate(
            [0, 1, 2], 5, max_spec_factor=100.0, min_token_prob=0.0)
        assert len(cand.token_ids) <= 5

    def test_max_spec_factor_limits_budget(self, tree_impl):
        t = SuffixTree(32, force_python=tree_impl)
        t.extend(0, list(range(20)) * 3)
        # match_len = 1 and factor = 1 -> at most 1 speculated token.
        cand = t.speculate([7], 10, max_spec_factor=1.0, min_token_prob=0.0)
        assert len(cand.token_ids) <= 1

    def test_tree_spec_has_parent_links(self, tree_impl):
        t = SuffixTree(16, force_python=tree_impl)
        # Two divergent continuations of [1,2]: -> 3 twice, -> 4 once.
        t.extend(0, [1, 2, 3, 9, 1, 2, 3, 9, 1, 2, 4, 9])
        cand = t.speculate([1, 2], 8, max_spec_factor=10.0,
                           min_token_prob=0.05, use_tree_spec=True)
        assert len(cand.token_ids) >= 2
        assert all(p < i for i, p in enumerate(cand.parents))
        # The highest-probability token comes first in best-first order.
        assert cand.token_ids[0] == 3

    def test_multi_sequence_counts(self, tree_impl):
        t = SuffixTree(16, force_python=tree_impl)
        for sid in range(3):
            t.extend(sid, [5, 6, 7])
        cand = t.speculate([5, 6], 2, max_spec_factor=10.0)
        assert cand.token_ids[:1] == [7]
        assert cand.probs[0] == pytest.approx(1.0)


class TestNativeVsPython:
    """Differential test: C++ arena tree vs pure-Python twin."""

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_corpora_agree(self, seed):
        if _load_native() is None:
            pytest.skip("native suffix tree unavailable")
        rng = random.Random(seed)
        depth = rng.choice([4, 8, 16])
        native = SuffixTree(depth, force_python=False)
        py = SuffixTree(depth, force_python=True)
        assert isinstance(py, _PySuffixTree)
        for sid in range(4):
            seq = [rng.randrange(6) for _ in range(rng.randrange(5, 60))]
            native.extend(sid, seq)
            py.extend(sid, seq)
        for _ in range(25):
            pat = [rng.randrange(6) for _ in range(rng.randrange(1, 10))]
            factor = rng.choice([0.5, 1.0, 2.0, 10.0])
            kwargs = dict(max_spec_tokens=8, max_spec_factor=factor,
                          min_token_prob=0.05,
                          use_tree_spec=rng.random() < 0.5)
            a = native.speculate(pat, **kwargs)
            b = py.speculate(pat, **kwargs)
            assert a.score == pytest.approx(b.score, abs=1e-5), (pat, kwargs)
            assert a.match_len == b.match_len
            assert len(a.token_ids) == len(b.token_ids)


class TestSuffixCache:

    def test_prompt_lifecycle(self):
        cache = SuffixCache(max_depth=16)
        cache.cache_prompt("r1", [1, 2, 3, 4])
        assert cache.has_cached_prompt("r1")
        with pytest.raises(ValueError):
            cache.cache_prompt("r1", [5])
        cache.evict_prompt("r1")
        assert not cache.has_cached_prompt("r1")
        with pytest.raises(ValueError):
            cache.evict_prompt("r1")

    def test_speculate_from_prompt(self):
        cache = SuffixCache(max_depth=16)
        cache.cache_prompt("r1", [10, 11, 12, 13, 14, 15])
        res = cache.speculate("r1", [11, 12, 13], max_spec_tokens=2,
                              max_spec_factor=10.0)
        assert res.token_ids[:2] == [14, 15]

    def test_speculate_from_other_request_response(self):
        cache = SuffixCache(max_depth=16)
        cache.update_response("a", [7, 8, 9, 7, 8, 9])
        cache.cache_prompt("b", [100, 101])
        res = cache.speculate("b", [7, 8], max_spec_tokens=4,
                              max_spec_factor=10.0)
        assert res.token_ids[:1] == [9]

    def test_speculate_requires_prompt(self):
        cache = SuffixCache(max_depth=8)
        with pytest.raises(ValueError):
            cache.speculate("missing", [1, 2])
        # But works with use_cached_prompt=False.
        res = cache.speculate("missing", [1, 2], use_cached_prompt=False)
        assert res.score == 0.0

    def test_empty_pattern_rejected(self):
        cache = SuffixCache(max_depth=8)
        with pytest.raises(ValueError):
            cache.speculate("x", [], use_cached_prompt=False)

    def test_long_pattern_truncated(self):
        cache = SuffixCache(max_depth=4)
        cache.update_response("a", list(range(50)))
        res = cache.speculate("a", list(range(40)), use_cached_prompt=False,
                              max_spec_tokens=2, max_spec_factor=10.0)
        # Pattern truncated to the last max_depth tokens; still finds a match.
        assert res.match_len <= 4


class TestSpeculateBatch:
    """The one-C-call batched walk must agree exactly with serial
    speculate() over mixed hot/cold/promptless items."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_batch_matches_serial(self, seed):
        rng = random.Random(seed)
        cache = SuffixCache(max_depth=32)
        resp = {}
        for rid in range(12):
            cache.cache_prompt(f"r{rid}",
                               [rng.randrange(40) for _ in range(60)])
            resp[rid] = [rng.randrange(40) for _ in range(20)] * 3
            cache.update_response(f"r{rid}", resp[rid])
        items = []
        for rid in range(12):
            if rid % 3 == 0:
                pattern = [rng.randrange(40) for _ in range(8)]   # cold
            else:
                pattern = resp[rid][-12:]                          # hot
            items.append((f"r{rid}", dict(
                req_id=f"r{rid}", pattern=pattern,
                max_spec_tokens=rng.choice([4, 8, 16]),
                max_spec_factor=2.0, max_spec_offset=8.0,
                min_token_prob=0.1,
                use_cached_prompt=rid % 4 != 0)))
        serial = {k: cache.speculate(**kw) for k, kw in items}
        batch = cache.speculate_batch(items)
        assert set(batch) == set(serial)
        for k in serial:
            a, b = serial[k], batch[k]
            assert a.token_ids == b.token_ids, k
            assert a.parents == b.parents, k
            assert a.score == pytest.approx(b.score, abs=1e-5), k
            assert a.match_len == b.match_len, k

    def test_batch_validates_like_serial(self):
        cache = SuffixCache(max_depth=8)
        with pytest.raises(ValueError):
            cache.speculate_batch([("x", dict(
                req_id="x", pattern=[1, 2], use_cached_prompt=True))])
        with pytest.raises(ValueError):
            cache.speculate_batch([("x", dict(
                req_id="x", pattern=[], use_cached_prompt=False))])
        assert cache.speculate_batch([]) == {}

    def test_batch_python_fallback(self):
        cache = SuffixCache(max_depth=8, force_python=True)
        cache.update_response("a", [7, 8, 9, 7, 8, 9])
        out = cache.speculate_batch([("a", dict(
            req_id="a", pattern=[7, 8], max_spec_tokens=4,
            max_spec_factor=10.0, use_cached_prompt=False))])
        assert out["a"].token_ids[:1] == [9]
