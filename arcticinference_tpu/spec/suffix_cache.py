"""SuffixCache: the host-side speculation source for suffix decoding.

Capability mirror of reference ``common/suffix_cache/suffix_cache.py:57-222``:
one *global* tree accumulates all responses across requests, and each live
request optionally gets a private tree over its own prompt; speculation takes
the better-scoring candidate of the two.  The score approximates the expected
number of accepted tokens (sum of per-token estimated probabilities), which
is what the engine compares against the draft-model budget when choosing a
speculation source per step.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Hashable, List, Optional, Sequence, Union

from arcticinference_tpu.spec.suffix_tree import Candidate, SuffixTree


@dataclass
class SuffixSpecResult:
    """Result of a suffix-decoding speculation.

    ``parents[i]`` is the index (into ``token_ids``) of token i's parent in
    the speculation tree, or -1 for roots; a pure path has parents
    ``[-1, 0, 1, ...]``.
    """

    token_ids: List[int] = field(default_factory=list)
    parents: List[int] = field(default_factory=list)
    probs: List[float] = field(default_factory=list)
    score: float = 0.0
    match_len: int = 0

    @staticmethod
    def from_candidate(c: Candidate) -> "SuffixSpecResult":
        return SuffixSpecResult(
            token_ids=list(c.token_ids),
            parents=list(c.parents),
            probs=list(c.probs),
            score=c.score,
            match_len=c.match_len)


class SuffixCache:

    def __init__(self, max_depth: int = 64, force_python: bool = False):
        self._max_depth = max_depth
        self._force_python = force_python
        self._response_tree = SuffixTree(max_depth, force_python=force_python)
        self._prompt_trees: dict[Hashable, object] = {}
        self._req_to_seq_id: dict[Hashable, int] = {}

    @property
    def max_depth(self) -> int:
        return self._max_depth

    def has_cached_prompt(self, req_id: Hashable) -> bool:
        return req_id in self._prompt_trees

    def cached_prompt_ids(self) -> list[Hashable]:
        return list(self._prompt_trees)

    def build_prompt_tree(self, prompt_token_ids: Sequence[int]):
        """Build (but do not install) a private prompt tree.

        Split from :meth:`cache_prompt` so the engine can run the
        O(len(prompt) * depth) index build on a worker thread during
        prefill (the ctypes tree calls release the GIL) and install the
        finished tree at first-commit time — the build is the dominant
        host cost of the first post-prefill step at high admission rates
        (TTFT item, benchmarks/RESULTS_r3.md repeat workload).
        """
        tree = SuffixTree(self._max_depth, force_python=self._force_python)
        tree.extend(0, prompt_token_ids)
        return tree

    def install_prompt_tree(self, req_id: Hashable, tree) -> None:
        if req_id in self._prompt_trees:
            raise ValueError(f"Prompt already cached for request {req_id!r}")
        self._prompt_trees[req_id] = tree

    def cache_prompt(self, req_id: Hashable,
                     prompt_token_ids: Sequence[int]) -> None:
        """Index a request's prompt so its own text can seed drafts.

        Must be paired with :meth:`evict_prompt` when the request finishes.
        """
        self.install_prompt_tree(req_id,
                                 self.build_prompt_tree(prompt_token_ids))

    def evict_prompt(self, req_id: Hashable) -> None:
        if req_id not in self._prompt_trees:
            raise ValueError(f"No cached prompt for request {req_id!r}")
        del self._prompt_trees[req_id]

    def _seq_id(self, req_id: Hashable) -> int:
        if req_id not in self._req_to_seq_id:
            self._req_to_seq_id[req_id] = len(self._req_to_seq_id)
        return self._req_to_seq_id[req_id]

    def update_response(self, req_id: Hashable,
                        token_ids: Union[int, Sequence[int]]) -> None:
        """Append generated token(s) to the request's response sequence.

        Feeds both the global response tree (visible to all requests) and,
        if present, the request's prompt tree.
        """
        seq_id = self._seq_id(req_id)
        if isinstance(token_ids, int):
            token_ids = [token_ids]
        self._response_tree.extend(seq_id, token_ids)
        tree = self._prompt_trees.get(req_id)
        if tree is not None:
            tree.extend(0, token_ids)

    def speculate(
        self,
        req_id: Hashable,
        pattern: Sequence[int],
        max_spec_tokens: Optional[int] = None,
        max_spec_factor: float = 1.0,
        max_spec_offset: float = 0.0,
        min_token_prob: float = 0.1,
        use_tree_spec: bool = False,
        use_cached_prompt: bool = True,
    ) -> SuffixSpecResult:
        """Best continuation of ``pattern`` from the prompt + response trees."""
        if use_cached_prompt and req_id not in self._prompt_trees:
            raise ValueError(f"No cached prompt for request {req_id!r}")
        if not pattern:
            raise ValueError("Pattern must not be empty")
        if max_spec_tokens is None:
            max_spec_tokens = self._max_depth
        if len(pattern) > self._max_depth:
            pattern = pattern[-self._max_depth:]

        result = SuffixSpecResult()
        if use_cached_prompt:
            cand = self._prompt_trees[req_id].speculate(
                pattern, max_spec_tokens, max_spec_factor, max_spec_offset,
                min_token_prob, use_tree_spec)
            result = SuffixSpecResult.from_candidate(cand)
        cand = self._response_tree.speculate(
            pattern, max_spec_tokens, max_spec_factor, max_spec_offset,
            min_token_prob, use_tree_spec)
        if cand.score > result.score:
            result = SuffixSpecResult.from_candidate(cand)
        return result
