from arcticinference_tpu.spec.suffix_tree import SuffixTree
from arcticinference_tpu.spec.suffix_cache import SuffixCache, SuffixSpecResult

__all__ = ["SuffixTree", "SuffixCache", "SuffixSpecResult"]
