"""Small shared helpers."""

from __future__ import annotations

import time
from typing import Iterator, Sequence, TypeVar

T = TypeVar("T")


def cdiv(a: int, b: int) -> int:
    """Ceiling division."""
    return -(-a // b)


def round_up(x: int, multiple: int) -> int:
    return cdiv(x, multiple) * multiple


def pad_to_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n; buckets must be sorted ascending.

    Plays the role of the reference's cudagraph batch-size buckets
    (reference ``model_runner.py:240-253``): every jitted program runs at a
    bucketed shape so XLA compiles a bounded set of programs.
    """
    for b in buckets:
        if b >= n:
            return b
    raise ValueError(f"{n} exceeds the largest bucket {buckets[-1]}")


def default_token_buckets(max_tokens: int) -> list[int]:
    """Power-of-two token buckets from 16 up to max_tokens (inclusive)."""
    buckets = []
    b = 16
    while b < max_tokens:
        buckets.append(b)
        b *= 2
    buckets.append(max_tokens)
    return buckets


#: Per-device-kind hardware constants: (HBM bytes, nominal HBM peak
#: bandwidth in bytes/s).  Matched by substring against the lowercased
#: ``jax.devices()[0].device_kind``.  Sources: public TPU spec sheets.
_CHIP_TABLE: tuple[tuple[tuple[str, ...], int, float], ...] = (
    (("v5 lite", "v5e"), 16 * 1024 ** 3, 819e9),
    (("v5p", "v5"), 95 * 1024 ** 3, 2765e9),
    (("v6 lite", "v6e", "trillium"), 32 * 1024 ** 3, 1640e9),
    (("v4",), 32 * 1024 ** 3, 1228e9),
    (("v3",), 16 * 1024 ** 3, 900e9),
    (("v2",), 8 * 1024 ** 3, 700e9),
)


def chip_specs(device_kind: str | None = None) -> tuple[int, float | None]:
    """(HBM bytes, nominal peak HBM bandwidth B/s | None) for the local
    accelerator.  Unknown kinds get a conservative 16 GiB / unknown-peak
    fallback; CPU backends get a small synthetic budget."""
    if device_kind is None:
        import jax

        dev = jax.devices()[0]
        if jax.default_backend() == "cpu":
            return 2 * 1024 ** 3, None
        device_kind = dev.device_kind
    kind = device_kind.lower()
    for names, hbm, bw in _CHIP_TABLE:
        if any(n in kind for n in names):
            return hbm, bw
    return 16 * 1024 ** 3, None


class Timer:
    """Wall-clock timer usable as a context manager."""

    def __init__(self) -> None:
        self.elapsed = 0.0

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc: object) -> None:
        self.elapsed = time.perf_counter() - self._t0


def chunked(seq: Sequence[T], size: int) -> Iterator[Sequence[T]]:
    for i in range(0, len(seq), size):
        yield seq[i:i + size]
