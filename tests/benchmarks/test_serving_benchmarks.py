"""Pytest-driven benchmark harness (reference tests/benchmarks parity).

Run on real TPU with:  python -m pytest tests/benchmarks -q --no-header -s
These are skipped on the CPU test mesh (they measure, not verify).
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[2]


def on_tpu() -> bool:
    import jax

    return jax.default_backend() == "tpu"


requires_tpu = pytest.mark.skipif(
    "not config.getoption('--run-tpu-bench', default=False)",
    reason="TPU benchmark; enable with --run-tpu-bench")


@requires_tpu
@pytest.mark.parametrize("config", ["baseline", "suffix", "swiftkv"])
def test_performance(config):
    """Throughput/TTFT/TPOT for one engine config (subprocess-isolated)."""
    proc = subprocess.run(
        [sys.executable, str(ROOT / "benchmarks/serve_bench.py"),
         "--configs", config, "--num-prompts", "32",
         "--input-len", "128", "--output-len", "64"],
        capture_output=True, text=True, timeout=3000)
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, proc.stderr[-2000:]
    result = json.loads(lines[-1])
    print(json.dumps(result))
    assert result["output_tokens_per_s"] > 0


@requires_tpu
def test_headline_bench():
    proc = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True, text=True, timeout=3000)
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, proc.stderr[-2000:]
    print(lines[-1])
