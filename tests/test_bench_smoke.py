"""bench.py scoreboard smoke: the driver's perf artifact must never rot.

Round-4 postmortem: a function-local ``import subprocess`` shadowed the
module import and crashed ``bench.py`` for any clean environment (no
cached drafter checkpoint), so the whole round shipped with zero
driver-captured perf numbers (BENCH_r04.json rc=1).  These tests run the
REAL entry point end-to-end on the CPU path from a clean temp drafter
dir — the exact scenario that crashed — and assert the printed JSON
parses with the expected blocks.  Reference bar: its bench harness is a
pytest suite (reference ``tests/benchmarks/conftest.py``), so a broken
bench fails CI rather than silently zeroing the scoreboard.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _run_bench(tmp_path, extra_env):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "ARCTIC_BENCH_DRAFTER": str(tmp_path / "drafter"),
        **extra_env,
    })
    res = subprocess.run(
        [sys.executable, str(REPO / "bench.py")], cwd=str(REPO),
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [ln for ln in res.stdout.splitlines() if ln.strip()]
    # The contract with the driver: stdout is ONE JSON line.
    assert len(lines) == 1, f"bench stdout not one line: {lines}"
    return json.loads(lines[0])


def test_bench_clean_state_cpu_smoke(tmp_path):
    """Clean drafter dir (forces in-run distillation) -> greedy + spec
    blocks present and sane."""
    out = _run_bench(tmp_path, {"ARCTIC_BENCH_SKIP_CURVE": "1",
                                "ARCTIC_BENCH_SKIP_TRANSFER": "1"})
    # Driver-required keys.
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in out
    assert out["value"] > 0
    # Greedy block.
    assert out["wall_ms_per_step"] > 0
    assert out["single_seq_decode_tokens_per_s"] > 0
    # Spec block: the in-run distilled drafter memorises its capture
    # prompts, so acceptance must be well above zero.
    assert out["spec_decode_tokens_per_s"] > 0
    assert out["spec_acceptance_rate"] > 0.2
    assert out["spec_tokens_per_step"] > 1.0


@pytest.mark.slow
def test_bench_curve_and_transfer_blocks(tmp_path):
    """--runslow tier: the corruption curve and the drafter-transfer
    demo (benchmarks/transfer_drafter.py capture->distill->held-out
    eval on the trained tiny teacher) both land in the JSON, and the
    transfer block is a real result, not a swallowed {"error": ...}."""
    out = _run_bench(tmp_path, {
        "ARCTIC_BENCH_FORCE_TRANSFER": "1",
        "ARCTIC_TRANSFER_CKPT": str(tmp_path / "tiny-markov"),
        "ARCTIC_TRANSFER_DRAFTER": str(tmp_path / "xfer-drafter"),
    })
    curve = out.get("spec_curve")
    assert curve, f"spec_curve missing: {sorted(out)}"
    assert [pt["corrupt_rate"] for pt in curve] == [0.12, 0.3, 0.6, 1.0]
    # More corruption => lower acceptance (weak monotonicity).
    accs = [pt["acceptance"] for pt in curve]
    assert accs[0] >= accs[-1]
    assert "spec_heldout" in out
    xfer = out.get("spec_transfer")
    assert xfer, f"spec_transfer missing: {sorted(out)}"
    assert "error" not in xfer, xfer
    # The bar from the verdict: held-out acceptance on the trained
    # teacher must be well above chance (measured ~0.81 mlp, ~0.89
    # lstm — both drafter architectures run by default).
    assert xfer["transfer_acceptance"] > 0.3
    assert xfer["transfer_tokens_per_step"] > 1.5
    assert xfer["lstm"]["transfer_acceptance"] > 0.3
