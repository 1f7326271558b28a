"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so all sharding/collective
logic (TP, Ulysses SP, shift parallelism) is exercised on host CPU devices,
as recommended by the survey (SURVEY.md §4).
"""

import os

# Must be set before jax initialises its backends.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) prepends itself to jax_platforms even
# when JAX_PLATFORMS=cpu is exported; overriding the config after import is
# the reliable way to pin tests to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (compile-heavy tier; the default "
             "suite skips them to stay under ~15 min)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: compile-heavy test, skipped unless --runslow")


def _slow_prefixes():
    """Node-id prefixes of the compile-heavy tier, one per line in
    tests/slow_tests.txt (regenerate candidates with --durations=80).
    Keeping the list in data instead of scattering @slow marks makes
    the tier auditable and easy to retune."""
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    try:
        with open(path) as f:
            return [ln.strip() for ln in f
                    if ln.strip() and not ln.startswith("#")]
    except OSError:
        return []


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    prefixes = _slow_prefixes()
    skip = pytest.mark.skip(reason="slow tier: pass --runslow")
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if "slow" in item.keywords or any(
                nodeid.startswith(p) for p in prefixes):
            item.add_marker(skip)


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    devices = jax.devices()
    assert len(devices) >= 8, f"expected 8 virtual devices, got {devices}"
    return devices


@pytest.fixture(scope="session")
def trained_checkpoint(tmp_path_factory):
    """A tiny TRAINED HF Llama checkpoint (weights + byte tokenizer) on a
    structured Markov corpus — shared by the quality gate and the
    accuracy harness; see tests/quality_utils.py."""
    from tests.quality_utils import train_tiny_checkpoint

    d = tmp_path_factory.mktemp("trained_ckpt")
    train_ids, heldout = train_tiny_checkpoint(d, steps=300)
    return str(d), heldout
