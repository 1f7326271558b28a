"""Build the native suffix-tree library with g++ (no pybind11 required).

The compiled library is cached next to the source keyed by a source hash, so
repeat imports are free.  Set ``ARCTIC_TPU_NATIVE_BUILD_DIR`` to relocate the
build output (e.g. into a writable tmpdir on read-only installs).
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_SRC = Path(__file__).resolve().parent / "suffix_tree.cc"
_LOCK = threading.Lock()
_CACHED: Optional[Path] = None


class NativeBuildError(RuntimeError):
    pass


def _build_dir() -> Path:
    from arcticinference_tpu import envs

    override = envs.ARCTIC_TPU_NATIVE_BUILD_DIR
    if override:
        d = Path(override)
    else:
        d = _SRC.parent / "_build"
    d.mkdir(parents=True, exist_ok=True)
    return d


def build_suffix_tree_library() -> Path:
    """Compile (if needed) and return the path to libsuffixtree.so."""
    global _CACHED
    with _LOCK:
        if _CACHED is not None and _CACHED.exists():
            return _CACHED
        src = _SRC.read_bytes()
        tag = hashlib.sha256(src).hexdigest()[:16]
        out = _build_dir() / f"libsuffixtree-{tag}.so"
        if not out.exists():
            cmd = [
                os.environ.get("CXX", "g++"),
                "-O3", "-std=c++17", "-shared", "-fPIC",
                "-fvisibility=hidden",
                str(_SRC), "-o", str(out) + ".tmp",
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True, text=True)
            except FileNotFoundError as e:
                raise NativeBuildError(f"compiler not found: {e}") from e
            except subprocess.CalledProcessError as e:
                raise NativeBuildError(
                    f"suffix tree build failed:\n{e.stderr}") from e
            os.replace(str(out) + ".tmp", out)
        _CACHED = out
        return out
