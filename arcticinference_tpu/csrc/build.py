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

_LOCK = threading.Lock()
_CACHED_LIBS: dict[str, Path] = {}


class NativeBuildError(RuntimeError):
    pass


def _build_dir() -> Path:
    from arcticinference_tpu import envs

    override = envs.ARCTIC_TPU_NATIVE_BUILD_DIR
    if override:
        d = Path(override)
    else:
        d = Path(__file__).resolve().parent / "_build"
    d.mkdir(parents=True, exist_ok=True)
    return d


def build_native_library(stem: str) -> Path:
    """Compile (if needed) csrc/<stem>.cc into lib<stem>-<hash>.so."""
    with _LOCK:
        cached = _CACHED_LIBS.get(stem)
        if cached is not None and cached.exists():
            return cached
        src_path = Path(__file__).resolve().parent / f"{stem}.cc"
        src = src_path.read_bytes()
        tag = hashlib.sha256(src).hexdigest()[:16]
        out = _build_dir() / f"lib{stem.replace('_', '')}-{tag}.so"
        if not out.exists():
            cmd = [
                os.environ.get("CXX", "g++"),
                "-O3", "-std=c++17", "-shared", "-fPIC",
                "-fvisibility=hidden",
                str(src_path), "-o", str(out) + ".tmp",
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True, text=True)
            except FileNotFoundError as e:
                raise NativeBuildError(f"compiler not found: {e}") from e
            except subprocess.CalledProcessError as e:
                raise NativeBuildError(
                    f"{stem} build failed:\n{e.stderr}") from e
            os.replace(str(out) + ".tmp", out)
        _CACHED_LIBS[stem] = out
        return out


def build_suffix_tree_library() -> Path:
    """Compile (if needed) and return the path to libsuffixtree.so."""
    return build_native_library("suffix_tree")
