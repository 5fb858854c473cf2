"""Build the native shared library (g++ -O3 -shared -fPIC), cached on mtime."""

from __future__ import annotations

import subprocess
from pathlib import Path

_SRC_DIR = Path(__file__).parent
_SOURCES = ["cc_label.cpp", "ink_walk.cpp"]
_LIB_NAME = "libocrnative.so"


def library_path() -> Path:
    return _SRC_DIR / _LIB_NAME


def build_library(force: bool = False) -> Path:
    """Compile the native library if missing or stale. Raises on failure."""
    lib = library_path()
    srcs = [_SRC_DIR / s for s in _SOURCES]
    if not force and lib.is_file():
        if lib.stat().st_mtime >= max(s.stat().st_mtime for s in srcs):
            return lib
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", str(lib), *[str(s) for s in srcs],
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return lib
