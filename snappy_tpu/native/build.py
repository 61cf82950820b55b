"""Build the native C++ codec shared library.

Invoked automatically on first use (snappy_tpu.native.runtime) or manually:

    python -m snappy_tpu.native.build

Uses g++ directly — the library is a single translation unit with no
dependencies, so a build system would be overhead.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "snappy_native.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "_snappy_native.so")

CXXFLAGS = ["-O3", "-std=c++17", "-fPIC", "-shared", "-march=native", "-fno-exceptions", "-fno-rtti", "-Wall"]


def lib_path() -> str:
    return _LIB


def is_stale() -> bool:
    return not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)


def build(force: bool = False, quiet: bool = True) -> str:
    """Compile the shared library if missing or stale; returns its path."""
    if not force and not is_stale():
        return _LIB
    # Build to a temp file then rename: atomic w.r.t. concurrent importers.
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(_LIB))
    os.close(fd)
    cmd = ["g++", *CXXFLAGS, _SRC, "-o", tmp]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(f"native build failed:\n{proc.stderr}")
        os.replace(tmp, _LIB)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    if not quiet:
        print(f"built {_LIB}", file=sys.stderr)
    return _LIB


if __name__ == "__main__":
    build(force="--force" in sys.argv, quiet=False)
