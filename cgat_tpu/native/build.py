"""Build the native C++ helpers (g++ -O3 -shared).

Run ``python -m cgat_tpu.native.build`` or let the loader build on demand.
"""
from __future__ import annotations

import os
import subprocess

SRC_DIR = os.path.dirname(os.path.abspath(__file__))
LIB_NAME = "libcgat_native.so"


def lib_path() -> str:
    return os.path.join(SRC_DIR, LIB_NAME)


def build(force: bool = False) -> str | None:
    """Compile the shared library; returns its path or None on failure."""
    out = lib_path()
    srcs = [os.path.join(SRC_DIR, "neighbors.cc")]
    if not force and os.path.exists(out) and all(
            os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", "-o", out, *srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return out
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"cgat_tpu native build failed: {msg}")
        return None


if __name__ == "__main__":
    p = build(force=True)
    print(p or "build failed")
