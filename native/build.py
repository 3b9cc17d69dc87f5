"""Build the native IO library (g++ -O3 shared object, ctypes ABI)."""

from __future__ import annotations

import os
import subprocess

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "colmap_io.cpp")
LIB = os.path.join(HERE, "libr3dgs_io.so")


def build(force=False) -> str | None:
    """Compile if needed; returns the .so path or None on failure."""
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", SRC,
             "-o", LIB],
            check=True, capture_output=True, text=True, timeout=120)
        return LIB
    except Exception as e:  # missing toolchain -> python fallback
        print(f"native build failed ({e}); using python IO fallback")
        return None


if __name__ == "__main__":
    print(build(force=True))
