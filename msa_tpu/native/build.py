"""Build the native host library with g++ (no pybind11; plain C ABI)."""

from __future__ import annotations

import os
import subprocess


def build(force: bool = False) -> str:
    here = os.path.dirname(__file__)
    src = os.path.join(here, "msanative.cpp")
    out = os.path.join(here, "libmsanative.so")
    if not force and os.path.exists(out) and os.path.getmtime(
        out
    ) >= os.path.getmtime(src):
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        src, "-o", out,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


if __name__ == "__main__":
    print(build(force=True))
