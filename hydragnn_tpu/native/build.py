"""Build the native library: python -m hydragnn_tpu.native.build"""

from __future__ import annotations

import os
import subprocess
import sys


def build() -> str:
    d = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(d, "neighbors.cpp")
    out = os.path.join(d, "libhydragnn_native.so")
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        src, "-o", out,
    ]
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    print(build())
