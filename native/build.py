"""Build the native host-runtime library (g++, OpenMP)."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "sgnerf_native.cpp")
OUT = os.path.join(HERE, "libsgnerf_native.so")


def build(force=False):
    if not force and os.path.exists(OUT) and \
            os.path.getmtime(OUT) > os.path.getmtime(SRC):
        return OUT
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
           "-std=c++17", SRC, "-o", OUT]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    return OUT


if __name__ == "__main__":
    build(force="--force" in sys.argv)
    print("built", OUT)
