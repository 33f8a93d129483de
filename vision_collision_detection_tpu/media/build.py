"""Build libvcd_media.so (the first-party FFmpeg decode/probe/encode library).

Usage:  python -m vision_collision_detection_tpu.media.build
The decoder bindings also auto-build on first import if the .so is missing
or older than the source.
"""

from __future__ import annotations

import os
import subprocess
import sys

_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_src")
SOURCE = os.path.join(_SRC_DIR, "vcd_media.cpp")
LIBRARY = os.path.join(_SRC_DIR, "libvcd_media.so")

_INCLUDE_DIRS = ["/usr/include/x86_64-linux-gnu"]
_LIBS = ["avformat", "avcodec", "avutil", "swscale"]
_FLAGS = ["-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC",
          "-std=c++17", "-Wall"]


_STAMP = LIBRARY + ".stamp"


def _host_fingerprint() -> str:
    """Hash of the CPU feature set + compile command: -march=native makes
    the .so host-specific, so a build cache copied across heterogeneous
    machines must rebuild instead of SIGILL-ing at import."""
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        feats = platform.processor()
    return hashlib.sha256((feats + "|" + " ".join(_FLAGS)).encode()).hexdigest()


def needs_build() -> bool:
    if not os.path.exists(LIBRARY):
        return True
    if os.path.getmtime(SOURCE) > os.path.getmtime(LIBRARY):
        return True
    try:
        with open(_STAMP) as f:
            return f.read().strip() != _host_fingerprint()
    except OSError:
        return True


def build(verbose: bool = False) -> str:
    cmd = (
        ["g++"] + _FLAGS
        + [f"-I{d}" for d in _INCLUDE_DIRS]
        + [SOURCE, "-o", LIBRARY]
        + [f"-l{l}" for l in _LIBS]
    )
    if verbose:
        print(" ".join(cmd))
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"libvcd_media build failed:\n{proc.stdout}\n{proc.stderr}"
        )
    with open(_STAMP, "w") as f:
        f.write(_host_fingerprint())
    return LIBRARY


def ensure_built() -> str:
    if needs_build():
        build()
    return LIBRARY


if __name__ == "__main__":
    path = build(verbose=True)
    print(f"built {path}")
    sys.exit(0)
