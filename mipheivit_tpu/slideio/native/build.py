"""Build libslidetiff.so (g++ -> shared lib, linked against system libtiff).

Lazy-built on first import of ``mipheivit_tpu.slideio``; rebuilt when the
source is newer than the binary. No dev headers needed — the libtiff 4.x C
ABI is declared in tiff_api.h and we link against the runtime .so.
"""

from __future__ import annotations

import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).parent
_SRC = _NATIVE_DIR / "slidetiff.cpp"
_LIB = _NATIVE_DIR / "libslidetiff.so"


def find_libtiff() -> str:
    for cand in (
        "/lib/x86_64-linux-gnu/libtiff.so.6",
        "/usr/lib/x86_64-linux-gnu/libtiff.so.6",
        "/lib/x86_64-linux-gnu/libtiff.so.5",
    ):
        if Path(cand).exists():
            return cand
    return "-ltiff"  # hope the linker finds it


def build(force: bool = False) -> Path:
    if _LIB.exists() and not force and \
            _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    libtiff = find_libtiff()
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_LIB),
    ]
    cmd.append(libtiff)
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB


if __name__ == "__main__":
    print(build(force=True))
