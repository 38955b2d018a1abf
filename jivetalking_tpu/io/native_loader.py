"""Shared loader for the package's on-demand-built native shims.

Both native codecs (flacio.cpp, avio.cpp) follow the same pattern: build
the shared library with g++ the first time it is needed (or when the
source is newer), then bind prototypes once under a lock and cache the
handle.  One implementation here so a fix to the staleness check or the
compile flags lands everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Sequence


def make_native_loader(
    src_path: str,
    so_path: str,
    configure: Callable[[ctypes.CDLL], None],
    link_args: Sequence[str] = (),
) -> Callable[[], ctypes.CDLL]:
    """Return a zero-arg loader with build-if-stale + double-checked lock.

    `configure` sets restype/argtypes and runs BEFORE the handle is
    published, so a concurrent first call from another worker thread can
    never observe a half-initialised prototype table."""
    state: dict = {"lib": None}
    lock = threading.Lock()

    def _build() -> None:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", src_path, "-o", so_path, *link_args],
            check=True,
            capture_output=True,
        )

    def load() -> ctypes.CDLL:
        lib = state["lib"]
        if lib is not None:
            return lib
        with lock:
            if state["lib"] is not None:
                return state["lib"]
            if not os.path.exists(so_path) or (
                os.path.exists(src_path)
                and os.path.getmtime(src_path) > os.path.getmtime(so_path)
            ):
                _build()
            lib = ctypes.CDLL(so_path)
            configure(lib)
            state["lib"] = lib
            return lib

    return load
