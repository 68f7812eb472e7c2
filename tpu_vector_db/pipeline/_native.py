"""Shared ctypes loader for the in-tree C++ tokenizer bridges.

One compile/load/rebuild-on-stale implementation for every native/*.cpp
bridge (fast_wordpiece.py and fast_unigram.py previously carried
near-verbatim copies — review finding: compile-flag or staleness fixes
had to land twice and could silently drift).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Callable

logger = logging.getLogger(__name__)

NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"


class NativeLib:
    """Lazily compiled + loaded shared object with ctypes signatures.

    register(lib) sets argtypes/restypes once after the first CDLL load.
    The source recompiles when its mtime is newer than the built .so;
    a missing compiler degrades to None (callers keep a Python path).
    """

    def __init__(self, src_name: str, lib_name: str,
                 register: Callable[[ctypes.CDLL], None]) -> None:
        self._src = NATIVE_DIR / src_name
        self._lib_path = NATIVE_DIR / lib_name
        self._register = register
        self._lock = threading.Lock()
        self._lib: ctypes.CDLL | None = None
        self._tried = False

    def _compile(self) -> bool:
        base = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                str(self._src), "-o", str(self._lib_path)]
        last: Exception | None = None
        for extra in (["-march=native"], []):
            try:
                subprocess.run(base[:2] + extra + base[2:], check=True,
                               capture_output=True, timeout=120)
                return True
            except (subprocess.SubprocessError, FileNotFoundError) as exc:
                last = exc
        logger.warning("native %s unavailable (%s)", self._src.name, last)
        return False

    def load(self) -> ctypes.CDLL | None:
        with self._lock:
            if self._lib is not None or self._tried:
                return self._lib
            self._tried = True
            if not self._src.exists():
                return None
            if (not self._lib_path.exists()
                    or self._lib_path.stat().st_mtime
                    < self._src.stat().st_mtime):
                if not self._compile():
                    return None
            lib = ctypes.CDLL(str(self._lib_path))
            self._register(lib)
            self._lib = lib
            return lib
