"""Shared ctypes loader for the in-tree C++ bridges.

One compile/load implementation for every native/*.cpp bridge
(fast_wordpiece.py, fast_unigram.py, index/native.py previously carried
near-verbatim copies — review finding: compile-flag or staleness fixes
had to land twice and could silently drift).

Staleness is keyed on a CONTENT HASH of the source, not mtimes: git does
not preserve mtimes, so after a clone an mtime check can ctypes-load a
stale (or opaque checked-in) binary instead of compiling the reviewed
source (advisor finding). The built library lands at
native/<stem>-<sha256[:12]>.so; binaries are never committed
(.gitignore native/*.so) and a hash mismatch always recompiles.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import subprocess
import threading
from pathlib import Path
from typing import Callable, Sequence

logger = logging.getLogger(__name__)

NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"


class NativeLib:
    """Lazily compiled + loaded shared object with ctypes signatures.

    register(lib) sets argtypes/restypes once after the first CDLL load.
    extra_flags append to the g++ invocation (e.g. -fopenmp-simd for the
    graph builder's distance loops). -march=native is attempted first and
    dropped for compilers/targets that reject it. A missing compiler
    degrades to None (callers keep a Python path).
    """

    def __init__(self, src_name: str, lib_name: str,
                 register: Callable[[ctypes.CDLL], None],
                 extra_flags: Sequence[str] = ()) -> None:
        self._src = NATIVE_DIR / src_name
        self._stem = lib_name[:-3] if lib_name.endswith(".so") else lib_name
        self._register = register
        self._extra = list(extra_flags)
        self._lock = threading.Lock()
        self._lib: ctypes.CDLL | None = None
        self._tried = False

    def _compile(self, lib_path: Path) -> bool:
        base = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                *self._extra, str(self._src), "-o", str(lib_path)]
        # NOT -ffast-math: linking crtfastmath.o flips the process-wide
        # FTZ/DAZ flags on dlopen
        last: Exception | None = None
        for arch in (["-march=native", "-ffp-contract=fast"], []):
            try:
                subprocess.run(base[:2] + arch + base[2:], check=True,
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
            digest = hashlib.sha256(self._src.read_bytes()).hexdigest()[:12]
            lib_path = self._src.parent / f"{self._stem}-{digest}.so"
            if not lib_path.exists():
                if not self._compile(lib_path):
                    return None
                # drop builds of older source revisions
                for old in self._src.parent.glob(f"{self._stem}-*.so"):
                    if old != lib_path:
                        old.unlink(missing_ok=True)
            lib = ctypes.CDLL(str(lib_path))
            self._register(lib)
            self._lib = lib
            return lib
