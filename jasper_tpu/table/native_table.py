"""ctypes bridge to the native host-table query kernel (native/jt_table.cc).

One C call replaces the repair path's Python query chain
(polish.semantics.effective_canonical_words + HostKmerTable.lookup_one) —
the host-side analog of the reference's per-k-mer SWIG crossing
(reference src/jasper.py:70-71 -> jellyfish binary_dumper.hpp:148-189).
Falls back to None when the shared library can't be built; callers degrade
to the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libjttable.so")

_lib = None
_lib_lock = threading.Lock()
_lib_failed = False

_U32P = ctypes.POINTER(ctypes.c_uint32)


def _load():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "libjttable.so"],
                    capture_output=True, timeout=120, check=True,
                )
            except Exception:
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _lib_failed = True
            return None
        lib.jt_query_str.restype = ctypes.c_uint32
        lib.jt_query_str.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.jt_query_substr_batch.restype = None
        lib.jt_query_substr_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.jt_effective_key.restype = None
        lib.jt_effective_key.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeTableQuery:
    """Bound to one HostKmerTable's memory (no copies; keeps a reference)."""

    def __init__(self, host_table):
        lib = _load()
        if lib is None:
            raise RuntimeError("native table library unavailable")
        if int(host_table.W) > 63:
            # jt_table.cc MAX_W=63 fails closed (all-zero counts) beyond
            # k=1008; force the pure-Python fallback instead
            raise RuntimeError("native kernel supports k <= 1008")
        self._lib = lib
        self._host = host_table  # keep the numpy buffer alive
        tab = host_table.tab
        if not tab.flags["C_CONTIGUOUS"]:
            tab = np.ascontiguousarray(tab)
            self._host_tab = tab
        self._ptr = tab.ctypes.data_as(ctypes.c_void_p)
        self.k = int(host_table.k)
        self.W = int(host_table.W)
        self.sw = int(host_table.sw)
        self.n_buckets = int(host_table.n_buckets)
        from jasper_tpu.table.kmer_table import PAD_BUCKETS

        self.pad = int(PAD_BUCKETS)

    def query_str(self, s: str) -> int:
        b = s.encode("ascii", errors="replace")
        return int(self._lib.jt_query_str(
            self._ptr, self.n_buckets, self.pad, self.k, self.W, self.sw,
            b, len(b),
        ))

    def query_substrings(self, s: str, starts) -> np.ndarray:
        """counts of s[st:st+k] for each st (starts must be >= 0; see the
        clamp note in jt_table.cc)."""
        b = s.encode("ascii", errors="replace")
        starts = np.ascontiguousarray(starts, dtype=np.int64)
        out = np.empty(len(starts), dtype=np.uint32)
        self._lib.jt_query_substr_batch(
            self._ptr, self.n_buckets, self.pad, self.k, self.W, self.sw,
            b, len(b), starts.ctypes.data_as(ctypes.c_void_p), len(starts),
            out.ctypes.data_as(ctypes.c_void_p),
        )
        return out

    def effective_key(self, s: str) -> np.ndarray:
        b = s.encode("ascii", errors="replace")
        out = np.zeros(self.W, dtype=np.uint32)
        self._lib.jt_effective_key(
            self.k, self.W, b, len(b), out.ctypes.data_as(ctypes.c_void_p)
        )
        return out
