"""ctypes loader for the native query-substring scanner
(querysub.c).  Compiles on demand with the system C compiler into
``_build/`` (cached by source mtime); loading failures degrade to the
numpy oracle path in engine/query.py."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "querysub.c")
_BUILD = os.path.join(_HERE, "_build")
_SO = os.path.join(_BUILD, "querysub.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                os.makedirs(_BUILD, exist_ok=True)
                cc = os.environ.get("CC", "cc")
                subprocess.run(
                    [cc, "-O3", "-shared", "-fPIC", "-o",
                     _SO + ".tmp", _SRC],
                    check=True, capture_output=True)
                os.replace(_SO + ".tmp", _SO)
            lib = ctypes.CDLL(_SO)
            fn = lib.query_substring_scan
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,   # text, n
                ctypes.c_void_p, ctypes.c_void_p,  # suftab, lcp
                ctypes.c_void_p, ctypes.c_void_p,  # sti1, bck
                ctypes.c_int64, ctypes.c_int64,    # numofchars, pl
                ctypes.c_void_p, ctypes.c_int64,   # qseq, qseqlen
                ctypes.c_int64, ctypes.c_int64,    # searchlength, spd
                ctypes.c_void_p, ctypes.c_int64,   # out, cap
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def scan_sequence(text: np.ndarray, suftab: np.ndarray,
                  lcp: np.ndarray, sti1: np.ndarray,
                  bck: np.ndarray, numofchars: int,
                  prefixlength: int, qseq: np.ndarray,
                  searchlength: int, qspeedup: int) -> np.ndarray:
    """Run the scan over one query sequence; returns an (m, 3) int64
    array of (length, dbpos, qoff) in reference emission order."""
    lib = _load()
    assert lib is not None
    n = int(text.size) if text.size else 0
    # contiguity + dtype guarantees for the raw pointers
    text = np.ascontiguousarray(text, np.uint8)
    suftab = np.ascontiguousarray(suftab, np.int32)
    lcp = np.ascontiguousarray(lcp, np.int32)
    sti1 = np.ascontiguousarray(sti1, np.uint8)
    bck = np.ascontiguousarray(bck, np.uint32)
    qseq = np.ascontiguousarray(qseq, np.uint8)
    cap = max(4096, 8 * qseq.size // 4)
    while True:
        out = np.empty(cap, np.int64)
        need = lib.query_substring_scan(
            text.ctypes.data, n,
            suftab.ctypes.data, lcp.ctypes.data,
            sti1.ctypes.data, bck.ctypes.data,
            numofchars, prefixlength,
            qseq.ctypes.data, int(qseq.size),
            searchlength, qspeedup,
            out.ctypes.data, cap)
        if need <= cap:
            return out[:need].reshape(-1, 3)
        cap = int(need) + 3
