"""Native (C++) runtime pieces, loaded via ctypes with Python fallback.

Build on first use (g++ is assumed present per the deployment image);
failures fall back silently to the pure-Python implementations.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "librnaelem_native.so")
_SRC = os.path.join(_HERE, "rnaelem_native.cpp")

_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        _lib = ctypes.CDLL(_SO)
        _lib.klet_shuffle.restype = ctypes.c_int
        _lib.klet_shuffle.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_uint64]
        _lib.fastq_index.restype = ctypes.c_int64
        _lib.fastq_index.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    except Exception as e:  # pragma: no cover - build env dependent
        print(f"rnaelem native build unavailable: {e}", file=sys.stderr)
        _lib = None
    return _lib


def fastq_index_native(data: bytes):
    """Index a FASTQ byte buffer natively.

    Returns an [nrec, 6] int64 array of (id_off, id_len, seq_off,
    seq_len, qual_off, qual_len), or None if the native lib is
    unavailable.
    """
    L = lib()
    if L is None:
        return None
    import numpy as np
    cap = data.count(b"\n") // 4 + 2
    out = np.zeros((cap, 6), np.int64)
    n = L.fastq_index(data, len(data),
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                      cap)
    if n < 0:
        return None
    return out[:n]


def klet_shuffle_native(seq: str, k: int, seed: int):
    """Returns shuffled string or None if the native lib is unavailable."""
    L = lib()
    if L is None:
        return None
    n = len(seq)
    out = ctypes.create_string_buffer(n)
    rc = L.klet_shuffle(seq.encode(), out, n, k,
                        ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF))
    if rc != 0:
        return None
    return out.raw.decode()
