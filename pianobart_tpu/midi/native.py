"""ctypes loader for the native MIDI->Octuple codec.

Builds ``libpbx_midi.so`` from ``native/midi_codec.cpp`` on first use
(g++ -O3, ~1 s, cached beside the source) and exposes
:func:`midi_bytes_to_octuple`.  Falls back to the pure-Python path when the
toolchain or build is unavailable — behavior is identical (golden-tested),
the native path is just ~20-100x faster for offline dataset generation.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "midi_codec.cpp")
_LIB = os.path.join(_HERE, "native", "libpbx_midi.so")

_TASKS = {"pretrain": 0, "composer": 0, "emotion": 0, "generate": 0,
          "melody": 1, "velocity": 2}

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if not os.path.exists(_SRC):
        _build_failed = True
        return None
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                 "-o", _LIB + ".tmp", _SRC],
                check=True, capture_output=True, timeout=120)
            os.replace(_LIB + ".tmp", _LIB)
        lib = ctypes.CDLL(_LIB)
        lib.pbx_midi_to_octuple.restype = ctypes.c_int
        lib.pbx_midi_to_octuple.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32))]
        lib.pbx_free.argtypes = [ctypes.c_void_p]
        lib.pbx_abi_version.restype = ctypes.c_int
        assert lib.pbx_abi_version() == 1
        return lib
    except Exception:
        _build_failed = True
        return None


def available() -> bool:
    return _get() is not None


def _get() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        with _lock:
            if _lib is None and not _build_failed:
                _lib = _build()
    return _lib


def midi_bytes_to_octuple(data: bytes,
                          task: str = "pretrain") -> Optional[List[Tuple[int, ...]]]:
    """Native parse+quantize; None if the native library is unavailable.

    Raises ``ValueError`` on malformed input (parity with the Python path).
    """
    lib = _get()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_int32)()
    n = lib.pbx_midi_to_octuple(data, len(data), _TASKS.get(task, 0),
                                ctypes.byref(out))
    if n == -1:
        raise ValueError("not a standard MIDI file (no MThd)")
    if n == -2:
        raise ValueError("unsupported time signature")
    if n == -3:
        raise AssertionError("invalid time signature change")
    if n <= 0:
        return []
    try:
        arr = np.ctypeslib.as_array(out, shape=(n, 9)).copy()
    finally:
        lib.pbx_free(out)
    width = 9 if task in ("melody", "velocity") else 8
    return [tuple(int(x) for x in row[:width]) for row in arr]
