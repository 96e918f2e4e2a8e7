"""ctypes bindings for the native C++ stream framer (native/msk144_io.cpp).

The shared library is built on demand with the repo Makefile (g++ is in the
image; pybind11 is not, hence the C ABI + ctypes). Everything here has a pure
NumPy fallback (runtime/stream.py), so the decoder works without a compiler;
`available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import BinaryIO, Iterator, Optional

import numpy as np

from .. import constants as C

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmsk144_io.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.msk144_framer_create.restype = ctypes.c_void_p
    lib.msk144_framer_create.argtypes = [ctypes.c_int]
    lib.msk144_framer_destroy.argtypes = [ctypes.c_void_p]
    lib.msk144_framer_push.restype = ctypes.c_int
    lib.msk144_framer_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
    lib.msk144_framer_pop.restype = ctypes.c_int
    lib.msk144_framer_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.msk144_framer_windows_emitted.restype = ctypes.c_longlong
    lib.msk144_framer_windows_emitted.argtypes = [ctypes.c_void_p]
    lib.msk144_framer_pending_bytes.restype = ctypes.c_longlong
    lib.msk144_framer_pending_bytes.argtypes = [ctypes.c_void_p]
    lib.msk144_convert_int16_rms.restype = ctypes.c_float
    lib.msk144_convert_int16_rms.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.msk144_convert_iq8.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


class NativeFramer:
    """50%-overlap window framer backed by the C++ ring buffer."""

    def __init__(self, read_mode: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native msk144_io library unavailable")
        self._lib = lib
        self._read_mode = read_mode
        self._h = lib.msk144_framer_create(read_mode)
        if not self._h:
            raise ValueError(f"bad read_mode {read_mode}")
        self._dtype = np.int8 if read_mode == 2 else np.int16
        self._items = C.WINDOW_LEN * (2 if read_mode == 2 else 1)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.msk144_framer_destroy(h)
            self._h = None

    def push(self, data: bytes) -> int:
        """Feed raw stream bytes; returns complete windows now available."""
        return self._lib.msk144_framer_push(self._h, data, len(data))

    def pop(self) -> Optional[np.ndarray]:
        """Next raw window (int16 (5184,) or int8 (10368,)) or None."""
        out = np.empty(self._items, dtype=self._dtype)
        ok = self._lib.msk144_framer_pop(self._h, out.ctypes.data_as(ctypes.c_void_p))
        return out if ok else None

    @property
    def windows_emitted(self) -> int:
        return int(self._lib.msk144_framer_windows_emitted(self._h))

    @property
    def pending_bytes(self) -> int:
        return int(self._lib.msk144_framer_pending_bytes(self._h))


def convert_int16_rms(samples: np.ndarray) -> tuple[np.ndarray, float]:
    """Native int16 -> float32/rms conversion (main.cu:301-323 semantics)."""
    lib = _load()
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    out = np.empty(len(samples), dtype=np.float32)
    rms = lib.msk144_convert_int16_rms(
        samples.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), len(samples))
    return out, float(rms)


def convert_iq8(samples: np.ndarray) -> np.ndarray:
    """Native int8 IQ -> float32 interleaved, scaled 1/128."""
    lib = _load()
    samples = np.ascontiguousarray(samples, dtype=np.int8)
    out = np.empty(len(samples), dtype=np.float32)
    lib.msk144_convert_iq8(samples.ctypes.data_as(ctypes.c_void_p),
                           out.ctypes.data_as(ctypes.c_void_p), len(samples))
    return out


def native_window_stream(fp: BinaryIO, read_mode: int,
                         chunk_bytes: int = 1 << 16) -> Iterator[np.ndarray]:
    """window_stream equivalent driven by the native framer."""
    import sys

    framer = NativeFramer(read_mode)
    item = 1 if read_mode == 2 else 2
    while True:
        data = fp.read(chunk_bytes)
        if data:
            framer.push(data)
            while True:
                w = framer.pop()
                if w is None:
                    break
                yield w
        else:
            # EOF: report the unframed remainder like the reference's short read
            rem_items = framer.pending_bytes // item
            print(f"Incomplete read error. rc={rem_items}", file=sys.stderr)
            return
