"""ctypes bindings for the native tar streamer (native/tario.cc).

`NativeTarReader` is a drop-in accelerated backend for
`mmada_tpu.data.webdataset.WebDatasetReader`: N C++ threads stream tar
shards and group samples off-GIL; Python only decodes/transforms. Build
with `make -C native` (creates mmada_tpu/data/libtario.so); callers fall
back to the pure-Python reader when the library is absent.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Iterator, Optional

logger = logging.getLogger(__name__)

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native", "libtario.so")


class _EntryView(ctypes.Structure):
    _fields_ = [
        ("ext", ctypes.c_char_p),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
        ("size", ctypes.c_uint64),
    ]


class _SampleView(ctypes.Structure):
    _fields_ = [
        ("key", ctypes.c_char_p),
        ("entries", ctypes.POINTER(_EntryView)),
        ("num_entries", ctypes.c_uint64),
        ("owner", ctypes.c_void_p),
    ]


def _ensure_built() -> Optional[str]:
    if os.path.exists(_LIB_PATH):
        return _LIB_PATH
    makefile_dir = os.path.join(os.path.dirname(__file__), "..", "..", "native")
    if os.path.exists(os.path.join(makefile_dir, "Makefile")):
        try:
            subprocess.run(
                ["make", "-C", makefile_dir], check=True, capture_output=True
            )
            if os.path.exists(_LIB_PATH):
                return _LIB_PATH
        except Exception as e:
            logger.warning("tario build failed: %s", e)
    return None


_lib = None


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    path = _ensure_built()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.tario_open.restype = ctypes.c_void_p
    lib.tario_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_int32,
    ]
    lib.tario_next.restype = ctypes.c_int32
    lib.tario_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(_SampleView)]
    lib.tario_free_sample.argtypes = [ctypes.POINTER(_SampleView)]
    lib.tario_stats.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.tario_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


class NativeTarReader:
    """Iterate raw grouped samples: dicts {ext: bytes, '__key__': str}."""

    def __init__(self, shards: list[str], threads: int = 4,
                 capacity: int = 256, loop: bool = False):
        lib = load_library()
        if lib is None:
            raise RuntimeError("libtario.so unavailable (run make -C native)")
        self._lib = lib
        encoded = [s.encode() for s in shards]
        arr = (ctypes.c_char_p * len(encoded))(*encoded)
        self._handle = lib.tario_open(
            arr, len(encoded), threads, capacity, 1 if loop else 0
        )
        if not self._handle:
            raise RuntimeError("tario_open failed")

    def __iter__(self) -> Iterator[dict]:
        view = _SampleView()
        while True:
            rc = self._lib.tario_next(self._handle, ctypes.byref(view))
            if rc == 0:
                return
            if rc < 0:
                raise RuntimeError("tario_next error")
            sample = {"__key__": view.key.decode(errors="replace")}
            for i in range(view.num_entries):
                e = view.entries[i]
                sample[e.ext.decode()] = ctypes.string_at(e.data, e.size)
            self._lib.tario_free_sample(ctypes.byref(view))
            yield sample

    def stats(self) -> dict:
        s, bm, bs = ctypes.c_uint64(), ctypes.c_uint64(), ctypes.c_uint64()
        self._lib.tario_stats(
            self._handle, ctypes.byref(s), ctypes.byref(bm), ctypes.byref(bs)
        )
        return {
            "samples": s.value, "bad_members": bm.value, "bad_shards": bs.value
        }

    def close(self):
        if self._handle:
            self._lib.tario_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
