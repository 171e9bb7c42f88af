"""ctypes binding for the native fstore reader (native/fstore.cc).

Auto-builds `libfstore.so` with g++ on first use (build cached next to the
source); every entry point degrades gracefully to the pure-NumPy RvfsStore
when the toolchain or .so is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

from revisionllm_tpu.data.feature_store import RvfsStore

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libfstore.so")

_lib = None
_lib_error: Optional[str] = None


def _load_lib():
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    try:
        if not os.path.isfile(_SO_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, text=True,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.fstore_open.restype = ctypes.c_void_p
        lib.fstore_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.fstore_close.argtypes = [ctypes.c_void_p]
        lib.fstore_read.restype = ctypes.c_uint64
        lib.fstore_read.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p,
        ]
        lib.fstore_view.restype = ctypes.c_void_p
        lib.fstore_view.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.fstore_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64]
        lib.fstore_pending.restype = ctypes.c_int
        lib.fstore_pending.argtypes = [ctypes.c_void_p]
        lib.fstore_size.restype = ctypes.c_uint64
        lib.fstore_size.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # missing toolchain etc.
        _lib_error = str(e)
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


class NativeRvfsStore:
    """RVFS reader backed by the C++ mmap/prefetch library.

    Same `get`/`get_record` interface as RvfsStore plus `prefetch(keys)` to
    warm upcoming records in worker threads while the TPU computes."""

    def __init__(self, path: str, num_threads: int = 2):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(f"native fstore unavailable: {_lib_error}")
        self._lib = lib
        # reuse the Python-side index parsing
        self._py = RvfsStore(path)
        self.index = self._py.index
        self._data_start = self._py._data_start
        self._handle = lib.fstore_open(path.encode(), num_threads)
        if not self._handle:
            raise RuntimeError(f"fstore_open failed for {path}")

    def close(self):
        if self._handle:
            self._lib.fstore_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __contains__(self, key: str) -> bool:
        return key in self.index

    def keys(self):
        return self.index.keys()

    def _read_meta(self, meta: dict) -> np.ndarray:
        dtype = np.dtype(meta["dtype"])
        count = int(np.prod(meta["shape"])) if meta["shape"] else 1
        nbytes = count * dtype.itemsize
        out = np.empty(count, dtype=dtype)
        got = self._lib.fstore_read(
            self._handle,
            self._data_start + meta["offset"],
            nbytes,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        if got != nbytes:
            raise IOError(f"short read: {got} != {nbytes}")
        return out.reshape(meta["shape"])

    def get_record(self, key: str) -> Dict[str, np.ndarray]:
        return {name: self._read_meta(m) for name, m in self.index[key].items()}

    def get(self, key: str) -> np.ndarray:
        rec = self.index[key]
        if "features" in rec:
            return self._read_meta(rec["features"])
        if "memory_global" in rec:
            return self._read_meta(rec["memory_global"])
        return self._read_meta(next(iter(rec.values())))

    def prefetch(self, keys) -> None:
        for key in keys:
            for meta in self.index.get(key, {}).values():
                dtype = np.dtype(meta["dtype"])
                nbytes = int(np.prod(meta["shape"])) * dtype.itemsize if meta["shape"] else dtype.itemsize
                self._lib.fstore_prefetch(
                    self._handle, self._data_start + meta["offset"], nbytes
                )

    def pending(self) -> int:
        return self._lib.fstore_pending(self._handle)


def open_store_native(path: str, num_threads: int = 2):
    """Best store available: native reader if the toolchain builds, else the
    NumPy memmap reader."""
    if os.path.isfile(path) and native_available():
        try:
            return NativeRvfsStore(path, num_threads)
        except Exception:
            pass
    from revisionllm_tpu.data.feature_store import open_feature_store

    return open_feature_store(path)
