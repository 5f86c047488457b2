"""ctypes bindings for the native multithreaded tar-shard reader
(native/muse_io.cpp).  Falls back to the pure-Python reader in data.py when
the shared library can't be built."""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading
from typing import Dict, Iterator, List, Optional

__all__ = ["native_available", "NativeShardReader", "build_native"]

_LIB_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_LIB_DIR, "libmuse_io.so")
_lib = None
_lib_lock = threading.Lock()


def build_native() -> bool:
    """Compile libmuse_io.so with make (idempotent)."""
    try:
        subprocess.run(["make", "-C", _LIB_DIR, "-s"], check=True,
                       capture_output=True)
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.isfile(_LIB_PATH) and not build_native():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mio_pool_create.restype = ctypes.c_void_p
        lib.mio_pool_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                        ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.mio_pool_next.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.mio_pool_next.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_int64)]
        lib.mio_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.mio_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


class NativeShardReader:
    """Iterate key-grouped samples from many shards with C++ worker threads.

    Yields the same dict shape as data.tar_samples:
      {'__key__': key, '<ext>': bytes, ...}
    """

    def __init__(self, shard_urls: List[str], num_threads: int = 4,
                 queue_depth: int = 64):
        lib = _load()
        if lib is None:
            raise RuntimeError("native muse_io library unavailable")
        self._lib = lib
        arr = (ctypes.c_char_p * len(shard_urls))(
            *[u.encode() for u in shard_urls])
        self._pool = lib.mio_pool_create(arr, len(shard_urls), num_threads,
                                         queue_depth)
        self._closed = False

    def __iter__(self) -> Iterator[Dict[str, bytes]]:
        size = ctypes.c_int64()
        while True:
            ptr = self._lib.mio_pool_next(self._pool, ctypes.byref(size))
            if not ptr:
                return
            blob = ctypes.string_at(ptr, size.value)
            self._lib.mio_free(ptr)
            yield self._parse(blob)

    @staticmethod
    def _parse(blob: bytes) -> Dict[str, bytes]:
        (n,) = struct.unpack_from("<I", blob, 0)
        off = 4
        sample: Dict[str, bytes] = {}
        key: Optional[str] = None
        for _ in range(n):
            (name_len,) = struct.unpack_from("<I", blob, off)
            off += 4
            name = blob[off:off + name_len].decode()
            off += name_len
            (data_len,) = struct.unpack_from("<Q", blob, off)
            off += 8
            data = blob[off:off + data_len]
            off += data_len
            if name.startswith("./"):
                name = name[2:]
            if key is None:
                key = name.split(".", 1)[0]
            if "." in name:
                ext = name.split(".", 1)[1].lower()
                sample[ext] = data
        sample["__key__"] = key
        return sample

    def close(self):
        if not self._closed:
            self._lib.mio_pool_destroy(self._pool)
            self._closed = True

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
