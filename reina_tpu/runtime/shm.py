"""ctypes bindings for the native shared-memory KV store
(cpp/shmcache). Builds the library on first use if g++ is available."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "_native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libshmcache.so")
_CPP_DIR = os.path.normpath(os.path.join(
    os.path.dirname(__file__), "..", "..", "cpp"))


def _ensure_built() -> str:
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _CPP_DIR], check=True,
                       capture_output=True)
    return _LIB_PATH


_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_ensure_built())
        lib.shmcache_open.restype = ctypes.c_void_p
        lib.shmcache_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.shmcache_set.restype = ctypes.c_int
        lib.shmcache_set.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
            ctypes.c_char_p, ctypes.c_uint32, ctypes.c_double]
        lib.shmcache_get.restype = ctypes.c_int64
        lib.shmcache_get.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
            ctypes.c_char_p, ctypes.c_uint64]
        lib.shmcache_delete.restype = ctypes.c_int
        lib.shmcache_delete.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32]
        lib.shmcache_close.argtypes = [ctypes.c_void_p]
        lib.shmcache_unlink.argtypes = [ctypes.c_char_p]
        _lib = lib
    return _lib


class ShmKV:
    """A named, process-shared KV segment with per-key TTLs."""

    def __init__(self, name: str, capacity: int = 256 << 20):
        self._lib = _load()
        self._name = name.encode()
        self._h = self._lib.shmcache_open(self._name, capacity)
        if not self._h:
            raise OSError(f"shmcache_open({name!r}) failed")

    def set(self, key: bytes, value: bytes, ttl: float = 0.0) -> None:
        rc = self._lib.shmcache_set(self._h, key, len(key), value,
                                    len(value), ttl)
        if rc != 0:
            raise OSError(f"shmcache_set failed: {rc}")

    def get(self, key: bytes) -> Optional[bytes]:
        buf_size = 1 << 16
        while True:
            buf = ctypes.create_string_buffer(buf_size)
            n = self._lib.shmcache_get(self._h, key, len(key), buf, buf_size)
            if n == 0:
                return None
            if n < 0:
                buf_size = -n
                continue
            return buf.raw[:n]

    def delete(self, key: bytes) -> None:
        self._lib.shmcache_delete(self._h, key, len(key))

    def close(self) -> None:
        if self._h:
            self._lib.shmcache_close(self._h)
            self._h = None

    @staticmethod
    def unlink(name: str) -> None:
        _load().shmcache_unlink(name.encode())
