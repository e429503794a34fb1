"""ctypes bridge to the native C++ n-gram store (ngram/_native/ngram_store.cpp).

``NativeNGramStorage`` implements the INgramStorage interface with identical
semantics to the Python ``NGramStorage`` (cross-checked by tests on random
streams) at C++ hash-map speed — the store is the host-side hot path of NASD
drafting (one lookup per draft token, one update per committed token + fillers).

The shared library is compiled on first use with g++ (toolchain is part of the
environment; no pip packages involved) and cached next to the source.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

from specdec_tpu.ngram.storage import INgramStorage

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_native", "ngram_store.cpp")
_LIB_PATH = os.path.join(_HERE, "_native", "libngram_store.so")
_BUILD_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> str:
    with _BUILD_LOCK:
        if (os.path.exists(_LIB_PATH) and
                os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
            return _LIB_PATH
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
               "-o", _LIB_PATH + ".tmp"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired) as e:
            detail = getattr(e, "stderr", b"")
            raise NativeUnavailable(
                f"building ngram_store failed: {e}\n"
                f"{detail.decode() if detail else ''}") from e
        os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
        return _LIB_PATH


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build())
        lib.ngram_create.restype = ctypes.c_void_p
        lib.ngram_create.argtypes = [ctypes.c_int32, ctypes.c_int32,
                                     ctypes.c_uint64]
        lib.ngram_destroy.argtypes = [ctypes.c_void_p]
        lib.ngram_reset.argtypes = [ctypes.c_void_p]
        lib.ngram_next_token.restype = ctypes.c_int32
        lib.ngram_next_token.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.ngram_has_gram.restype = ctypes.c_int32
        lib.ngram_has_gram.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        lib.ngram_update.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        lib.ngram_initialize.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        lib.ngram_size.restype = ctypes.c_int64
        lib.ngram_size.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def _arr(ids: Sequence[int]):
    buf = (ctypes.c_int32 * len(ids))(*[int(t) for t in ids])
    return buf, len(ids)


class NativeNGramStorage(INgramStorage):
    """Backoff n-gram store backed by the C++ extension."""

    def __init__(self, n: int, vocab_size: int, seed: int = 0):
        super().__init__(n, vocab_size)
        self._h = _lib().ngram_create(n, vocab_size, seed)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                _lib().ngram_destroy(self._h)
                self._h = None
        except Exception:
            pass

    def next_token(self, context: Sequence[int]) -> Tuple[int, bool]:
        buf, n = _arr(context)
        known = ctypes.c_int32(0)
        tok = _lib().ngram_next_token(self._h, buf, n, ctypes.byref(known))
        return int(tok), bool(known.value)

    def has_gram(self, ngram: Sequence[int]) -> bool:
        buf, n = _arr(ngram)
        return bool(_lib().ngram_has_gram(self._h, buf, n))

    def update(self, context: Sequence[int], next_tokens: Sequence[int]):
        cbuf, cn = _arr(context)
        tbuf, tn = _arr(next_tokens)
        _lib().ngram_update(self._h, cbuf, cn, tbuf, tn)

    def initialize(self, token_ids: Sequence[int]):
        buf, n = _arr(token_ids)
        _lib().ngram_initialize(self._h, buf, n)

    def reset(self):
        _lib().ngram_reset(self._h)

    def size(self) -> int:
        return int(_lib().ngram_size(self._h))


def native_available() -> bool:
    try:
        _lib()
        return True
    except NativeUnavailable:
        return False
