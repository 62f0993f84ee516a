"""ctypes bindings for the C++ host-runtime hot paths (native/ttsmax_native.cc).

Builds lazily with g++ on first use if the shared library is missing; every
caller has a pure-Python fallback, so absence of a toolchain never breaks
the package.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LIB_TRIED = False

_SO_PATH = os.path.join(os.path.dirname(__file__), "libttsmax_native.so")
_SRC_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "ttsmax_native.cc",
)


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o", _SO_PATH,
             _SRC_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if not os.path.exists(_SO_PATH) and os.path.exists(_SRC_PATH):
        _build()
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.ttsmax_levenshtein.restype = ctypes.c_int32
    lib.ttsmax_levenshtein.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    lib.ttsmax_tokenizer_new.restype = ctypes.c_void_p
    lib.ttsmax_tokenizer_free.argtypes = [ctypes.c_void_p]
    lib.ttsmax_tokenizer_add_token.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
    ]
    lib.ttsmax_tokenizer_set_speech_table.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    lib.ttsmax_tokenizer_encode.restype = ctypes.c_int32
    lib.ttsmax_tokenizer_encode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    _LIB = lib
    return _LIB


def levenshtein(ref, hyp) -> int | None:
    """Native edit distance over hashable token sequences; None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    # map tokens to ints (chars or words)
    vocab: dict = {}

    def ids(seq):
        out = np.empty(len(seq), dtype=np.int32)
        for i, tok in enumerate(seq):
            out[i] = vocab.setdefault(tok, len(vocab))
        return out

    r, h = ids(list(ref)), ids(list(hyp))
    rp = r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    hp = h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    return int(lib.ttsmax_levenshtein(rp, len(r), hp, len(h)))


class NativeTokenizer:
    """C++-backed encode for the ByteTokenizer vocabulary. Returns None from
    :meth:`encode` when unavailable (callers fall back to Python)."""

    def __init__(self, added_tokens: dict[str, int], speech_table=None):
        self._lib = get_lib()
        self._handle = None
        if self._lib is None:
            return
        self._handle = self._lib.ttsmax_tokenizer_new()
        for token, tid in added_tokens.items():
            self._lib.ttsmax_tokenizer_add_token(
                self._handle, token.encode("utf-8"), tid
            )
        if speech_table is not None:
            table = np.ascontiguousarray(speech_table, dtype=np.int32)
            self._lib.ttsmax_tokenizer_set_speech_table(
                self._handle,
                table.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(table),
            )

    def encode(self, text: str) -> np.ndarray | None:
        if self._handle is None:
            return None
        data = text.encode("utf-8")
        buf = np.empty(len(data) + 8, dtype=np.int32)
        n = self._lib.ttsmax_tokenizer_encode(
            self._handle,
            (ctypes.c_uint8 * len(data)).from_buffer_copy(data),
            len(data),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(buf),
        )
        if n < 0:
            return None
        return buf[:n].copy()

    def __del__(self):
        if self._handle is not None and self._lib is not None:
            self._lib.ttsmax_tokenizer_free(self._handle)
