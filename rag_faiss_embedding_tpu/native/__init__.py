"""Native (C++) host-side components, loaded via ctypes.

Currently: the fast WordPiece tokenizer (tokenizer.cpp) used on the serving
hot path. The shared library is built lazily with the bundled Makefile (g++)
the first time it's requested; all native components have exact-parity
Python fallbacks, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.logging import get_logger

logger = get_logger(__name__)

_DIR = Path(__file__).parent
_SO = _DIR / "build" / "libwptok.so"


def build_native(force: bool = False) -> Optional[Path]:
    """Compile the shared library if missing; returns its path or None."""
    if _SO.exists() and not force:
        return _SO
    try:
        subprocess.run(
            ["make", "-C", str(_DIR)] + (["-B"] if force else []),
            check=True, capture_output=True, text=True, timeout=120,
        )
        return _SO if _SO.exists() else None
    except Exception as e:
        logger.debug("native tokenizer build failed: %s", e)
        return None


class NativeWordPiece:
    """ctypes wrapper over tokenizer.cpp with Python-fallback contract:
    ``encode`` returns None when the native path can't handle the text
    (non-ASCII), and the caller must use the Python implementation."""

    def __init__(self, vocab: dict, lowercase: bool = True):
        so = build_native()
        if so is None:
            raise RuntimeError("native tokenizer unavailable")
        self._lib = ctypes.CDLL(str(so))
        self._lib.wp_create.restype = ctypes.c_void_p
        self._lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        self._lib.wp_free.argtypes = [ctypes.c_void_p]
        self._lib.wp_encode.restype = ctypes.c_int32
        self._lib.wp_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        self._lib.wp_encode_batch.restype = ctypes.c_int32
        self._lib.wp_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        items = sorted(vocab.items(), key=lambda kv: kv[1])
        lines = "\n".join(tok for tok, _ in items)
        self._handle = self._lib.wp_create(lines.encode("utf-8"),
                                           1 if lowercase else 0)
        self.pad_id = vocab.get("[PAD]", 0)

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.wp_free(self._handle)
        except Exception:
            pass

    def encode(self, text: str, max_length: int = 512) -> Optional[List[int]]:
        try:
            raw = text.encode("ascii")
        except UnicodeEncodeError:
            return None
        buf = (ctypes.c_int32 * max_length)()
        n = self._lib.wp_encode(self._handle, raw, max_length, buf)
        if n < 0:
            return None
        return list(buf[:n])

    def encode_batch(
        self, texts: Sequence[str], max_length: int
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(ids, mask, fallback_flags); rows flagged 1 must be re-encoded by
        the Python path."""
        try:
            blob = b"\0".join(t.encode("ascii") for t in texts) + b"\0"
        except UnicodeEncodeError:
            return None, None, np.ones(len(texts), np.int32)
        n = len(texts)
        ids = np.empty((n, max_length), np.int32)
        mask = np.empty((n, max_length), np.int32)
        flags = np.empty((n,), np.int32)
        self._lib.wp_encode_batch(
            self._handle, blob, n, max_length, self.pad_id,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            flags.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return ids, mask, flags
