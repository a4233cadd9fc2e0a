"""ctypes bindings for the native C++ image pipeline (image_pipe.cpp).

The shared library is compiled on first use with the system toolchain
(g++, libjpeg, libpng — all baked into the image) and cached next to the
source keyed by a source hash, so a source edit triggers a rebuild and a
clean checkout builds once.  Everything degrades gracefully: if the
toolchain or the image libraries are unavailable, ``load_pipe()`` returns
``None`` and callers fall back to the pure-Python (PIL) path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
import time
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "image_pipe.cpp")

# PIL resample constant -> native filter id (image_pipe.cpp ABI)
_PIL_FILTER = {2: 0, 3: 1}  # Image.BILINEAR -> 0, Image.BICUBIC -> 1


def native_filter_for(method) -> Optional[int]:
    """Native filter id for a PIL resample constant; None if unsupported."""
    return _PIL_FILTER.get(int(method))


_lock = threading.Lock()
_pipe = None
_pipe_err: Optional[str] = None


def _build() -> str:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_DIR, f"_image_pipe_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    # stale builds from older source revisions + orphaned temp objects
    # from crashed builds.  Recent .tmp files are another process's
    # IN-PROGRESS build — deleting them would make its os.replace fail and
    # silently demote that process to the PIL fallback for its lifetime;
    # only reap temps older than a build could plausibly run.
    now = time.time()
    for name in os.listdir(_DIR):
        path = os.path.join(_DIR, name)
        if name.startswith("_image_pipe_") and name.endswith(".so"):
            try:
                os.unlink(path)
            except OSError:
                pass
        elif name.startswith("_image_pipe_") and name.endswith(".tmp"):
            try:
                if now - os.path.getmtime(path) > 300:
                    os.unlink(path)
            except OSError:
                pass
    tmp = f"{so_path}.{os.getpid()}.tmp"  # unique per process: concurrent
    # first-use builds must not publish each other's half-written objects
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", tmp, "-ljpeg", "-lpng", "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    try:
        os.replace(tmp, so_path)
    except OSError:
        # a racing build published first and cleanup removed our temp;
        # its .so is byte-equivalent (same source hash) — use it
        if not os.path.exists(so_path):
            raise
    return so_path


class ImagePipe:
    """Thin typed wrapper over the C ABI."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.cat_decode_resize.restype = ctypes.c_int
        lib.cat_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte)]
        lib.cat_fetch_batch.restype = ctypes.c_int
        lib.cat_fetch_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.cat_fill_bank.restype = ctypes.c_int
        lib.cat_fill_bank.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]

    @staticmethod
    def _paths_array(paths: Sequence[str]):
        arr = (ctypes.c_char_p * len(paths))()
        arr[:] = [p.encode() for p in paths]
        return arr

    def decode_resize(self, path: str, load_size: int,
                      filter: int = 1) -> np.ndarray:
        out = np.empty((load_size, load_size, 3), np.uint8)
        rc = self._lib.cat_decode_resize(
            path.encode(), load_size, filter,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        if rc:
            raise IOError(f"native decode failed: {path}")
        return out

    def fetch_batch(
        self,
        paths: Sequence[str],
        load_size: int,
        crop_size: int,
        crop_x: np.ndarray,
        crop_y: np.ndarray,
        flip: np.ndarray,
        nthreads: int = 4,
        filter: int = 1,
    ) -> np.ndarray:
        """Batch of float32 [-1, 1] NHWC crops, decoded on C++ threads."""
        n = len(paths)
        out = np.empty((n, crop_size, crop_size, 3), np.float32)
        cx = np.ascontiguousarray(crop_x, np.int32)
        cy = np.ascontiguousarray(crop_y, np.int32)
        fl = np.ascontiguousarray(flip, np.uint8)
        rc = self._lib.cat_fetch_batch(
            self._paths_array(paths), n, load_size, crop_size, filter,
            cx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            cy.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            fl.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nthreads)
        if rc:
            raise IOError(f"native decode failed: {paths[rc - 1]}")
        return out

    def fill_bank(self, paths: Sequence[str], load_size: int,
                  nthreads: int = 4, filter: int = 1) -> np.ndarray:
        """(N, load, load, 3) uint8 stack for the HBM-resident bank."""
        n = len(paths)
        out = np.empty((n, load_size, load_size, 3), np.uint8)
        rc = self._lib.cat_fill_bank(
            self._paths_array(paths), n, load_size, filter,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), nthreads)
        if rc:
            raise IOError(f"native decode failed: {paths[rc - 1]}")
        return out


def load_pipe() -> Optional[ImagePipe]:
    """Build (once) and load the native pipeline; None if unavailable."""
    global _pipe, _pipe_err
    with _lock:
        if _pipe is not None or _pipe_err is not None:
            return _pipe
        try:
            _pipe = ImagePipe(ctypes.CDLL(_build()))
        except Exception as e:  # toolchain/libs missing: PIL fallback
            _pipe_err = str(e)
        return _pipe


def pipe_error() -> Optional[str]:
    return _pipe_err
