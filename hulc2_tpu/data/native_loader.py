"""ctypes bindings for the C++ frame loader (native/frameloader.cpp).

Builds ``libframeloader.so`` on first use with g++ (cached next to the
source); falls back transparently to the NumPy loader when no toolchain is
available. Used by RamFrameStore preloading and the BatchLoader hot path to
extract npz entries in parallel C++ threads (no GIL) directly into
preallocated batch buffers.
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).resolve().parents[2] / "native" / "frameloader.cpp"
_SO = _SRC.parent / "libframeloader.so"
_LIB = None
_TRIED = False

_ERRORS = {
    -1: "entry not found",
    -2: "truncated archive",
    -3: "streaming zip entries unsupported",
    -4: "inflate failed",
    -5: "unsupported compression method",
    -6: "bad npy magic",
    -7: "output buffer too small",
    -10: "file read failed",
}


def _build() -> Optional[ctypes.CDLL]:
    if not _SRC.exists():
        return None
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            str(_SRC), "-o", str(_SO), "-lz", "-lpthread",
        ]
        logger.info("building native frame loader: %s", " ".join(cmd))
        res = subprocess.run(cmd, capture_output=True, text=True)
        if res.returncode != 0:
            logger.warning("native loader build failed: %s", res.stderr[-500:])
            return None
    lib = ctypes.CDLL(str(_SO))
    lib.fl_load_frames.restype = ctypes.c_int
    lib.fl_load_frames.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_char_p,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
    ]
    lib.fl_probe_entry.restype = ctypes.c_int64
    lib.fl_probe_entry.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _build()
        except Exception as e:  # any toolchain trouble -> numpy fallback
            logger.warning("native loader unavailable: %s", e)
            _LIB = None
    return _LIB


def available() -> bool:
    return get_lib() is not None


def load_frames_into(
    paths: Sequence[str], key: str, out: np.ndarray, n_threads: int = 8
) -> None:
    """Fill out[i] with entry ``key`` of paths[i]. ``out`` must be contiguous
    with out[0].nbytes matching the entry payload size."""
    lib = get_lib()
    assert out.flags["C_CONTIGUOUS"]
    frame_bytes = out[0].nbytes
    if lib is None:  # numpy fallback
        for i, p in enumerate(paths):
            with np.load(p) as z:
                out[i] = z[key].reshape(out[i].shape)
        return
    arr = (ctypes.c_char_p * len(paths))(*[str(p).encode() for p in paths])
    rc = lib.fl_load_frames(
        arr, len(paths), key.encode(),
        out.ctypes.data_as(ctypes.c_void_p), frame_bytes, n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"native frame load failed: {_ERRORS.get(rc, rc)}")


def probe_entry_bytes(path: str, key: str) -> int:
    lib = get_lib()
    if lib is None:
        with np.load(path) as z:
            return int(z[key].nbytes)
    size = lib.fl_probe_entry(str(path).encode(), key.encode())
    if size < 0:
        raise RuntimeError(f"probe failed: {_ERRORS.get(int(size), size)}")
    return int(size)
