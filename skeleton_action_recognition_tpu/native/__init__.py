"""C++ native runtime: fast crc32c and .skeleton parsing via ctypes.

Built with ``make -C skeleton_action_recognition_tpu/native`` (or
:func:`build`); everything degrades gracefully to the pure-Python/numpy
paths when the shared library is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libsar_native.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def build(quiet: bool = True) -> bool:
    """Compile the native library in place; returns success."""
    try:
        subprocess.run(
            ["make", "-C", _DIR],
            check=True,
            capture_output=quiet,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building on first use if a toolchain exists)."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not build():
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    lib.sar_crc32c.restype = ctypes.c_uint32
    lib.sar_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.sar_parse_skeleton.restype = ctypes.c_long
    lib.sar_parse_skeleton.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
    ]
    lib.sar_count_records.restype = ctypes.c_long
    lib.sar_count_records.argtypes = [ctypes.c_char_p]
    lib.sar_decode_tfrecord_file.restype = ctypes.c_long
    lib.sar_decode_tfrecord_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def crc32c(data: bytes) -> Optional[int]:
    lib = load()
    if lib is None:
        return None
    return int(lib.sar_crc32c(data, len(data)))


def parse_skeleton(
    text: bytes, max_body: int, max_frames: int, num_joint: int
) -> Optional[np.ndarray]:
    """Parse raw ``.skeleton`` bytes -> ``(max_body, T, V, 3)`` f32,
    or None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    out = np.zeros((max_body, max_frames, num_joint, 3), np.float32)
    n = lib.sar_parse_skeleton(
        text,
        len(text),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_body,
        max_frames,
        num_joint,
    )
    if n < 0:
        raise ValueError(f".skeleton parse error (code {n})")
    return out[:, :n]


def count_records(path: str) -> Optional[int]:
    """Record count of one TFRecord shard via the framing walk (no crc,
    no decode); None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    n = int(lib.sar_count_records(os.fsencode(path)))
    if n < 0:
        raise IOError(f"{path}: corrupt TFRecord framing (code {n})")
    return n


def decode_tfrecord(
    path: str,
    num_records: int,
    sample_shape: tuple,
    check_crc: bool = True,
) -> Optional[tuple]:
    """Decode one whole shard -> ``(feats (N, *shape) f32, labels (N,)
    i64)``; None when the native library is unavailable. The GIL is
    released for the duration of the call (ctypes), so shards decode in
    parallel from a Python thread pool.

    Raises on corrupt framing/crc/proto or when any sample's
    tensor_content does not match ``sample_shape``.
    """
    lib = load()
    if lib is None:
        return None
    feat_len = int(np.prod(sample_shape))
    feats = np.empty((num_records, feat_len), np.float32)
    labels = np.empty((num_records,), np.int64)
    n = int(
        lib.sar_decode_tfrecord_file(
            os.fsencode(path),
            feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            num_records,
            feat_len,
            1 if check_crc else 0,
        )
    )
    if n < 0:
        raise IOError(f"{path}: TFRecord decode error (code {n})")
    return feats[:n].reshape((n,) + tuple(sample_shape)), labels[:n]
