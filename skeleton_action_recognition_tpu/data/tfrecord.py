"""TFRecord container IO implemented from scratch (no TensorFlow).

Record framing (the TFRecord on-disk format):

    uint64 LE   payload length
    uint32 LE   masked crc32c of the length bytes
    bytes       payload (a serialized tf.train.Example here)
    uint32 LE   masked crc32c of the payload

with ``masked = ((crc >> 15 | crc << 17) + 0xa282ead8) mod 2^32``.

The reader/writer interoperate byte-for-byte with TensorFlow's
(validated in tests against ``tf.io`` when TF is importable). The sample
payloads mirror ``data_gen/gen_tfrecord_data.py:25-33``: a ``features``
BytesList holding a serialized float32 TensorProto and an int64 ``label``.

A C++ fast path for crc32c + record scanning lives in ``native/``; this
module uses it automatically when the shared library has been built.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator, List, Optional, Tuple

import numpy as np

from skeleton_action_recognition_tpu.data import proto

# --------------------------------------------------------------------------
# crc32c (Castagnoli), table-driven; numpy-vectorized over the payload.
# --------------------------------------------------------------------------

def _make_table() -> np.ndarray:
    poly = 0x82F63B78
    table = np.zeros(256, np.uint32)
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
        table[i] = crc
    return table


_TABLE = _make_table()
_MASK_DELTA = 0xA282EAD8

def crc32c(data: bytes) -> int:
    from skeleton_action_recognition_tpu import native

    value = native.crc32c(data)
    if value is not None:
        return value
    crc = np.uint32(0xFFFFFFFF)
    table = _TABLE
    for b in np.frombuffer(data, np.uint8):
        crc = table[(crc ^ b) & np.uint32(0xFF)] ^ (crc >> np.uint8(8))
    return int(crc ^ np.uint32(0xFFFFFFFF))


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15 | crc << 17) + _MASK_DELTA) & 0xFFFFFFFF


# --------------------------------------------------------------------------
# Record framing
# --------------------------------------------------------------------------

class TFRecordWriter:
    """Streaming TFRecord writer."""

    def __init__(self, path: str):
        self._f = open(path, "wb")

    def write(self, payload: bytes) -> None:
        length = struct.pack("<Q", len(payload))
        self._f.write(length)
        self._f.write(struct.pack("<I", masked_crc32c(length)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", masked_crc32c(payload)))

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class TFRecordReader:
    """Iterate raw payloads of one or more TFRecord files."""

    def __init__(self, paths, check_crc: bool = True):
        if isinstance(paths, (str, os.PathLike)):
            paths = [paths]
        self.paths: List[str] = [str(p) for p in paths]
        self.check_crc = check_crc

    def __iter__(self) -> Iterator[bytes]:
        for path in self.paths:
            with open(path, "rb") as f:
                while True:
                    header = f.read(12)
                    if len(header) < 12:
                        break
                    (length,) = struct.unpack("<Q", header[:8])
                    payload = f.read(length)
                    footer = f.read(4)
                    if self.check_crc:
                        (lcrc,) = struct.unpack("<I", header[8:])
                        if masked_crc32c(header[:8]) != lcrc:
                            raise IOError(f"{path}: corrupt length crc")
                        (pcrc,) = struct.unpack("<I", footer)
                        if masked_crc32c(payload) != pcrc:
                            raise IOError(f"{path}: corrupt payload crc")
                    yield payload


def count_records(path) -> int:
    """Record count of one shard by walking the framing (no crc, no
    payload decode) — O(records) seeks, never materializes data."""
    from skeleton_action_recognition_tpu import native

    n = native.count_records(str(path))
    if n is not None:
        return n
    count = 0
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if len(header) < 12:
                break
            (length,) = struct.unpack("<Q", header[:8])
            f.seek(length + 4, os.SEEK_CUR)
            count += 1
    return count


def decode_shard(path, sample_shape=None) -> Tuple[np.ndarray, np.ndarray]:
    """Decode one whole shard -> ``(feats (N, *shape) f32, labels (N,)
    i64)``.

    Uses the native one-call decoder when built (GIL-free — shards
    decode in parallel from a thread pool; the tf.data-equivalent of
    ``num_parallel_reads`` at ``main_gnn.py:170-180``); falls back to
    the pure-Python proto walker. ``sample_shape=None`` infers the shape
    from the first record.
    """
    from skeleton_action_recognition_tpu import native

    reader = TFRecordReader([str(path)])
    if sample_shape is None:
        first = next(iter(reader), None)
        if first is None:
            return (
                np.empty((0,), np.float32),
                np.empty((0,), np.int64),
            )
        sample_shape = parse_example(first)[0].shape
    n = count_records(path)
    out = native.decode_tfrecord(str(path), n, tuple(sample_shape))
    if out is not None:
        return out
    feats = np.empty((n,) + tuple(sample_shape), np.float32)
    labels = np.empty((n,), np.int64)
    for i, payload in enumerate(reader):
        f, l = parse_example(payload)
        feats[i] = f
        labels[i] = l
    return feats, labels


# --------------------------------------------------------------------------
# Example-level helpers for the skeleton dataset
# --------------------------------------------------------------------------

def serialize_example(features: np.ndarray, label: int) -> bytes:
    """Skeleton sample -> serialized Example
    (``gen_tfrecord_data.py:25-33``)."""
    tensor = proto.encode_tensor(np.asarray(features, np.float32))
    return proto.encode_example(
        {"features": tensor, "label": int(label)}
    )


def parse_example(payload: bytes) -> Tuple[np.ndarray, int]:
    """Serialized Example -> ``(float32 array, label)``."""
    fields = proto.decode_example(payload)
    tensor = proto.decode_tensor(fields["features"])
    return tensor, int(fields["label"])  # type: ignore[arg-type]


def write_dataset(
    data: np.ndarray,
    labels: np.ndarray,
    out_dir: str,
    prefix: str,
    num_shards: int = 40,
    shuffle: bool = False,
    seed: Optional[int] = 0,
) -> List[str]:
    """Shard a ``(N, ...)`` array + labels into TFRecord files.

    Mirrors ``gen_tfrecord_data.py:36-85``: optional permutation for the
    train split, ``num_shards`` files named ``{prefix}-{shard}.tfrecord``.
    """
    os.makedirs(out_dir, exist_ok=True)
    n = len(labels)
    order = np.arange(n)
    if shuffle:
        order = np.random.default_rng(seed).permutation(n)
    per_shard = max(1, n // num_shards)
    paths = []
    writer = None
    shard = 0
    for i, idx in enumerate(order):
        if i % per_shard == 0 and shard < num_shards:
            if writer:
                writer.close()
            path = os.path.join(out_dir, f"{prefix}-{shard}.tfrecord")
            paths.append(path)
            writer = TFRecordWriter(path)
            shard += 1
        writer.write(serialize_example(data[idx], labels[idx]))
    if writer:
        writer.close()
    return paths


def read_dataset(directory: str):
    """Yield ``(features, label)`` from every ``*.tfrecord`` in a dir."""
    records = sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.endswith("tfrecord")
    )
    for payload in TFRecordReader(records):
        yield parse_example(payload)
