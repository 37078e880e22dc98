"""Host→device input pipeline.

Replaces both reference input paths with one loader:

* the TF ``tf.data`` TFRecord pipeline (``main_gnn.py:164-195``) — here a
  thread-prefetched reader over the from-scratch TFRecord module, with
  per-host shard assignment for multi-host training;
* the torch ``utils.Dataset`` ``.npy`` + pickle path (``utils.py:92-140``)
  — here :class:`NumpyDataset`.

The reference's committed ``(256, 256, 1)`` reshape bug
(``main_gnn.py:182`` — a spectrogram-run leftover that breaks the
documented skeleton shape) is not reproduced; samples keep their stored
shape.

The CPU-side 250x cubic upsampling of the torch path is deliberately NOT
done here — it moves on-device into the radar op
(:func:`..ops.virtual_radar.radar_return_upsampled`), which is the
BASELINE.json fusion target.
"""

from __future__ import annotations

import os
import pickle
import queue
import threading
from concurrent import futures
from typing import Iterator, List, Optional, Tuple

import numpy as np

from skeleton_action_recognition_tpu.data import streams, tfrecord

# Decode-pool width: shards decode GIL-free in native code, so size by
# host cores (capped — decode is memory-bandwidth bound well before 16).
_DECODE_THREADS = min(16, (os.cpu_count() or 1) * 2)


def _one_hot(labels: np.ndarray, num_classes: int) -> np.ndarray:
    out = np.zeros((len(labels), num_classes), np.float32)
    out[np.arange(len(labels)), labels] = 1.0
    return out


def stream_transform(name: str):
    """Batch transform deriving a stream from joint data on the fly.

    Lets every stream of the multi-stream ensemble train from the single
    joint TFRecord set instead of 4x dataset copies (the reference
    materializes each stream to disk, ``gen_bone_data.py`` /
    ``gen_motion_data.py``). Names: ``joint``, ``bone``, ``joint_motion``,
    ``bone_motion``.
    """
    if name == "joint":
        return lambda x: x
    if name == "bone":
        return streams.bone_stream
    if name == "joint_motion":
        return lambda x: np.asarray(streams.motion_stream(x))
    if name == "bone_motion":
        return lambda x: np.asarray(
            streams.motion_stream(streams.bone_stream(x))
        )
    raise ValueError(f"unknown stream: {name!r}")


class TFRecordDataset:
    """Batched iterator over a directory of TFRecord shards.

    Shards are statically partitioned across hosts (``process_index`` /
    ``process_count``) so each host reads a disjoint subset — the
    TPU-native replacement for ``experimental_distribute_dataset``.
    """

    def __init__(
        self,
        directory: str,
        batch_size: int,
        num_classes: int = 60,
        shuffle: bool = False,
        drop_remainder: bool = False,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        prefetch: int = 2,
        transform=None,
        stream: bool = False,
        shuffle_buffer: int = 1024,
    ):
        records = sorted(
            os.path.join(directory, f)
            for f in os.listdir(directory)
            if f.endswith("tfrecord")
        )
        if not records:
            raise FileNotFoundError(f"no .tfrecord files in {directory}")
        self.records: List[str] = records[process_index::process_count]
        self.batch_size = batch_size
        self.num_classes = num_classes
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch
        self.transform = transform
        self.stream = stream
        # stream=True shuffle = shard order + a cross-shard reservoir of
        # this many samples (tf.data ``shuffle(buffer_size)`` semantics);
        # 0 falls back to within-shard-only mixing. The in-RAM path
        # (stream=False) always does a full global permutation.
        self.shuffle_buffer = shuffle_buffer
        self._rng = np.random.default_rng(seed)
        self._cache: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self._count: Optional[int] = None
        self._shape: Optional[Tuple[int, ...]] = None

    def _sample_shape(self) -> Tuple[int, ...]:
        """Shape of one sample, from the first record of the first
        non-empty shard."""
        if self._shape is None:
            for payload in tfrecord.TFRecordReader(self.records):
                f, _ = tfrecord.parse_example(payload)
                self._shape = tuple(f.shape)
                break
            else:
                raise ValueError("dataset has no records")
        return self._shape

    def _load_all(self) -> Tuple[np.ndarray, np.ndarray]:
        """Decode every record once; skeleton datasets fit host RAM
        (xview train ≈ 5.8 GB f32) and re-decoding per epoch would waste
        CPU. Shards decode in parallel — the native decoder releases the
        GIL, so the pool scales across host cores (the tf.data
        ``num_parallel_reads`` equivalent, ``main_gnn.py:170-180``).
        Larger-than-RAM corpora stream via ``stream=True`` instead."""
        if self._cache is None:
            shape = self._sample_shape()
            with futures.ThreadPoolExecutor(
                max_workers=min(len(self.records), _DECODE_THREADS)
            ) as pool:
                parts = list(
                    pool.map(
                        lambda p: tfrecord.decode_shard(p, shape),
                        self.records,
                    )
                )
            self._cache = (
                np.concatenate([f for f, _ in parts]),
                np.concatenate([l for _, l in parts]),
            )
        return self._cache

    def iter_decoded(self) -> Iterator[Tuple[np.ndarray, int]]:
        for payload in tfrecord.TFRecordReader(self.records):
            yield tfrecord.parse_example(payload)

    def num_samples(self) -> int:
        """Total record count — framing walk only, so ``stream=True``
        callers (and ``len()``) never materialize the corpus."""
        if self._count is None:
            self._count = sum(
                tfrecord.count_records(p) for p in self.records
            )
        return self._count

    def __len__(self) -> int:
        n = self.num_samples()
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _stream_batches(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Larger-than-RAM mode: decode shard-by-shard each epoch, with a
        background prefetch thread. Shuffling is per-epoch shard order
        plus a cross-shard reservoir of ``shuffle_buffer`` samples
        (tf.data ``shuffle(buffer_size)`` semantics — each emitted sample
        is drawn uniformly from the buffered window, so mixing spans
        shard boundaries); weaker than the in-RAM path's full global
        permutation, by the same trade every sharded streaming loader
        makes."""
        shards = list(self.records)
        if self.shuffle:
            self._rng.shuffle(shards)

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            carry_x, carry_y = [], []
            reservoir: list = []

            def emit(x, y):
                carry_x.append(x)
                carry_y.append(y)
                if len(carry_x) == self.batch_size:
                    batch = np.stack(carry_x).astype(np.float32)
                    if self.transform is not None:
                        batch = self.transform(batch)
                    q.put(
                        (batch,
                         _one_hot(np.asarray(carry_y),
                                  self.num_classes))
                    )
                    carry_x.clear(), carry_y.clear()

            use_reservoir = self.shuffle and self.shuffle_buffer > 0
            for shard in shards:
                feats, labels = tfrecord.decode_shard(shard)
                order = np.arange(len(feats))
                if self.shuffle:
                    order = self._rng.permutation(order)
                for idx in order:
                    if use_reservoir:
                        reservoir.append((feats[idx], labels[idx]))
                        if len(reservoir) >= self.shuffle_buffer:
                            k = int(
                                self._rng.integers(len(reservoir))
                            )
                            reservoir[k], reservoir[-1] = (
                                reservoir[-1], reservoir[k]
                            )
                            emit(*reservoir.pop())
                    else:
                        emit(feats[idx], labels[idx])
            while reservoir:
                k = int(self._rng.integers(len(reservoir)))
                reservoir[k], reservoir[-1] = (
                    reservoir[-1], reservoir[k]
                )
                emit(*reservoir.pop())
            if carry_x and not self.drop_remainder:
                batch = np.stack(carry_x).astype(np.float32)
                if self.transform is not None:
                    batch = self.transform(batch)
                q.put(
                    (batch,
                     _one_hot(np.asarray(carry_y), self.num_classes))
                )
            q.put(stop)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item

    def batches(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield ``(features, one_hot_labels)`` batches with background
        prefetch."""
        if self.stream:
            yield from self._stream_batches()
            return
        data, labels = self._load_all()
        order = np.arange(len(data))
        if self.shuffle:
            order = self._rng.permutation(order)

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            n = len(order)
            end = (
                n - n % self.batch_size if self.drop_remainder else n
            )
            for i in range(0, end, self.batch_size):
                idx = order[i : i + self.batch_size]
                batch = data[idx]
                if self.transform is not None:
                    batch = self.transform(batch)
                q.put(
                    (batch, _one_hot(labels[idx], self.num_classes))
                )
            q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


class NumpyDataset:
    """``.npy`` + pickle-label loader (the torch stack's input,
    ``utils.py:92-140``) with the same batching surface."""

    def __init__(
        self,
        data_path: str,
        label_path: str,
        batch_size: int,
        num_classes: int = 60,
        shuffle: bool = False,
        drop_remainder: bool = False,
        seed: int = 0,
    ):
        with open(label_path, "rb") as f:
            _, labels = pickle.load(f, encoding="latin1")
        self.data = np.load(data_path, mmap_mode="r")
        self.labels = np.asarray(labels, np.int64)
        self.batch_size = batch_size
        self.num_classes = num_classes
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        if self.drop_remainder:
            return len(self.labels) // self.batch_size
        return (
            len(self.labels) + self.batch_size - 1
        ) // self.batch_size

    def batches(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = np.arange(len(self.labels))
        if self.shuffle:
            order = self._rng.permutation(order)
        if self.drop_remainder:
            order = order[: len(order) - len(order) % self.batch_size]
        for i in range(0, len(order), self.batch_size):
            idx = np.sort(order[i : i + self.batch_size])
            yield (
                np.asarray(self.data[idx], np.float32),
                _one_hot(self.labels[idx], self.num_classes),
            )
