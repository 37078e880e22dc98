"""Input-pipeline robustness: corrupt records, streaming decode, shuffling."""

import numpy as np
import pytest

from skeleton_action_recognition_tpu.data import tfrecord
from skeleton_action_recognition_tpu.data.pipeline import TFRecordDataset


def _write_records(path, n=6, t=4):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(n, 3, t, 25, 2)).astype(np.float32)
    with tfrecord.TFRecordWriter(str(path)) as w:
        for i in range(n):
            w.write(tfrecord.serialize_example(data[i], i))
    return data


def test_corrupt_payload_detected(tmp_path):
    path = tmp_path / "x.tfrecord"
    _write_records(path)
    raw = bytearray(path.read_bytes())
    raw[40] ^= 0xFF  # flip a byte inside the first payload
    path.write_bytes(bytes(raw))
    with pytest.raises(IOError, match="corrupt"):
        list(tfrecord.TFRecordReader(str(path)))
    # check_crc=False skips validation (fast path)
    assert len(list(tfrecord.TFRecordReader(str(path), check_crc=False))) == 6


def test_streaming_decode_matches_batch(tmp_path):
    d = tmp_path / "ds"
    d.mkdir()
    data = _write_records(d / "a.tfrecord")
    ds = TFRecordDataset(str(d), batch_size=4, num_classes=6)
    streamed = list(ds.iter_decoded())
    assert len(streamed) == 6
    np.testing.assert_array_equal(streamed[2][0], data[2])
    assert streamed[2][1] == 2


def test_shuffle_is_seeded_and_covers_all(tmp_path):
    d = tmp_path / "ds"
    d.mkdir()
    _write_records(d / "a.tfrecord")
    ds1 = TFRecordDataset(
        str(d), batch_size=2, num_classes=6, shuffle=True, seed=7
    )
    ds2 = TFRecordDataset(
        str(d), batch_size=2, num_classes=6, shuffle=True, seed=7
    )
    labels1 = [
        int(y.argmax()) for _, ys in ds1.batches() for y in ys
    ]
    labels2 = [
        int(y.argmax()) for _, ys in ds2.batches() for y in ys
    ]
    assert labels1 == labels2  # deterministic under a seed
    assert sorted(labels1) == list(range(6))  # full coverage


def test_stream_len_never_materializes(tmp_path):
    """``stream=True`` + ``len()`` must count via the framing walk, not
    decode the corpus into RAM (VERDICT r1 item 6)."""
    d = tmp_path / "ds"
    d.mkdir()
    rng = np.random.default_rng(5)
    data = rng.normal(size=(11, 3, 4, 25, 2)).astype(np.float32)
    tfrecord.write_dataset(
        data, np.arange(11), str(d), "t", num_shards=3
    )
    ds = TFRecordDataset(
        str(d), batch_size=4, num_classes=11, stream=True
    )
    assert len(ds) == 3
    assert ds.num_samples() == 11
    assert ds._cache is None  # nothing decoded
    dr = TFRecordDataset(
        str(d), batch_size=4, num_classes=11, stream=True,
        drop_remainder=True,
    )
    assert len(dr) == 2
    assert dr._cache is None


def test_count_records_matches_python_and_native(tmp_path):
    path = tmp_path / "x.tfrecord"
    _write_records(path, n=9)
    assert tfrecord.count_records(str(path)) == 9
    from skeleton_action_recognition_tpu import native

    if native.load() is not None:
        assert native.count_records(str(path)) == 9


def test_native_shard_decode_matches_python(tmp_path):
    """The one-call native decoder must be byte-identical to the Python
    proto walker (and both to the written data)."""
    path = tmp_path / "x.tfrecord"
    data = _write_records(path, n=6)
    feats, labels = tfrecord.decode_shard(str(path))
    np.testing.assert_array_equal(feats, data)
    np.testing.assert_array_equal(labels, np.arange(6))
    # python fallback path produces the same thing
    ref = [
        tfrecord.parse_example(p)
        for p in tfrecord.TFRecordReader(str(path))
    ]
    np.testing.assert_array_equal(np.stack([f for f, _ in ref]), feats)


def test_native_decode_rejects_corruption(tmp_path):
    from skeleton_action_recognition_tpu import native

    if native.load() is None:
        pytest.skip("native library not built")
    path = tmp_path / "x.tfrecord"
    _write_records(path)
    raw = bytearray(path.read_bytes())
    raw[40] ^= 0xFF
    path.write_bytes(bytes(raw))
    with pytest.raises(IOError, match="code -3"):
        native.decode_tfrecord(str(path), 6, (3, 4, 25, 2))
    # wrong expected shape -> -5
    good = tmp_path / "y.tfrecord"
    _write_records(good)
    with pytest.raises(IOError, match="code -5"):
        native.decode_tfrecord(str(good), 6, (3, 5, 25, 2))


def test_empty_directory_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        TFRecordDataset(str(tmp_path), batch_size=2)


def test_streaming_mode_matches_cached(tmp_path):
    d = tmp_path / "ds"
    d.mkdir()
    rng = np.random.default_rng(3)
    data = rng.normal(size=(10, 3, 4, 25, 2)).astype(np.float32)
    tfrecord.write_dataset(
        data, np.arange(10), str(d), "t", num_shards=3
    )
    cached = TFRecordDataset(str(d), batch_size=4, num_classes=10)
    streamed = TFRecordDataset(
        str(d), batch_size=4, num_classes=10, stream=True
    )
    lc = [int(y.argmax()) for _, ys in cached.batches() for y in ys]
    ls = [int(y.argmax()) for _, ys in streamed.batches() for y in ys]
    assert sorted(lc) == sorted(ls) == list(range(10))
    # shuffled streaming still covers everything (per-shard shuffle)
    sh = TFRecordDataset(
        str(d), batch_size=4, num_classes=10, stream=True, shuffle=True
    )
    assert sorted(
        int(y.argmax()) for _, ys in sh.batches() for y in ys
    ) == list(range(10))
    # drop_remainder drops the final partial batch
    dr = TFRecordDataset(
        str(d), batch_size=4, num_classes=10, stream=True,
        drop_remainder=True,
    )
    assert sum(len(ys) for _, ys in dr.batches()) == 8


def test_stream_shuffle_buffer_mixes_across_shards(tmp_path):
    """The cross-shard reservoir must (a) cover every sample exactly
    once, (b) actually mix samples across shard boundaries, and (c) keep
    features paired with their labels."""
    d = tmp_path / "ds"
    d.mkdir()
    rng = np.random.default_rng(5)
    n = 24
    data = rng.normal(size=(n, 3, 4, 25, 2)).astype(np.float32)
    tfrecord.write_dataset(
        data, np.arange(n), str(d), "t", num_shards=4
    )
    ds = TFRecordDataset(
        str(d), batch_size=4, num_classes=n, stream=True, shuffle=True,
        shuffle_buffer=8, seed=11,
    )
    seen = []
    for xs, ys in ds.batches():
        for x, y in zip(xs, ys):
            label = int(y.argmax())
            seen.append(label)
            np.testing.assert_array_equal(x, data[label])
    assert sorted(seen) == list(range(n))

    # the first emitted shard-chunk (6 samples per shard) must not be a
    # permutation of a single shard's samples once the reservoir spans
    # shards: with buffer 8 > shard size 6, some of the first 6 emitted
    # labels must come from a later shard
    first_shard = {
        int(label)
        for label in seen[:6]
    }
    # labels were written sequentially into 4 shards of 6
    shards = [set(range(i * 6, (i + 1) * 6)) for i in range(4)]
    assert not any(first_shard <= s for s in shards)

    # buffer 0 falls back to within-shard-only mixing and still covers
    ds0 = TFRecordDataset(
        str(d), batch_size=4, num_classes=n, stream=True, shuffle=True,
        shuffle_buffer=0, seed=11,
    )
    assert sorted(
        int(y.argmax()) for _, ys in ds0.batches() for y in ys
    ) == list(range(n))


def test_prefetch_to_device_preserves_order_and_pairs():
    from skeleton_action_recognition_tpu.parallel.sharding import (
        prefetch_to_device,
    )

    items = [(np.full((2,), i), np.full((2,), -i)) for i in range(5)]
    out = list(
        prefetch_to_device(iter(items), lambda x, y: (x + 0, y + 0))
    )
    assert len(out) == 5
    for i, (x, y) in enumerate(out):
        assert x[0] == i and y[0] == -i
