"""Data-layer tests: parser, pre-normalization, streams, TFRecord IO."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from skeleton_action_recognition_tpu import data as sar_data
from skeleton_action_recognition_tpu.data import preprocess, skeleton, streams, tfrecord


# --------------------------------------------------------------------------
# skeleton parser
# --------------------------------------------------------------------------

def _write_synthetic_skeleton(path, frames):
    """frames: list of list-of-(25,3) bodies."""
    lines = [str(len(frames))]
    for bodies in frames:
        lines.append(str(len(bodies)))
        for body in bodies:
            lines.append("72057594037931101 0 1 1 1 1 0 0.1 -0.2 2")
            lines.append("25")
            for j in range(25):
                x, y, z = body[j]
                lines.append(
                    f"{x} {y} {z} 100 200 300 400 0.1 0.2 0.3 0.4 2"
                )
    path.write_text("\n".join(lines) + "\n")


def test_parse_and_read_xyz(tmp_path):
    rng = np.random.default_rng(0)
    still = rng.normal(size=(25, 3)) * 0.01  # low-energy body
    moving = [rng.normal(size=(25, 3)) for _ in range(3)]  # high-energy
    frames = [[moving[t], still] for t in range(3)]
    f = tmp_path / "S001C002P003R004A005.skeleton"
    _write_synthetic_skeleton(f, frames)

    out = skeleton.read_xyz(str(f))
    assert out.shape == (3, 3, 25, 2)
    # highest-energy body (the moving one) should be slot 0
    np.testing.assert_allclose(
        out[:, 0, :, 0], moving[0].T[:, :], atol=1e-6
    )
    energy0 = skeleton.nonzero_std_energy(
        out.transpose(3, 1, 2, 0)[0]
    )
    energy1 = skeleton.nonzero_std_energy(
        out.transpose(3, 1, 2, 0)[1]
    )
    assert energy0 > energy1


def test_sample_metadata_and_split():
    name = "S001C002P003R004A015.skeleton"
    setup, cam, subj, rep, act = skeleton.sample_metadata(name)
    assert (setup, cam, subj, rep, act) == (1, 2, 3, 4, 15)

    names = [
        "S001C001P001R001A001.skeleton",  # cam 1 -> xview val; subj 1 -> xsub train
        "S001C002P099R001A002.skeleton",  # cam 2 -> xview train; subj 99 -> xsub val
    ]
    tr, tl = skeleton.split_samples(names, "xview", "train")
    assert tr == [names[1]] and tl == [1]
    va, vl = skeleton.split_samples(names, "xsub", "val")
    assert va == [names[1]] and vl == [1]
    tr2, _ = skeleton.split_samples(
        names, "xview", "train", ignored=[names[1]]
    )
    assert tr2 == []


# --------------------------------------------------------------------------
# pre-normalization
# --------------------------------------------------------------------------

def _synthetic_raw(seed=0, n=3, t=20, zero_tail=8):
    """Raw-looking clips: random walk joints, trailing zero frames,
    second body missing for one sample, one empty leading frame."""
    rng = np.random.default_rng(seed)
    d = np.zeros((n, 3, t, 25, 2), np.float32)
    for i in range(n):
        walk = np.cumsum(rng.normal(0, 0.02, size=(t - zero_tail, 25, 3)), 0)
        base = rng.normal(0, 1, size=(1, 25, 3))
        d[i, :, : t - zero_tail, :, 0] = (walk + base).transpose(2, 0, 1)
        if i == 0:
            d[i, :, 2 : t - zero_tail, :, 1] = (
                walk[: t - zero_tail - 2] + base + 0.5
            ).transpose(2, 0, 1)
    return d


def test_pre_normalize_np_semantics():
    d = _synthetic_raw()
    out = preprocess.pre_normalize_np(d)
    s = out.transpose(0, 4, 2, 3, 1)  # N, M, T, V, C
    # trailing frames are tiled copies of the valid prefix
    np.testing.assert_allclose(s[0, 0, 12], s[0, 0, 0], atol=1e-6)
    # body 0's spine joint is centered to ~0 on valid frames
    assert np.abs(s[:, 0, :, 1, :]).max() < 1e-5
    # x-alignment (the final pass): frame-0 shoulder bone lies on the
    # x axis exactly. (The earlier z-alignment is generally *not*
    # preserved by this pass — same as the reference, where pass 4's
    # rotation axis is only approximately z on real data.)
    sh = s[0, 0, 0, 8] - s[0, 0, 0, 4]
    np.testing.assert_allclose(sh[1:], 0, atol=1e-5)

    # z-alignment in isolation: degenerate xaxis pair -> identity pass 4
    out_z = preprocess.pre_normalize_np(d.copy(), xaxis=(4, 4))
    sz = out_z.transpose(0, 4, 2, 3, 1)
    bone = sz[0, 0, 0, 1] - sz[0, 0, 0, 0]
    np.testing.assert_allclose(bone[:2], 0, atol=1e-5)
    assert bone[2] > 0


def test_pre_normalize_jax_matches_np():
    d = _synthetic_raw(seed=1)
    out_np = preprocess.pre_normalize_np(d)
    out_jax = np.asarray(preprocess.pre_normalize(jnp.asarray(d)))
    np.testing.assert_allclose(out_jax, out_np, atol=2e-5)


def test_pre_normalize_compaction_path():
    """First-frame-empty bodies get their valid frames compacted forward."""
    d = np.zeros((1, 3, 10, 25, 2), np.float32)
    rng = np.random.default_rng(3)
    frames = rng.normal(size=(4, 25, 3))
    # body 0: valid frames at 2,3,4,5 only
    d[0, :, 2:6, :, 0] = frames.transpose(2, 0, 1)
    out_np = preprocess.pre_normalize_np(d)
    out_jax = np.asarray(preprocess.pre_normalize(jnp.asarray(d)))
    np.testing.assert_allclose(out_jax, out_np, atol=2e-5)
    s = out_np.transpose(0, 4, 2, 3, 1)
    # frame 0 now valid; tiling fills the rest cyclically with period 4
    assert np.abs(s[0, 0, 0]).sum() > 0
    np.testing.assert_allclose(s[0, 0, 4], s[0, 0, 0], atol=1e-6)


def test_pre_normalize_postconditions_on_bundled(ntu_examples):
    """Run the committed algorithm over the bundled real clips and check
    its postconditions hold.

    (NB: the bundled ``NTU_preprocessed_skeleton_examples.npy`` is *not* a
    fixed point of the committed ``preprocess.py`` — its person-0 spine
    joint is not zero-centered and trailing frames are untiled, i.e. it was
    generated by an earlier pipeline revision. The committed algorithm is
    the parity target.)"""
    d = ntu_examples
    out = preprocess.pre_normalize_np(d.copy())
    s = out.transpose(0, 4, 2, 3, 1)  # N, M, T, V, C
    # person-0 spine joint centered to 0 on all frames
    assert np.abs(s[:, 0, :, 1, :]).max() < 1e-5
    # trailing frames tiled: every frame valid for person 0 now
    assert ((s[:, 0].sum((2, 3)) != 0).all(axis=-1)).all()
    # frame-0 shoulder bone on the x axis
    sh = s[:, 0, 0, 8] - s[:, 0, 0, 4]
    np.testing.assert_allclose(sh[:, 1:], 0, atol=1e-5)
    # jax implementation agrees on real data
    out_jax = np.asarray(preprocess.pre_normalize(jnp.asarray(d)))
    np.testing.assert_allclose(out_jax, out, atol=5e-5)


def test_pre_normalize_zero_sample_passthrough():
    d = np.zeros((1, 3, 5, 25, 2), np.float32)
    np.testing.assert_array_equal(preprocess.pre_normalize_np(d.copy()), d)
    np.testing.assert_array_equal(
        np.asarray(preprocess.pre_normalize(jnp.asarray(d))), d
    )


# --------------------------------------------------------------------------
# streams
# --------------------------------------------------------------------------

def test_bone_stream_semantics(ntu_examples):
    joints = ntu_examples[:2]
    bones = streams.bone_stream(joints)
    assert bones.shape == joints.shape
    # spine self-pair (21,21) -> zero bone at joint 20 (0-indexed)
    np.testing.assert_array_equal(bones[:, :, :, 20], 0)
    # spot-check pair (1,2): bone[0] = joint[0] - joint[1]
    np.testing.assert_allclose(
        bones[:, :, :, 0], joints[:, :, :, 0] - joints[:, :, :, 1]
    )


def test_motion_stream_semantics(ntu_examples):
    joints = ntu_examples[:2]
    motion = streams.motion_stream(joints)
    assert motion.shape == joints.shape
    np.testing.assert_allclose(
        motion[:, :, 0], joints[:, :, 1] - joints[:, :, 0]
    )
    np.testing.assert_array_equal(motion[:, :, -1], 0)


# --------------------------------------------------------------------------
# TFRecord IO (from scratch) — cross-validated against TensorFlow
# --------------------------------------------------------------------------

def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8a9136aa
    assert tfrecord.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert tfrecord.crc32c(b"123456789") == 0xE3069283


def test_tfrecord_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(3, 300, 25, 2)).astype(np.float32)
    path = tmp_path / "sample.tfrecord"
    with tfrecord.TFRecordWriter(str(path)) as w:
        w.write(tfrecord.serialize_example(arr, 7))
    payloads = list(tfrecord.TFRecordReader(str(path)))
    assert len(payloads) == 1
    got, label = tfrecord.parse_example(payloads[0])
    assert label == 7
    np.testing.assert_array_equal(got, arr)


def test_tfrecord_interop_with_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(3, 10, 25, 2)).astype(np.float32)

    # ours -> TF
    ours = tmp_path / "ours.tfrecord"
    with tfrecord.TFRecordWriter(str(ours)) as w:
        w.write(tfrecord.serialize_example(arr, 42))
    ds = tf.data.TFRecordDataset([str(ours)])
    for raw in ds:
        ex = tf.io.parse_single_example(
            raw,
            {
                "features": tf.io.FixedLenFeature([], tf.string),
                "label": tf.io.FixedLenFeature([], tf.int64),
            },
        )
        parsed = tf.io.parse_tensor(ex["features"], tf.float32)
        np.testing.assert_array_equal(parsed.numpy(), arr)
        assert int(ex["label"].numpy()) == 42

    # TF -> ours
    theirs = tmp_path / "theirs.tfrecord"
    with tf.io.TFRecordWriter(str(theirs)) as w:
        feature = {
            "features": tf.train.Feature(
                bytes_list=tf.train.BytesList(
                    value=[tf.io.serialize_tensor(arr).numpy()]
                )
            ),
            "label": tf.train.Feature(
                int64_list=tf.train.Int64List(value=[42])
            ),
        }
        w.write(
            tf.train.Example(
                features=tf.train.Features(feature=feature)
            ).SerializeToString()
        )
    got, label = tfrecord.parse_example(
        next(iter(tfrecord.TFRecordReader(str(theirs))))
    )
    np.testing.assert_array_equal(got, arr)
    assert label == 42


def test_write_dataset_sharding(tmp_path):
    rng = np.random.default_rng(2)
    data_arr = rng.normal(size=(10, 3, 4, 25, 2)).astype(np.float32)
    labels = np.arange(10)
    paths = tfrecord.write_dataset(
        data_arr, labels, str(tmp_path), "train_data_joint", num_shards=4
    )
    assert len(paths) == 4
    seen = sorted(
        label for _, label in tfrecord.read_dataset(str(tmp_path))
    )
    assert seen == list(range(10))
