"""Multi-stream ensemble: train two tiny stream models, combine scores."""

import os

import numpy as np
import pytest

from skeleton_action_recognition_tpu.cli import ensemble, main_gnn
from skeleton_action_recognition_tpu.data import tfrecord
from skeleton_action_recognition_tpu.data.pipeline import (
    TFRecordDataset,
    stream_transform,
)


def test_stream_transform_matches_offline(ntu_examples):
    joint = ntu_examples[:2]
    from skeleton_action_recognition_tpu.data import streams

    np.testing.assert_allclose(
        stream_transform("bone")(joint), streams.bone_stream(joint)
    )
    np.testing.assert_allclose(
        stream_transform("bone_motion")(joint),
        np.asarray(streams.motion_stream(streams.bone_stream(joint))),
    )


@pytest.mark.slow
def test_ensemble_end_to_end(tmp_path, ntu_examples):
    rng = np.random.default_rng(0)
    base = ntu_examples[:, :, :32]
    data = np.tile(base, (4, 1, 1, 1, 1)) + rng.normal(
        0, 0.01, (16,) + base.shape[1:]
    ).astype(np.float32)
    labels = np.arange(16) % 4
    train_dir, test_dir = tmp_path / "train", tmp_path / "test"
    tfrecord.write_dataset(
        data, labels, str(train_dir), "train_data_joint", num_shards=1
    )
    tfrecord.write_dataset(
        data, labels, str(test_dir), "val_data_joint", num_shards=1
    )

    ckpts = []
    for stream in ("joint", "bone"):
        log_dir = tmp_path / f"logs_{stream}"
        main_gnn.main([
            "--model", "stgcn",
            "--stream", stream,
            "--batch-size", "2",
            "--num-epochs", "1",
            "--save-freq", "1",
            "--num-classes", "4",
            "--train-data-path", str(train_dir),
            "--test-data-path", str(test_dir),
            "--log-dir", str(log_dir),
            "--base-lr", "0.05",
        ])
        run = os.listdir(log_dir)[0]
        ckpts.append(str(log_dir / run / "checkpoints"))

    report = ensemble.main([
        "--model", "stgcn",
        "--streams", "joint", "bone",
        "--checkpoints", ckpts[0], ckpts[1],
        "--num-classes", "4",
        "--batch-size", "8",
        "--test-data-path", str(test_dir),
    ])
    assert 0.0 <= report["ensemble_top1"] <= 1.0
    assert report["ensemble_top5"] == 1.0  # 4 classes -> top5 is trivially 1
    assert "joint_top1" in report and "bone_top1" in report


@pytest.mark.slow
def test_evaluate_cli(tmp_path, ntu_examples):
    from skeleton_action_recognition_tpu.cli import evaluate

    rng = np.random.default_rng(1)
    base = ntu_examples[:, :, :32]
    data = np.tile(base, (2, 1, 1, 1, 1)) + rng.normal(
        0, 0.01, (8,) + base.shape[1:]
    ).astype(np.float32)
    labels = np.arange(8) % 4
    d = tmp_path / "val"
    tfrecord.write_dataset(data, labels, str(d), "val", num_shards=1)

    log_dir = tmp_path / "logs"
    main_gnn.main([
        "--model", "stgcn", "--batch-size", "1", "--num-epochs", "1",
        "--save-freq", "1", "--num-classes", "4",
        "--train-data-path", str(d), "--test-data-path", str(d),
        "--log-dir", str(log_dir), "--base-lr", "0.01",
    ])
    ckpt = str(log_dir / os.listdir(log_dir)[0] / "checkpoints")

    for predictor in ("stock", "folded", "int8"):
        report = evaluate.main([
            "--model", "stgcn", "--checkpoint", ckpt,
            "--test-data-path", str(d), "--num-classes", "4",
            "--batch-size", "8", "--predictor", predictor,
        ])
        assert report["samples"] == 8
        assert 0.0 <= report["top1"] <= 1.0


@pytest.mark.slow
def test_evaluate_cli_spectrogram(tmp_path, ntu_examples):
    """Train a tiny spectrogram run, then evaluate its checkpoint with
    the standalone CLI on the .npy surface (the reference's spectrogram
    stack cannot save checkpoints at all)."""
    import pickle

    from skeleton_action_recognition_tpu.cli import (
        evaluate,
        main_spectrogram,
    )

    rng = np.random.default_rng(3)
    base = ntu_examples[:, :, :30]
    for part, n in (("train", 8), ("val", 4)):
        reps = (n + len(base) - 1) // len(base)
        src = np.tile(base, (reps, 1, 1, 1, 1))[:n]
        data = src + rng.normal(0, 0.01, src.shape).astype(np.float32)
        np.save(tmp_path / f"{part}_data_joint.npy", data)
        with open(tmp_path / f"{part}_label.pkl", "wb") as f:
            pickle.dump(
                ([str(i) for i in range(n)],
                 [i % 4 for i in range(n)]), f
            )

    main_spectrogram.main([
        "--batch-size", "1", "--num-epochs", "1", "--num-classes", "4",
        "--num-filters", "8", "--num-pad-frames", "4",
        "--base-lr", "1e-3",
        "--data-path", str(tmp_path / "{}_data_joint.npy"),
        "--label-path", str(tmp_path / "{}_label.pkl"),
        "--log-dir", str(tmp_path / "logs"),
    ])
    log_dir = tmp_path / "logs"
    ckpt = str(log_dir / os.listdir(log_dir)[0] / "checkpoints")

    report = evaluate.main([
        "--model", "spectrogram", "--checkpoint", ckpt,
        "--data-path", str(tmp_path / "val_data_joint.npy"),
        "--label-path", str(tmp_path / "val_label.pkl"),
        "--num-classes", "4", "--num-filters", "8",
        "--num-pad-frames", "4", "--batch-size", "4",
    ])
    assert report["samples"] == 4
    assert 0.0 <= report["top1"] <= 1.0

    # folded/int8 predictors are ST-GCN-family only
    with pytest.raises(SystemExit):
        evaluate.main([
            "--model", "spectrogram", "--checkpoint", ckpt,
            "--data-path", str(tmp_path / "val_data_joint.npy"),
            "--label-path", str(tmp_path / "val_label.pkl"),
            "--predictor", "folded",
        ])
