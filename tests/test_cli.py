"""End-to-end CLI tests: data_gen chain, GNN trainer, spectrogram trainer.

These drive the same surfaces a user runs (``python -m ..cli.main_gnn``),
on tiny synthetic datasets, including checkpoint resume.
"""

import os
import pickle

import numpy as np
import pytest

from skeleton_action_recognition_tpu.cli import data_gen, main_gnn, main_spectrogram
from skeleton_action_recognition_tpu.data import tfrecord


@pytest.fixture()
def tiny_tfrecord_dataset(tmp_path):
    rng = np.random.default_rng(0)
    base = np.load(
        "/root/reference/data/NTU_preprocessed_skeleton_examples.npy"
    )[:, :, :32].astype(np.float32)
    data = np.tile(base, (4, 1, 1, 1, 1))  # 16 samples
    data += rng.normal(0, 0.01, data.shape).astype(np.float32)
    labels = np.arange(16) % 4
    train_dir = tmp_path / "train"
    test_dir = tmp_path / "test"
    tfrecord.write_dataset(
        data, labels, str(train_dir), "train_data_joint", num_shards=2
    )
    tfrecord.write_dataset(
        data[:10], labels[:10], str(test_dir), "val_data_joint",
        num_shards=1,
    )
    return train_dir, test_dir


@pytest.mark.slow
def test_main_gnn_end_to_end(tiny_tfrecord_dataset, tmp_path):
    train_dir, test_dir = tiny_tfrecord_dataset
    log_dir = tmp_path / "logs"
    argv = [
        "--model", "stgcn",
        "--batch-size", "2",
        "--num-epochs", "2",
        "--save-freq", "1",
        "--num-classes", "4",
        "--train-data-path", str(train_dir),
        "--test-data-path", str(test_dir),
        "--log-dir", str(log_dir),
        "--base-lr", "0.01",
    ]
    main_gnn.main(argv)

    runs = os.listdir(log_dir)
    assert len(runs) == 1
    run_dir = log_dir / runs[0]
    files = os.listdir(run_dir)
    assert "config.yaml" in files
    assert any(f.startswith("events.out.tfevents") for f in files)
    assert "checkpoints" in files
    assert "stgcn.py" in files  # model source snapshot
    # checkpoints exist for both epochs + final
    steps = sorted(
        int(d) for d in os.listdir(run_dir / "checkpoints")
        if d.isdigit()
    )
    assert steps[-1] == 2

    # resume path: continue for one more epoch from the latest
    # checkpoint, with the scanned K-steps-per-dispatch trainer loop
    # (covers group_batches + jit_multi_train_step + unstack_steps e2e,
    # including the epoch-tail remainder stack)
    main_gnn.main(
        argv[:5] + ["3"] + argv[6:]
        + ["--resume", "--steps-per-dispatch", "2"]
    )


@pytest.mark.slow
def test_main_spectrogram_end_to_end(tmp_path):
    rng = np.random.default_rng(1)
    base = np.load(
        "/root/reference/data/NTU_preprocessed_skeleton_examples.npy"
    )[:, :, :30].astype(np.float32)
    # train: one full global batch on the 8-device test mesh (batch-size
    # is per-chip); val: 4 samples so the padded partial-batch eval path
    # is exercised
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

    argv = [
        "--batch-size", "1",
        "--num-epochs", "1",
        "--num-classes", "4",
        "--num-filters", "8",
        "--num-pad-frames", "4",
        "--base-lr", "1e-3",
        "--data-path", str(tmp_path / "{}_data_joint.npy"),
        "--label-path", str(tmp_path / "{}_label.pkl"),
        "--log-dir", str(tmp_path / "logs"),
    ]
    main_spectrogram.main(argv)
    runs = os.listdir(tmp_path / "logs")
    assert len(runs) == 1
    files = os.listdir(tmp_path / "logs" / runs[0])
    assert "config.yaml" in files
    assert "checkpoints" in files


def test_data_gen_chain(tmp_path):
    """Synthetic .skeleton files through the full chain to TFRecords."""
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(2)
    for s, (cam, subj) in enumerate([(2, 1), (1, 1), (2, 99), (1, 99)]):
        name = f"S001C{cam:03d}P{subj:03d}R001A{(s % 2) + 1:03d}.skeleton"
        t = 5 + s
        lines = [str(t)]
        for _ in range(t):
            lines.append("1")
            lines.append("1001 0 1 1 1 1 0 0.0 0.0 2")
            lines.append("25")
            for j in range(25):
                x, y, z = rng.normal(size=3)
                lines.append(
                    f"{x:.4f} {y:.4f} {z:.4f} 0 0 0 0 0 0 0 0 2"
                )
        (raw / name).write_text("\n".join(lines) + "\n")
    skip = tmp_path / "missing.txt"
    skip.write_text("")

    out = tmp_path / "out"
    data_gen.main([
        "--data-path", str(raw),
        "--ignored-sample-path", str(skip),
        "--out-folder", str(out),
        "--benchmarks", "xview",
        "--num-shards", "1",
    ])

    xview = out / "xview"
    for part, expected_n in (("train", 2), ("val", 2)):
        joint = np.load(xview / f"{part}_data_joint.npy")
        assert joint.shape == (expected_n, 3, 300, 25, 2)
        for stream in ("bone", "joint_motion", "bone_motion"):
            arr = np.load(xview / f"{part}_data_{stream}.npy")
            assert arr.shape == joint.shape
        recs = list(
            tfrecord.read_dataset(str(xview / f"{part}_data_joint"))
        )
        assert len(recs) == expected_n
        assert recs[0][0].shape == (3, 300, 25, 2)


@pytest.mark.slow
def test_main_gnn_trainable_adjacency_freeze(
    tiny_tfrecord_dataset, tmp_path
):
    """--trainable-adjacency + --freeze-graph-until: the adjacency stays
    at its init through a fully-frozen run."""
    import glob

    import jax
    import jax.numpy as jnp
    import optax

    from skeleton_action_recognition_tpu.graphs import Graph
    from skeleton_action_recognition_tpu.models import stgcn
    from skeleton_action_recognition_tpu.train import (
        checkpoint as ckpt_lib,
        create_train_state,
    )

    train_dir, test_dir = tiny_tfrecord_dataset
    log_dir = tmp_path / "logs_adj"
    main_gnn.main([
        "--model", "stgcn", "--trainable-adjacency",
        "--freeze-graph-until", "99",
        "--batch-size", "2", "--num-epochs", "1", "--save-freq", "1",
        "--num-classes", "4",
        "--train-data-path", str(train_dir),
        "--test-data-path", str(test_dir),
        "--log-dir", str(log_dir), "--base-lr", "0.05",
    ])
    ckpt = glob.glob(str(log_dir / "*" / "checkpoints"))[0]
    model = stgcn.Model(num_classes=4, trainable_adjacency=True)
    x = jnp.zeros((1, 3, 32, 25, 2))
    state = create_train_state(
        model, jax.random.key(0), x, optax.sgd(0.1)
    )
    mgr = ckpt_lib.CheckpointManager(ckpt)
    params, _, _ = mgr.restore_for_eval(
        jax.device_get(state.params), jax.device_get(state.batch_stats)
    )
    mgr.close()
    np.testing.assert_array_equal(
        np.asarray(params["adjacency_matrix"]),
        Graph("spatial").A.astype(np.float32),
    )


def test_run_name_ignores_num_epochs():
    """--resume with a raised --num-epochs must resolve to the SAME run
    directory (otherwise resume silently restarts in a fresh dir)."""
    p = main_gnn.get_parser()
    a1 = p.parse_args(["--model", "stgcn", "--num-epochs", "2"])
    a2 = p.parse_args(["--model", "stgcn", "--num-epochs", "5"])
    assert main_gnn.build_log_dir(a1) == main_gnn.build_log_dir(a2)


@pytest.mark.slow
def test_main_gnn_fused_sgcn(tiny_tfrecord_dataset, tmp_path):
    """--fused-sgcn trains end-to-end through the CLI (Pallas interpret
    path on CPU) and produces a checkpoint loadable by the stock model
    (the fused layer mirrors nn.Dense's variable tree)."""
    train_dir, test_dir = tiny_tfrecord_dataset
    log_dir = tmp_path / "logs"
    main_gnn.main([
        "--model", "stgcn",
        "--batch-size", "2",
        "--num-epochs", "1",
        "--save-freq", "1",
        "--num-classes", "4",
        "--train-data-path", str(train_dir),
        "--test-data-path", str(test_dir),
        "--log-dir", str(log_dir),
        "--base-lr", "0.01",
        "--fused-sgcn",
    ])
    run_dir = log_dir / os.listdir(log_dir)[0]
    assert "checkpoints" in os.listdir(run_dir)

    import jax
    import jax.numpy as jnp

    from skeleton_action_recognition_tpu.models import stgcn
    from skeleton_action_recognition_tpu.train.checkpoint import (
        CheckpointManager,
    )

    stock = stgcn.Model(num_classes=4)
    variables = stock.init(
        jax.random.key(0), jnp.zeros((1, 3, 32, 25, 2)), train=False
    )
    mgr = CheckpointManager(str(run_dir / "checkpoints"))
    params, batch_stats, step = mgr.restore_for_eval(
        variables["params"], variables["batch_stats"]
    )
    mgr.close()
    assert step == 1
    out, _ = stock.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.zeros((1, 3, 32, 25, 2)),
        train=False,
        mutable=[],
    )
    assert np.isfinite(np.asarray(out)).all()


def test_spectrogram_cli_dtype_flag_plumbs_to_model():
    """--dtype bfloat16 reaches the spectrogram model's ResNet backbone
    (radar + STFT stay f32 by design)."""
    import jax.numpy as jnp

    from skeleton_action_recognition_tpu.utils import config as config_lib

    p = main_spectrogram.get_parser()
    arg = p.parse_args(["--dtype", "bfloat16"])
    model_cls = config_lib.import_class(
        "skeleton_action_recognition_tpu.models."
        + arg.model_type.strip()
        + ".Model"
    )
    fields = getattr(model_cls, "__dataclass_fields__", {})
    assert "dtype" in fields
    m = model_cls(num_classes=4, dtype=jnp.bfloat16)
    assert m.dtype == jnp.bfloat16
