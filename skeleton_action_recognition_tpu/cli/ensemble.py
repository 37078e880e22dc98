"""Multi-stream ensemble evaluation (BASELINE.json config 5).

Combines softmax scores of independently-trained stream models
(joint / bone / joint_motion / bone_motion GNNs, optionally the
VirtualRadar spectrogram branch) with per-stream weights — the standard
multi-stream protocol for NTU skeleton models. The reference has no
ensemble driver (streams are separate runs combined by hand); this makes
config 5 a first-class command.

Run:
    python -m skeleton_action_recognition_tpu.cli.ensemble \
        --model stgcn \
        --streams joint bone \
        --checkpoints logs/run_joint/checkpoints logs/run_bone/checkpoints \
        --weights 1.0 1.0 \
        --test-data-path data/ntu/xview/val_data_joint
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from skeleton_action_recognition_tpu.data.pipeline import (
    TFRecordDataset,
    stream_transform,
)
from skeleton_action_recognition_tpu.train import (
    checkpoint as ckpt_lib,
    create_train_state,
    make_eval_step,
)
from skeleton_action_recognition_tpu.utils import config as config_lib


def get_parser():
    parser = argparse.ArgumentParser(
        description="Multi-stream ensemble evaluation (TPU)"
    )
    parser.add_argument("--model", default="stgcn")
    parser.add_argument(
        "--streams", nargs="+", required=True,
        help="stream per checkpoint: joint/bone/joint_motion/bone_motion "
        "or 'spectrogram'",
    )
    parser.add_argument("--checkpoints", nargs="+", required=True)
    parser.add_argument("--weights", nargs="+", type=float, default=None)
    parser.add_argument("--num-classes", type=int, default=60)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--test-data-path", required=True)
    parser.add_argument("--num-filters", type=int, default=64)
    parser.add_argument("--num-pad-frames", type=int, default=250)
    return parser


def stream_scores(
    model, ckpt_dir, dataset, sample, mesh=None
) -> np.ndarray:
    """Restore a checkpointed model and return its softmax scores over the
    dataset (iteration order is deterministic: shuffle off). With a mesh,
    scoring runs batch-sharded over its ``data`` axis (partial batches
    zero-padded to a device-divisible shape, padding sliced back off)."""
    state = create_train_state(
        model, jax.random.key(0), jnp.asarray(sample), optax.sgd(0.1)
    )
    manager = ckpt_lib.CheckpointManager(ckpt_dir)
    params, batch_stats, step = manager.restore_for_eval(
        jax.device_get(state.params), jax.device_get(state.batch_stats)
    )
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    state = state.replace(params=params, batch_stats=batch_stats)
    manager.close()
    if mesh is None:
        eval_step = jax.jit(make_eval_step())
        ndev = 1
    else:
        from skeleton_action_recognition_tpu.parallel import DataParallel

        dp = DataParallel(mesh)
        state = dp.shard_state(state)
        eval_step = dp.jit_eval_step(make_eval_step())
        ndev = mesh.devices.size
    out = []
    for xb, _ in dataset.batches():
        n = len(xb)
        if n % ndev:
            pad = -(-n // ndev) * ndev - n
            xb = np.concatenate(
                [xb, np.zeros((pad,) + xb.shape[1:], xb.dtype)]
            )
        out.append(np.asarray(eval_step(state, jnp.asarray(xb)))[:n])
    return np.concatenate(out)


def main(argv=None):
    arg = get_parser().parse_args(argv)
    if arg.weights is None:
        arg.weights = [1.0] * len(arg.streams)
    if not (
        len(arg.streams) == len(arg.checkpoints) == len(arg.weights)
    ):
        raise ValueError(
            "--streams, --checkpoints, --weights must have equal length"
        )

    mesh = None
    if len(jax.devices()) > 1:
        from skeleton_action_recognition_tpu.parallel import create_mesh

        mesh = create_mesh()

    labels = None
    combined = None
    report = {}
    for stream, ckpt, weight in zip(
        arg.streams, arg.checkpoints, arg.weights
    ):
        if stream == "spectrogram":
            model_cls = config_lib.import_class(
                "skeleton_action_recognition_tpu.models.spectrogram"
            ).Model
            model = model_cls(
                num_classes=arg.num_classes,
                num_filters=arg.num_filters,
                num_pad_frames=arg.num_pad_frames,
            )
            transform = None
        else:
            model_cls = config_lib.import_class(
                "skeleton_action_recognition_tpu.models." + arg.model
            ).Model
            model = model_cls(num_classes=arg.num_classes)
            transform = stream_transform(stream)

        dataset = TFRecordDataset(
            arg.test_data_path,
            batch_size=arg.batch_size,
            num_classes=arg.num_classes,
            shuffle=False,
            transform=transform,
        )
        data, raw_labels = dataset._load_all()
        if labels is None:
            labels = raw_labels
        sample = (
            transform(data[:1]) if transform is not None else data[:1]
        )
        scores = stream_scores(model, ckpt, dataset, sample, mesh=mesh)
        acc = float((scores.argmax(-1) == labels).mean())
        report[f"{stream}_top1"] = round(acc, 4)
        print(f"{stream}: top1 {acc:.4f} (weight {weight})")
        contribution = weight * scores
        combined = (
            contribution if combined is None else combined + contribution
        )

    top1 = float((combined.argmax(-1) == labels).mean())
    top5_idx = np.argsort(combined, axis=-1)[:, -5:]
    top5 = float((top5_idx == labels[:, None]).any(-1).mean())
    report["ensemble_top1"] = round(top1, 4)
    report["ensemble_top5"] = round(top5, 4)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
