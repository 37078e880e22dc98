"""Standalone checkpoint evaluation.

The reference can only evaluate inside its training loops
(``main_gnn.py:381-410``; the spectrogram trainer cannot save at all) —
this evaluates any saved checkpoint: GNN-family models on a TFRecord
directory (with the serving predictors stock/folded/int8 and optional
stream derivation), or spectrogram-family models on the ``.npy`` +
pickle-label surface their trainer consumes.

Run:
    python -m skeleton_action_recognition_tpu.cli.evaluate \
        --model stgcn --checkpoint logs/run/checkpoints \
        --test-data-path data/ntu/xview/val_data_joint \
        [--stream bone] [--predictor folded|int8|stock]

    python -m skeleton_action_recognition_tpu.cli.evaluate \
        --model spectrogram --checkpoint logs/run/checkpoints \
        --data-path data/ntu/xview/val_data_joint.npy \
        --label-path data/ntu/xview/val_label.pkl
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
)
from skeleton_action_recognition_tpu.utils import config as config_lib


def get_parser():
    parser = argparse.ArgumentParser(description="Evaluate a checkpoint")
    parser.add_argument("--model", default="stgcn")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument(
        "--test-data-path", default=None,
        help="TFRecord directory (GNN-family models)",
    )
    parser.add_argument(
        "--data-path", default=None,
        help=".npy data file (spectrogram-family models; pairs with "
        "--label-path, mirroring the trainer's input surface)",
    )
    parser.add_argument("--label-path", default=None)
    parser.add_argument("--num-classes", type=int, default=60)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--num-filters", type=int, default=64)
    parser.add_argument("--num-pad-frames", type=int, default=250)
    parser.add_argument(
        "--stream", default="joint",
        choices=["joint", "bone", "joint_motion", "bone_motion"],
    )
    parser.add_argument(
        "--predictor", default="stock",
        choices=["stock", "folded", "int8"],
    )
    return parser


def main(argv=None):
    arg = get_parser().parse_args(argv)
    if (arg.test_data_path is None) == (arg.data_path is None):
        raise SystemExit(
            "exactly one of --test-data-path (TFRecords) or "
            "--data-path/--label-path (.npy) is required"
        )
    if arg.data_path is not None and arg.label_path is None:
        raise SystemExit("--data-path requires --label-path")
    model_cls = config_lib.import_class(
        "skeleton_action_recognition_tpu.models." + arg.model
    ).Model
    fields = getattr(model_cls, "__dataclass_fields__", {})
    model_kwargs = {"num_classes": arg.num_classes}
    for name, value in (
        ("num_filters", arg.num_filters),
        ("num_pad_frames", arg.num_pad_frames),
        ("use_pallas", True),
    ):
        if name in fields:
            model_kwargs[name] = value
    model = model_cls(**model_kwargs)
    if arg.predictor != "stock" and "num_pad_frames" in fields:
        raise SystemExit(
            "folded/int8 predictors fold the ST-GCN family's BN and "
            "adjacency constants; use --predictor stock for "
            "spectrogram-family models"
        )

    # Evaluation is batch-sharded over all chips (the reference evaluates
    # replicated inside MirroredStrategy, ``main_gnn.py:381-410``; here any
    # checkpoint evaluates data-parallel). Partial/indivisible batches are
    # zero-padded to one compiled shape and the padding sliced back off.
    ndev = len(jax.devices())
    mesh = None
    if ndev > 1:
        from skeleton_action_recognition_tpu.parallel import create_mesh

        mesh = create_mesh()
        if arg.batch_size % ndev:
            arg.batch_size = -(-arg.batch_size // ndev) * ndev

    if arg.data_path is not None:
        from skeleton_action_recognition_tpu.data.pipeline import (
            NumpyDataset,
        )

        dataset = NumpyDataset(
            arg.data_path,
            arg.label_path,
            batch_size=arg.batch_size,
            num_classes=arg.num_classes,
            shuffle=False,
        )
    else:
        dataset = TFRecordDataset(
            arg.test_data_path,
            batch_size=arg.batch_size,
            num_classes=arg.num_classes,
            shuffle=False,
            transform=stream_transform(arg.stream),
        )
    sample, _ = next(iter(dataset.batches()))

    state = create_train_state(
        model, jax.random.key(0), jnp.asarray(sample[:1]), optax.sgd(0.1)
    )
    manager = ckpt_lib.CheckpointManager(arg.checkpoint)
    params, batch_stats, step = manager.restore_for_eval(
        jax.device_get(state.params), jax.device_get(state.batch_stats)
    )
    manager.close()
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {arg.checkpoint}")

    if arg.predictor == "stock":
        variables = {"params": params, "batch_stats": batch_stats}
        if mesh is None:
            fwd = jax.jit(
                lambda x: model.apply(variables, x, train=False)
            )
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            shard = NamedSharding(mesh, P("data"))
            apply = jax.jit(
                lambda v, x: model.apply(v, x, train=False),
                in_shardings=(rep, shard),
                out_shardings=shard,
            )
            variables = jax.device_put(variables, rep)
            fwd = lambda x: apply(variables, x)  # noqa: E731
    elif arg.predictor == "folded":
        from skeleton_action_recognition_tpu.models.export import (
            fused_stgcn_predictor,
        )

        fwd = fused_stgcn_predictor(params, batch_stats, mesh=mesh)
    else:
        from skeleton_action_recognition_tpu.models.export import (
            quantized_stgcn_predictor,
        )

        fwd = quantized_stgcn_predictor(params, batch_stats, mesh=mesh)

    correct = top5 = total = 0
    for xb, yb in dataset.batches():
        n = len(xb)
        if mesh is not None and n % ndev:
            pad = -(-n // ndev) * ndev - n
            xb = np.concatenate(
                [xb, np.zeros((pad,) + xb.shape[1:], xb.dtype)]
            )
        logits = np.asarray(fwd(jnp.asarray(xb)))[:n]
        labels = yb.argmax(-1)
        preds = logits.argmax(-1)
        correct += int((preds == labels).sum())
        t5 = np.argsort(logits, axis=-1)[:, -5:]
        top5 += int((t5 == labels[:, None]).any(-1).sum())
        total += len(labels)

    report = {
        "checkpoint_step": step,
        "stream": arg.stream,
        "predictor": arg.predictor,
        "samples": total,
        "top1": round(correct / max(total, 1), 4),
        "top5": round(top5 / max(total, 1), 4),
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
