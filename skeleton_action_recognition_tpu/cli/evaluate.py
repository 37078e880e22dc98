"""Standalone checkpoint evaluation.

The reference can only evaluate inside its training loop
(``main_gnn.py:381-410``); this evaluates any saved checkpoint on a
TFRecord directory, with the serving predictors (stock, folded, or int8)
and optional stream derivation.

Run:
    python -m skeleton_action_recognition_tpu.cli.evaluate \
        --model stgcn --checkpoint logs/run/checkpoints \
        --test-data-path data/ntu/xview/val_data_joint \
        [--stream bone] [--predictor folded|int8|stock]
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
    parser.add_argument("--test-data-path", required=True)
    parser.add_argument("--num-classes", type=int, default=60)
    parser.add_argument("--batch-size", type=int, default=64)
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
    model_cls = config_lib.import_class(
        "skeleton_action_recognition_tpu.models." + arg.model
    ).Model
    model = model_cls(num_classes=arg.num_classes)

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
        fwd = jax.jit(
            lambda x: model.apply(variables, x, train=False)
        )
    elif arg.predictor == "folded":
        from skeleton_action_recognition_tpu.models.export import (
            fused_stgcn_predictor,
        )

        fwd = fused_stgcn_predictor(params, batch_stats)
    else:
        from skeleton_action_recognition_tpu.models.export import (
            quantized_stgcn_predictor,
        )

        fwd = quantized_stgcn_predictor(params, batch_stats)

    correct = top5 = total = 0
    for xb, yb in dataset.batches():
        logits = np.asarray(fwd(jnp.asarray(xb)))
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
