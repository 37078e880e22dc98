"""GNN trainer CLI — TPU-native equivalent of the reference ``main_gnn.py``.

Same flag surface (``main_gnn.py:25-77``) plus TPU extras (``--resume``,
``--l2-weight``, ``--profile-dir``, ``--precision``). Differences by
design:

* distribution is a ``jax.sharding`` mesh + jitted step (gradient psum
  over ICI), not ``MirroredStrategy``;
* checkpoints (Orbax) actually restore — ``--resume`` continues from the
  latest snapshot (the reference saves but can never load,
  ``main_gnn.py:315-318``);
* one warm-up step is traced to TensorBoard-compatible profiler output
  when ``--profile-dir`` is set (the ``tf.summary.trace_on`` pattern at
  ``main_gnn.py:336-354``).

Run:
    python -m skeleton_action_recognition_tpu.cli.main_gnn \
        --model stgcn --train-data-path ... --test-data-path ...
"""

from __future__ import annotations

import argparse
import itertools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from skeleton_action_recognition_tpu import parallel
from skeleton_action_recognition_tpu.data.pipeline import (
    TFRecordDataset,
    stream_transform,
)
from skeleton_action_recognition_tpu.train import (
    checkpoint as ckpt_lib,
    metrics as metrics_lib,
    optim as optim_lib,
    schedules,
    steps as steps_lib,
    train_state as ts_lib,
)
from skeleton_action_recognition_tpu.utils import (
    config as config_lib,
    confusion as confusion_lib,
    tb_writer,
)


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description=(
            "Graph Convolutional Neural Network for Skeleton-Based "
            "Action Recognition (TPU)"
        )
    )
    parser.add_argument("--model", required=True, help="model used to train")
    parser.add_argument("--base-lr", type=float, default=1e-1)
    parser.add_argument("--num-classes", type=int, default=60)
    parser.add_argument(
        "--batch-size", type=int, default=64, help="per-chip batch size"
    )
    parser.add_argument("--num-epochs", type=int, default=80)
    parser.add_argument("--save-freq", type=int, default=10)
    parser.add_argument(
        "--freeze-graph-until",
        type=int,
        default=80,
        help="adjacency matrices train only after this epoch",
    )
    parser.add_argument("--log-dir", default="logs/")
    parser.add_argument(
        "--train-data-path", default="data/ntu/xview/train_data_joint"
    )
    parser.add_argument(
        "--test-data-path", default="data/ntu/xview/val_data_joint"
    )
    parser.add_argument("--notes", default="")
    parser.add_argument(
        "--steps", type=int, default=[10, 50], nargs="+",
        help="epochs at which LR decays 10x",
    )
    # TPU-native extras
    parser.add_argument(
        "--stream",
        default="joint",
        choices=["joint", "bone", "joint_motion", "bone_motion"],
        help="derive this stream from the joint TFRecords on the fly "
        "(replaces the reference's per-stream dataset copies)",
    )
    parser.add_argument(
        "--trainable-adjacency", action="store_true",
        help="make the adjacency stack a trainable parameter (it then "
        "obeys --freeze-graph-until; the reference's ST-GCN adjacency is "
        "non-trainable, so that flag is a no-op there)",
    )
    parser.add_argument("--resume", action="store_true")
    parser.add_argument(
        "--l2-weight", type=float, default=0.0,
        help="L2 penalty over conv kernels (reference declares 1e-4 but "
        "never applies it; 0 = reference behavior)",
    )
    parser.add_argument("--profile-dir", default="")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--steps-per-dispatch", type=int, default=1,
        help="scan this many optimizer steps per device dispatch "
        "(lax.scan over pre-staged batches); step-for-step equivalent "
        "to 1 (tests/test_parallel.py). The r5 hardware sweep "
        "(runs/dispatch_sweep.json) measured K=1 FASTEST at B=16 "
        "(209.7 vs 179.9 at K=4, 128.8 at K=16): async dispatch "
        "already pipelines single steps, while K-grouping serializes a "
        "K-batch host stack + bulk transfer in front of the scan. "
        "Raise K only if per-dispatch latency dominates your link",
    )
    parser.add_argument(
        "--dtype", default="float32", choices=["float32", "bfloat16"],
        help="compute dtype for matmul-heavy layers (params stay f32)",
    )
    parser.add_argument(
        "--precision", default="default",
        choices=["default", "high", "highest"],
        help="XLA matmul precision for f32 operands "
        "(jax_default_matmul_precision). TPU MXU passes f32 matmuls "
        "through bf16 multipliers at 'default'; 'highest' runs "
        "3-pass f32-exact math like the reference's CPU/GPU conv "
        "kernels, at a throughput cost. Numerics knob for "
        "reference-trajectory comparisons (scripts/reference_duel.py)",
    )
    # NB: the fused temporal-conv kernel (ops/pallas/tconv.py) stays
    # available on the model as `fused_tconv=True` for experiments, but
    # is deliberately NOT a CLI flag: it measures 25% SLOWER end-to-end
    # than the stock path on v5e (275 vs 382 clips/s — VP-padding and
    # fine-grid overheads outweigh the saved BN/elementwise passes).
    parser.add_argument(
        "--fused-sgcn", action="store_true",
        help="run the spatial graph conv through the fused Pallas "
        "kernel (the K*C_out 1x1-conv intermediate stays in VMEM; "
        "measured +18%% train throughput on v5e). Incompatible with "
        "--trainable-adjacency; checkpoints stay interchangeable",
    )
    parser.add_argument(
        "--fused-sgcn-min-channels", type=int, default=128,
        help="with --fused-sgcn: use the fused kernel only on blocks "
        "with at least this many output channels (at C=64 the kernel's "
        "padding overhead exceeds the saved HBM round-trip; 128 "
        "measured fastest on v5e: 466 vs 450 all-fused clips/s). "
        "0 = fuse every block",
    )
    return parser


def build_log_dir(arg) -> str:
    run_params = dict(vars(arg))
    # num_epochs stays out of the run name: resuming with a raised
    # --num-epochs must land in the SAME run directory (otherwise
    # --resume silently restarts from scratch in a fresh dir)
    for k in (
        "train_data_path", "test_data_path", "log_dir", "save_freq",
        "freeze_graph_until", "resume", "profile_dir", "seed",
        "num_epochs", "fused_sgcn_min_channels", "steps_per_dispatch",
    ):
        run_params.pop(k, None)
    # keep pre-flag run names stable (resume compatibility): the
    # precision knob names the run only when it deviates
    if run_params.get("precision") == "default":
        run_params.pop("precision")
    name = config_lib.run_name_from_args(run_params, notes=arg.notes)
    return os.path.join(arg.log_dir, name)


def main(argv=None):
    arg = get_parser().parse_args(argv)
    if arg.precision != "default":
        jax.config.update("jax_default_matmul_precision", arg.precision)
    parallel.mesh.maybe_initialize_distributed()
    mesh = parallel.create_mesh()
    dp = parallel.DataParallel(mesh)
    num_replicas = mesh.devices.size
    global_batch = arg.batch_size * num_replicas

    log_dir = build_log_dir(arg)
    arg.log_dir = log_dir
    config_lib.save_arg(vars(arg), log_dir)

    model_cls = config_lib.import_class(
        "skeleton_action_recognition_tpu.models." + arg.model
    ).Model
    config_lib.snapshot_sources(log_dir, [model_cls])
    fields = getattr(model_cls, "__dataclass_fields__", {})
    model_kwargs = {"num_classes": arg.num_classes}
    if arg.dtype == "bfloat16" and "dtype" in fields:
        model_kwargs["dtype"] = jnp.bfloat16
    if arg.trainable_adjacency and "trainable_adjacency" in fields:
        model_kwargs["trainable_adjacency"] = True
    if arg.fused_sgcn and "fused_sgcn" in fields:
        model_kwargs["fused_sgcn"] = True
        if "fused_sgcn_min_channels" in fields:
            model_kwargs["fused_sgcn_min_channels"] = (
                arg.fused_sgcn_min_channels
            )
    model = model_cls(**model_kwargs)

    transform = stream_transform(arg.stream)
    # Multi-host contract: each process reads a disjoint shard subset and
    # decodes only its LOCAL slice (global/process_count rows per step);
    # slices assemble into the global batch via shard_host_batch. Every
    # process must run the same number of steps per epoch (collectives),
    # so the per-epoch step count is the all-process minimum.
    process_count = jax.process_count()
    local_batch = global_batch // process_count
    train_data = TFRecordDataset(
        arg.train_data_path,
        batch_size=local_batch,
        num_classes=arg.num_classes,
        shuffle=True,
        drop_remainder=True,
        seed=arg.seed + jax.process_index(),
        process_index=jax.process_index(),
        process_count=process_count,
        transform=transform,
    )
    if process_count > 1:
        from jax.experimental import multihost_utils

        steps_per_epoch = int(
            multihost_utils.process_allgather(
                np.asarray(len(train_data), np.int64)
            ).min()
        )
    else:
        steps_per_epoch = len(train_data)
    test_data = TFRecordDataset(
        arg.test_data_path,
        batch_size=global_batch,
        num_classes=arg.num_classes,
        shuffle=False,
        transform=transform,
    )

    # --steps means "decay 10x at these epochs". The reference converts
    # epochs to iteration boundaries with a hardcoded 40000-samples-per-
    # epoch (main_gnn.py:303-314, NTU xview's ~37.6k rounded); computing
    # from the ACTUAL epoch length keeps that meaning on any corpus
    # (with the hardcoded constant, decay never fires on small corpora).
    boundaries = [e * steps_per_epoch for e in arg.steps]
    lr = schedules.piecewise_constant(arg.base_lr, boundaries)
    # Keras-2 SGD semantics (lr folded into the velocity), not
    # optax.sgd: the two differ transiently after each decay boundary
    # and the reference trainer is Keras (train/optim.py::tf_sgd;
    # trajectory-pinned vs real TF in tests/test_tf_parity.py)
    tx = optim_lib.tf_sgd(lr, momentum=0.9, nesterov=True)

    sample, _ = next(iter(train_data.batches()))
    # init on one sample: params/stats are batch-size independent, and an
    # eager full-batch init needlessly peaks HBM
    state = ts_lib.create_train_state(
        model, jax.random.key(arg.seed), jnp.asarray(sample[:1]), tx
    )

    manager = ckpt_lib.CheckpointManager(
        os.path.join(log_dir, "checkpoints")
    )
    start_epoch = 0
    if arg.resume:
        try:
            state, extra, step = manager.restore(state)
        except Exception:
            # opt_state structure drift (e.g. checkpoints from builds
            # that used optax.sgd's trace before tf_sgd's velocity —
            # MIGRATION.md §resume): restore params/batch_stats/epoch,
            # rebuild optimizer state fresh (momentum restarts).
            params, batch_stats, step = manager.restore_for_eval(
                state.params, state.batch_stats
            )
            extra = manager.restore_extra(step)
            if step is not None:
                state = state.replace(
                    params=params, batch_stats=batch_stats, step=step
                )
                print(
                    "resume: opt_state structure mismatch — restored "
                    "params/batch_stats only, optimizer state "
                    "re-initialized"
                )
        if step is not None:
            start_epoch = (extra or {}).get("epoch", 0) + 1
            print(f"resumed from step {step} (epoch {start_epoch})")

    state = dp.shard_state(state)
    base_step = steps_lib.make_train_step(global_batch, arg.l2_weight)
    train_step = dp.jit_train_step(base_step)
    multi_step = (
        dp.jit_multi_train_step(base_step)
        if arg.steps_per_dispatch > 1 else None
    )
    eval_step = dp.jit_eval_step(steps_lib.make_eval_step())

    writer = tb_writer.SummaryWriter(log_dir)
    ce_m = metrics_lib.Mean()
    acc_m = metrics_lib.Accuracy()
    acc5_m = metrics_lib.Accuracy()

    if arg.profile_dir:
        xb, yb = next(iter(train_data.batches()))
        xs, ys = dp.shard_host_batch(xb, yb)
        with jax.profiler.trace(arg.profile_dir):
            state, _ = train_step(state, xs, ys, False)
        print(f"profiler trace written to {arg.profile_dir}")

    train_iter = 0
    test_iter = 0
    for epoch in range(start_epoch, arg.num_epochs):
        print(f"Epoch: {epoch + 1}")
        t0 = time.time()
        samples = 0
        # defer metric materialization to epoch end: a host fetch per step
        # would serialize (and on lazily-executing backends, replay) the
        # device pipeline; the per-iteration TB scalars are written with
        # identical values afterwards
        pending = []
        # prefetch_to_device: batch i+1's host->HBM copy is issued
        # before step i is awaited (double-buffering, VERDICT r2 item 7)
        batches = itertools.islice(train_data.batches(), steps_per_epoch)
        if multi_step is not None:
            # K optimizer steps per device dispatch: the per-call
            # host<->device round trip is the CLI's gap to the pure
            # device-loop rate (bench.py), and a lax.scan over K
            # pre-staged batches amortizes it K-fold
            batches = parallel.group_batches(
                batches, arg.steps_per_dispatch
            )
            place_fn, step_fn = dp.shard_multi_batch, multi_step
        else:
            place_fn, step_fn = dp.shard_host_batch, train_step
        for (xs, ys) in parallel.prefetch_to_device(batches, place_fn):
            state, m = step_fn(
                state, xs, ys, epoch > arg.freeze_graph_until
            )
            pending.append(m)
        for m in (
            mm for got in jax.device_get(pending)
            for mm in metrics_lib.unstack_steps(got)
        ):
            ce_m.update(float(m["loss"]))
            acc_m.update(int(m["correct"]), int(m["count"]))
            acc5_m.update(int(m["correct_top5"]), int(m["count"]))
            samples += int(m["count"])
            writer.add_scalar(
                "cross_entropy_loss", ce_m.result(), train_iter
            )
            writer.add_scalar("train_acc", acc_m.result(), train_iter)
            writer.add_scalar(
                "train_acc_top_5", acc5_m.result(), train_iter
            )
            ce_m.reset(), acc_m.reset(), acc5_m.reset()
            train_iter += 1
        dt = time.time() - t0
        print(
            f"  train: {samples} clips in {dt:.1f}s "
            f"({samples / max(dt, 1e-9):.1f} clips/s)"
        )

        cm = metrics_lib.ConfusionMatrix(arg.num_classes)
        epoch_acc = metrics_lib.Accuracy()
        epoch_acc5 = metrics_lib.Accuracy()
        # deferred like the train loop: queue device-side probs, one
        # fetch for the whole epoch (a per-step np.asarray blocks the
        # next step's dispatch; on the lazy tunnel it replays the chain)
        pending_eval = []
        for xb, yb in test_data.batches():
            n = len(xb)
            if n < global_batch:
                # pad the final partial batch so the sharded eval step keeps
                # one compiled shape; surplus rows are sliced off below
                xb = np.concatenate(
                    [xb, np.zeros((global_batch - n,) + xb.shape[1:],
                                  xb.dtype)]
                )
            # every process decodes the full test set in the same order,
            # so the identical-data global placement is valid multi-host
            pending_eval.append(
                (eval_step(state, dp.shard_batch(xb)), n, yb)
            )
        for probs, n, yb in zip(
            jax.device_get([p for p, _, _ in pending_eval]),
            [n for _, n, _ in pending_eval],
            [y for _, _, y in pending_eval],
        ):
            probs = np.asarray(probs)[:n]
            labels = yb.argmax(-1)
            preds = probs.argmax(-1)
            top5 = np.argsort(probs, axis=-1)[:, -5:]
            epoch_acc.update(int((preds == labels).sum()), len(labels))
            epoch_acc5.update(
                int((top5 == labels[:, None]).any(-1).sum()), len(labels)
            )
            cm.update(labels, preds)
            writer.add_scalar("test_acc", epoch_acc.result(), test_iter)
            writer.add_scalar(
                "test_acc_top_5", epoch_acc5.result(), test_iter
            )
            test_iter += 1
        writer.add_scalar("epoch_test_acc", epoch_acc.result(), epoch)
        writer.add_scalar(
            "epoch_test_acc_top_5", epoch_acc5.result(), epoch
        )
        print(
            f"  test: top1 {epoch_acc.result():.4f} "
            f"top5 {epoch_acc5.result():.4f}"
        )

        if (epoch + 1) % arg.save_freq == 0:
            png, h, w = confusion_lib.confusion_matrix_png(cm.result())
            writer.add_image_png(
                "Test Confusion Matrix", png, h, w, epoch
            )
            manager.save(epoch, jax.device_get(state), {"epoch": epoch})
            print(f"  checkpoint saved at epoch {epoch + 1}")

    manager.save(arg.num_epochs, jax.device_get(state),
                 {"epoch": arg.num_epochs - 1})
    writer.close()
    manager.close()


if __name__ == "__main__":
    main()
