"""Spectrogram trainer CLI — equivalent of the reference
``main_spectrogram.py``.

Same flag surface (``main_spectrogram.py:13-62``). Key upgrades over the
reference:

* the 250x cubic time-interpolation runs **on device inside the model**
  (``num_pad_frames`` on the model; tiled so nothing near the
  ``(N, 3, 75000, V, M)`` padded tensor is materialized) instead of on 10
  CPU loader workers — the SURVEY §3.2 pipeline bottleneck;
* staged unfreezing of ``radar_lambda`` / ``radar_loc`` actually works
  (it is a silent name-mismatch no-op in the reference);
* checkpoints exist at all (the reference spectrogram trainer never
  saves), with ``--resume``.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from skeleton_action_recognition_tpu import parallel
from skeleton_action_recognition_tpu.data.pipeline import NumpyDataset
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
        description="Skeleton-Based Action Recognition (TPU spectrogram)"
    )
    parser.add_argument("--base-lr", type=float, default=1e-1)
    parser.add_argument("--num-classes", type=int, default=60)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--num-epochs", type=int, default=80)
    parser.add_argument("--num-filters", type=int, default=64)
    parser.add_argument("--log-dir", default="logs/")
    parser.add_argument(
        "--data-path", default="data/ntu/xview/{}_data_joint.npy"
    )
    parser.add_argument(
        "--label-path", default="data/ntu/xview/{}_label.pkl"
    )
    parser.add_argument("--notes", default="")
    parser.add_argument("--model-type", default="resnet")
    parser.add_argument(
        "--save-freq", type=int, default=5,
        help="checkpoint every N epochs (the last epoch always saves). "
        "The reference spectrogram trainer never checkpoints at all "
        "(main_spectrogram.py); saving costs a full-state device fetch, "
        "which on this image's lazily-executing TPU tunnel serializes "
        "the pipeline — don't pay it every epoch",
    )
    parser.add_argument("--lr_cycle", type=int, default=10)
    parser.add_argument("--lambda-train-epoch", type=int, default=1000)
    parser.add_argument("--loc-train-epoch", type=int, default=1000)
    parser.add_argument(
        "--lambda-rel-step", type=float, default=1e-2,
        help="per-step relative change of radar_lambda once unfrozen",
    )
    parser.add_argument(
        "--lambda-step-decay", type=float, default=1.0,
        help="geometric per-step decay of the radar_lambda step once "
        "unfrozen (1.0 = constant step; e.g. 0.998 bounds the total "
        "log-space movement at rel_step/(1-decay) and lets lambda "
        "settle instead of random-walking near the optimum)",
    )
    parser.add_argument(
        "--loc-step", type=float, default=1e-2,
        help="per-step radar_loc move in meters once unfrozen",
    )
    parser.add_argument(
        "--wavelength", type=float, default=None,
        help="initial radar wavelength (model default 5e-4; reference "
        "layers/virtual_radar.py:36-45). With --lambda-train-epoch the "
        "trainer unfreezes radar_lambda and its per-epoch value is "
        "printed and logged to TB",
    )
    # TPU-native extras
    parser.add_argument("--num-pad-frames", type=int, default=250)
    parser.add_argument(
        "--use-pallas", action=argparse.BooleanOptionalAction,
        default=True,
        help="fused Pallas radar kernels (fwd + hand-derived bwd; +30%% "
        "measured over the XLA path; --no-use-pallas to disable)",
    )
    parser.add_argument(
        "--use-pallas-stft", action=argparse.BooleanOptionalAction,
        default=True,
        help="fused Pallas STFT+log-magnitude kernel (+17%% measured on "
        "frozen-radar steps at B=16; parity-gated on hardware by "
        "scripts/tpu_smoke.py). Trainable-STFT model configs "
        "(train_stft_kernel=True) always use the XLA path",
    )
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--steps-per-dispatch", type=int, default=1,
        help="scan this many optimizer steps per device dispatch "
        "(lax.scan over pre-staged batches). Amortizes the per-step "
        "host->device round trip; step-for-step equivalent to 1 "
        "(tests/test_parallel.py). 1 = reference-style per-batch calls",
    )
    parser.add_argument(
        "--profile-dir", default="",
        help="write a jax.profiler trace of one train step here "
        "(the reference's add_graph/trace analogue)",
    )
    parser.add_argument(
        "--dtype", default="float32", choices=["float32", "bfloat16"],
        help="ResNet backbone compute dtype (params stay f32; the radar "
        "return + STFT always run f32 — the 4*pi*d/lambda phase needs "
        "the mantissa)",
    )
    return parser


def main(argv=None):
    arg = get_parser().parse_args(argv)
    parallel.mesh.maybe_initialize_distributed()
    mesh = parallel.create_mesh()
    dp = parallel.DataParallel(mesh)
    num_replicas = mesh.devices.size
    global_batch = arg.batch_size * num_replicas

    run_params = dict(vars(arg))
    # num_epochs stays out of the run name: resuming with a raised
    # --num-epochs must land in the SAME run directory
    for k in (
        "data_path", "label_path", "log_dir", "resume", "seed",
        "lambda_rel_step", "lambda_step_decay", "loc_step",
        "num_epochs", "save_freq", "steps_per_dispatch",
    ):
        run_params.pop(k, None)
    if arg.lambda_train_epoch > arg.num_epochs:
        run_params.pop("lambda_train_epoch", None)
    if arg.loc_train_epoch > arg.num_epochs:
        run_params.pop("loc_train_epoch", None)
    log_dir = os.path.join(
        arg.log_dir,
        config_lib.run_name_from_args(run_params, notes=arg.notes),
    )
    arg.log_dir = log_dir
    config_lib.save_arg(vars(arg), log_dir)

    model_cls = config_lib.import_class(
        "skeleton_action_recognition_tpu.models."
        + arg.model_type.strip()
        + ".Model"
    )
    config_lib.snapshot_sources(log_dir, [model_cls])
    model_kwargs = dict(
        num_classes=arg.num_classes,
        num_filters=arg.num_filters,
        num_pad_frames=arg.num_pad_frames,
        use_pallas=arg.use_pallas,
        use_pallas_stft=arg.use_pallas_stft,
    )
    if arg.wavelength is not None:
        model_kwargs["wavelength"] = arg.wavelength
    if (
        arg.dtype == "bfloat16"
        and "dtype" in getattr(model_cls, "__dataclass_fields__", {})
    ):
        model_kwargs["dtype"] = jnp.bfloat16
    model = model_cls(**model_kwargs)

    datasets = {
        part: NumpyDataset(
            arg.data_path.format(part),
            arg.label_path.format(part),
            batch_size=global_batch,
            num_classes=arg.num_classes,
            shuffle=(part == "train"),
            # the sharded train step is compiled for one global batch
            # shape; eval pads partial batches instead (below)
            drop_remainder=(part == "train"),
            seed=arg.seed,
        )
        for part in ("train", "val")
    }

    lr = schedules.cyclic_triangular(1e-4, arg.base_lr, arg.lr_cycle)
    # Adam for the backbone; the radar physics params (lambda/loc) get
    # relative-step normalized updates — their raw gradients overflow
    # f32 at real wavelengths and Adam's scale invariance would throw
    # lambda across orders of magnitude (see train/optim.py)
    tx = optim_lib.make_radar_optimizer(
        optax.adam(lr),
        lambda_rel_step=arg.lambda_rel_step,
        loc_step=arg.loc_step,
        lambda_step_decay=arg.lambda_step_decay,
    )

    sample, _ = next(iter(datasets["train"].batches()))
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
            # opt_state structure drift (e.g. checkpoints saved before
            # radar_physics_transform grew RadarPhysicsState in r4 —
            # ADVICE r4 / MIGRATION.md §resume): fall back to restoring
            # params + batch_stats only and rebuild the optimizer state
            # fresh. Adam moments and the physics step-decay count are
            # lost; parameters and the epoch counter are not.
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

    state = dp.shard_state(state)
    # batch sharded over the mesh's data axis, state replicated; XLA
    # inserts the gradient all-reduce — the TPU-native analogue of the
    # reference's torch.nn.DataParallel (main_spectrogram.py:118-119).
    # One compiled step per (train_lambda, train_loc) phase: the freeze
    # flags are static so the frozen radar backward is DCE'd — ~1.9x
    # frozen-phase throughput vs a runtime flag (train/steps.py). A run
    # crosses at most two phase boundaries, so at most 3 compiles.
    _step_cache = {}

    def train_step_for(tl: bool, tloc: bool, multi: bool = False):
        key = (bool(tl), bool(tloc), bool(multi))
        if key not in _step_cache:
            base = steps_lib.make_radar_train_step(
                global_batch, train_lambda=key[0], train_loc=key[1]
            )
            _step_cache[key] = (
                dp.jit_multi_train_step(base, n_flags=0)
                if multi
                else dp.jit_train_step(base, n_flags=0)
            )
        return _step_cache[key]

    eval_step = dp.jit_eval_step(steps_lib.make_eval_step())

    writer = tb_writer.SummaryWriter(log_dir)

    if arg.profile_dir:
        xb, yb = next(iter(datasets["train"].batches()))
        xs, ys = dp.shard_host_batch(xb, yb)
        with jax.profiler.trace(arg.profile_dir):
            state, _ = train_step_for(False, False)(state, xs, ys)
        print(f"profiler trace written to {arg.profile_dir}")

    for epoch in range(start_epoch, arg.num_epochs):
        print(f"Epoch {epoch + 1}/{arg.num_epochs}")
        train_lambda = epoch > arg.lambda_train_epoch
        train_loc = epoch > arg.loc_train_epoch
        train_step = train_step_for(train_lambda, train_loc)
        for phase in ("train", "val"):
            loss_m = metrics_lib.Mean()
            acc_m = metrics_lib.Accuracy()
            cm = metrics_lib.ConfusionMatrix(arg.num_classes)
            t0 = time.time()
            if phase == "train":
                # defer metric materialization to epoch end — a host
                # fetch per step serializes (and on lazily-executing
                # backends, replays) the device pipeline; mirrors the
                # GNN trainer's pattern. TB scalars written afterwards
                # are value-identical.
                pending = []
                batches = datasets[phase].batches()
                if arg.steps_per_dispatch > 1:
                    # K optimizer steps per device dispatch (lax.scan
                    # over pre-staged batches) — amortizes the per-call
                    # host<->device round trip K-fold
                    batches = parallel.group_batches(
                        batches, arg.steps_per_dispatch
                    )
                    place_fn = dp.shard_multi_batch
                    step_fn = train_step_for(
                        train_lambda, train_loc, multi=True
                    )
                else:
                    place_fn, step_fn = dp.shard_host_batch, train_step
                for (xs, ys) in parallel.prefetch_to_device(
                    batches, place_fn
                ):
                    state, m = step_fn(state, xs, ys)
                    pending.append(m)
                i = 0
                for m in (
                    mm for got in jax.device_get(pending)
                    for mm in metrics_lib.unstack_steps(got)
                ):
                    loss_m.update(float(m["loss"]))
                    acc_m.update(int(m["correct"]), int(m["count"]))
                    step_idx = epoch * len(datasets[phase]) + i
                    i += 1
                    writer.add_scalar(
                        f"{phase}_cross_entropy_loss",
                        loss_m.result(),
                        step_idx,
                    )
                    writer.add_scalar(
                        f"{phase}_acc", acc_m.result(), step_idx
                    )
            else:
                # same deferred pattern as train: queue the device-side
                # prob tensors and fetch once — a per-step np.asarray
                # blocks the next step's dispatch (and on the lazy
                # tunnel backend, replays the chain)
                pending = []
                for xb, yb in datasets[phase].batches():
                    n = len(xb)
                    if n < global_batch:
                        # pad the final partial batch so the sharded eval
                        # step keeps one compiled shape; surplus rows are
                        # sliced off below
                        xb = np.concatenate(
                            [xb,
                             np.zeros((global_batch - n,) + xb.shape[1:],
                                      xb.dtype)]
                        )
                    pending.append(
                        (eval_step(state, dp.shard_batch(xb)), n, yb)
                    )
                for i, (probs, n, yb) in enumerate(
                    zip(jax.device_get([p for p, _, _ in pending]),
                        [n for _, n, _ in pending],
                        [y for _, _, y in pending])
                ):
                    probs = np.asarray(probs)[:n]
                    preds = probs.argmax(-1)
                    labels = np.asarray(yb).argmax(-1)
                    acc_m.update(
                        int((preds == labels).sum()), len(labels)
                    )
                    ce = -np.log(
                        np.maximum(
                            probs[np.arange(len(labels)), labels], 1e-12
                        )
                    )
                    loss_m.update(float(ce.mean()), len(labels))
                    cm.update(labels, preds)
                    step_idx = epoch * len(datasets[phase]) + i
                    writer.add_scalar(
                        f"{phase}_cross_entropy_loss",
                        loss_m.result(),
                        step_idx,
                    )
                    writer.add_scalar(
                        f"{phase}_acc", acc_m.result(), step_idx
                    )
            if phase == "val":
                png, h, w = confusion_lib.confusion_matrix_png(
                    cm.result()
                )
                writer.add_image_png(
                    "confusion_matrix", png, h, w, epoch
                )
            writer.add_scalar(
                f"{phase}_epoch_cross_entropy_loss",
                loss_m.result(),
                epoch,
            )
            writer.add_scalar(f"{phase}_epoch_acc", acc_m.result(), epoch)
            dt = time.time() - t0
            print(
                f"{phase} Loss: {loss_m.result():.4f} "
                f"Acc: {acc_m.result():.4f} "
                f"({dt:.1f}s, {acc_m.count / max(dt, 1e-9):.1f} clips/s)"
            )
        # track the learnable radar physics parameters (one tiny fetch
        # per epoch): the staged-unfreeze schedule is this framework's
        # headline capability, so its effect must be observable
        lam_val = _find_leaf(state.params, "radar_lambda")
        if lam_val is not None:
            lam_f = float(np.asarray(jax.device_get(lam_val)))
            writer.add_scalar("radar_lambda", lam_f, epoch)
            print(f"radar_lambda: {lam_f:.6g}")
        if (epoch + 1) % arg.save_freq == 0 or epoch == arg.num_epochs - 1:
            manager.save(epoch, jax.device_get(state), {"epoch": epoch})
    writer.close()
    manager.close()


def _find_leaf(tree, needle: str):
    """First leaf whose path contains ``needle`` (None if absent)."""
    found = []

    def visit(path, leaf):
        if any(
            needle in str(getattr(p, "key", getattr(p, "name", "")))
            for p in path
        ):
            found.append(leaf)
        return leaf

    jax.tree_util.tree_map_with_path(visit, tree)
    return found[0] if found else None


if __name__ == "__main__":
    main()
