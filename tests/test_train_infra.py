"""Training infrastructure: schedules, checkpoint resume, TB writer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from skeleton_action_recognition_tpu.train import (
    checkpoint as ckpt_lib,
    create_train_state,
    cyclic_triangular,
    make_train_step,
    metrics as metrics_lib,
    piecewise_constant,
    reference_gnn_boundaries,
)
from skeleton_action_recognition_tpu.models import stgcn
from skeleton_action_recognition_tpu.utils import (
    confusion_matrix_png,
    run_name_from_args,
    SummaryWriter,
)


def test_reference_boundaries():
    # main_gnn.py:303 — steps [10, 50], batch 64 -> [6250, 31250]
    assert reference_gnn_boundaries([10, 50], 64) == [6250, 31250]


def test_piecewise_constant_schedule_matches_tf():
    sched = piecewise_constant(0.1, [10, 20])
    assert float(sched(0)) == pytest.approx(0.1)
    # TF PiecewiseConstantDecay is left-inclusive at boundaries
    assert float(sched(10)) == pytest.approx(0.1)
    assert float(sched(11)) == pytest.approx(0.01)
    assert float(sched(20)) == pytest.approx(0.01)
    assert float(sched(21)) == pytest.approx(0.001)
    tf = pytest.importorskip("tensorflow")
    ref = tf.keras.optimizers.schedules.PiecewiseConstantDecay(
        [10, 20], [0.1, 0.01, 0.001]
    )
    for step in (0, 9, 10, 11, 19, 20, 21, 100):
        assert float(sched(step)) == pytest.approx(
            float(ref(step).numpy())
        )


def test_cyclic_lr_matches_torch():
    torch = pytest.importorskip("torch")
    lin = torch.nn.Linear(1, 1)
    opt = torch.optim.Adam(lin.parameters(), lr=0.1)
    torch_sched = torch.optim.lr_scheduler.CyclicLR(
        opt, base_lr=1e-4, max_lr=0.1, step_size_up=10,
        cycle_momentum=False,
    )
    ours = cyclic_triangular(1e-4, 0.1, 10)
    for step in range(35):
        expected = torch_sched.get_last_lr()[0]
        np.testing.assert_allclose(
            float(ours(step)), expected, rtol=1e-6
        )
        opt.step()
        torch_sched.step()


def test_checkpoint_save_restore_resume(tmp_path, ntu_examples):
    x = jnp.asarray(ntu_examples[:2, :, :16])
    y = jax.nn.one_hot(jnp.asarray([0, 1]), 60)
    model = stgcn.Model(num_classes=60)
    tx = optax.sgd(1e-2, momentum=0.9)
    state = create_train_state(model, jax.random.key(0), x, tx)
    step = jax.jit(make_train_step(global_batch_size=2))
    state, _ = step(state, x, y, False)

    mgr = ckpt_lib.CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, jax.device_get(state), {"epoch": 0})
    state, _ = step(state, x, y, False)
    mgr.save(1, jax.device_get(state), {"epoch": 1})
    assert mgr.latest_step() == 1

    # restore into a freshly-initialized template
    template = create_train_state(model, jax.random.key(9), x, tx)
    restored, extra, rstep = mgr.restore(template)
    assert rstep == 1 and extra == {"epoch": 1}
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state continues training identically
    s1, m1 = step(restored, x, y, False)
    s2, m2 = step(state, x, y, False)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]))
    mgr.close()


def test_checkpoint_structure_drift_fallback(tmp_path, ntu_examples):
    """The resume fallback for opt_state structure drift (ADVICE r4 /
    MIGRATION.md §3): a checkpoint saved with one optimizer tree fails
    StandardRestore against a template with a different one, but
    restore_for_eval + restore_extra recover params/batch_stats/epoch —
    the exact path cli.main_spectrogram takes for pre-RadarPhysicsState
    checkpoints."""
    x = jnp.asarray(ntu_examples[:2, :, :16])
    y = jax.nn.one_hot(jnp.asarray([0, 1]), 60)
    model = stgcn.Model(num_classes=60)
    state = create_train_state(
        model, jax.random.key(0), x, optax.sgd(1e-2, momentum=0.9)
    )
    step = jax.jit(make_train_step(global_batch_size=2))
    state, _ = step(state, x, y, False)

    mgr = ckpt_lib.CheckpointManager(str(tmp_path / "drift"))
    mgr.save(3, jax.device_get(state), {"epoch": 3})

    # a template whose opt_state tree differs (adam vs sgd-momentum)
    template = create_train_state(
        model, jax.random.key(9), x, optax.adam(1e-3)
    )
    with pytest.raises(Exception):
        mgr.restore(template)
    params, batch_stats, rstep = mgr.restore_for_eval(
        template.params, template.batch_stats
    )
    assert rstep == 3
    assert mgr.restore_extra(rstep) == {"epoch": 3}
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_checkpoint_fresh_start(tmp_path):
    mgr = ckpt_lib.CheckpointManager(str(tmp_path / "empty"))
    template = {"a": np.zeros(3)}
    state, extra, step = mgr.restore(template)
    assert step is None and extra is None and state is template
    mgr.close()


def test_metrics_accumulators():
    m = metrics_lib.Mean()
    m.update(2.0), m.update(4.0)
    assert m.result() == 3.0
    a = metrics_lib.Accuracy()
    a.update(3, 4), a.update(1, 4)
    assert a.result() == 0.5
    cm = metrics_lib.ConfusionMatrix(3)
    cm.update([0, 1, 2, 2], [0, 2, 2, 2])
    assert cm.matrix[2, 2] == 2 and cm.matrix[1, 2] == 1
    assert cm.normalized()[2, 2] == 1.0


def test_run_name_mangling():
    name = run_name_from_args(
        {"model": "stgcn", "base_lr": 0.1}, notes="x"
    )
    assert name == "model:stgcn-base_lr:0.1-x"


def test_tb_writer_readable_by_tensorboard(tmp_path):
    """Events written from scratch must parse with the real TB reader."""
    tb = pytest.importorskip("tensorboard.backend.event_processing"
                             ".event_file_loader")
    log_dir = str(tmp_path / "tb")
    with SummaryWriter(log_dir) as w:
        w.add_scalar("loss", 1.5, 0)
        w.add_scalar("loss", 0.5, 1)
        png, h, wd = confusion_matrix_png(
            np.eye(3, dtype=np.int64), figsize=2.0
        )
        w.add_image_png("cm", png, h, wd, 0)

    events = []
    for f in os.listdir(log_dir):
        loader = tb.EventFileLoader(os.path.join(log_dir, f))
        events.extend(loader.Load())
    scalars = {}
    images = 0
    for e in events:
        for v in getattr(e.summary, "value", []):
            # TB's loader upconverts simple_value to a DT_FLOAT tensor
            if v.HasField("simple_value"):
                scalars[(v.tag, e.step)] = v.simple_value
            elif v.HasField("tensor") and v.tensor.float_val:
                scalars[(v.tag, e.step)] = v.tensor.float_val[0]
            if v.HasField("image"):
                images += 1
                assert v.image.encoded_image_string[:4] == b"\x89PNG"
            elif (
                v.metadata.plugin_data.plugin_name == "images"
                and v.tensor.string_val
            ):
                # loader-upconverted form: [width, height, png_bytes]
                images += 1
                assert v.tensor.string_val[-1][:4] == b"\x89PNG"
    assert scalars[("loss", 0)] == 1.5
    assert scalars[("loss", 1)] == 0.5
    assert images == 1
