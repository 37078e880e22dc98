"""Coverage for remaining paths: trainable STFT bases, process-sharded
pipeline, StepTimer, xsub data_gen."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skeleton_action_recognition_tpu.data import tfrecord
from skeleton_action_recognition_tpu.data.pipeline import TFRecordDataset
from skeleton_action_recognition_tpu.models import spectrogram
from skeleton_action_recognition_tpu.utils.profiling import StepTimer


def test_trainable_stft_kernel_params_and_grads(ntu_examples):
    x = jnp.asarray(ntu_examples[:1, :, :30])
    layer = spectrogram.VirtualRadar(
        train_stft_kernel=True, num_pad_frames=2
    )
    variables = layer.init(jax.random.key(0), x)
    assert "stft_cos" in variables["params"]
    assert variables["params"]["stft_cos"].shape == (256, 256)

    def loss(params):
        return jnp.sum(layer.apply({"params": params}, x) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert np.abs(np.asarray(g["stft_cos"])).max() > 0
    assert np.isfinite(np.asarray(g["stft_cos"])).all()


def test_pipeline_process_sharding(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(8, 3, 4, 25, 2)).astype(np.float32)
    labels = np.arange(8)
    tfrecord.write_dataset(
        data, labels, str(tmp_path), "train", num_shards=4
    )
    seen = []
    for pi in range(2):
        ds = TFRecordDataset(
            str(tmp_path), batch_size=8, num_classes=8,
            process_index=pi, process_count=2,
        )
        for _, yb in ds.batches():
            seen.extend(yb.argmax(-1).tolist())
    # the two hosts see disjoint shards covering everything
    assert sorted(seen) == list(range(8))
    ds0 = TFRecordDataset(
        str(tmp_path), batch_size=8, num_classes=8,
        process_index=0, process_count=2,
    )
    assert len(ds0.records) == 2  # half the shards


def test_step_timer():
    import time

    t = StepTimer(warmup=1)
    for _ in range(3):
        with t:
            time.sleep(0.01)
    assert t.steps == 2
    assert 0.005 < t.mean() < 0.1
    assert t.rate(10) > 0


def test_data_gen_xsub_split(tmp_path):
    from skeleton_action_recognition_tpu.data import skeleton

    names = [
        "S001C001P001R001A001.skeleton",  # subject 1 -> xsub train
        "S001C001P040R001A002.skeleton",  # subject 40 -> xsub val
    ]
    tr, tl = skeleton.split_samples(names, "xsub", "train")
    va, vl = skeleton.split_samples(names, "xsub", "val")
    assert tr == [names[0]] and tl == [0]
    assert va == [names[1]] and vl == [1]


def test_virtual_radar_spectrogram_custom_basis(ntu_examples):
    from skeleton_action_recognition_tpu import ops

    x = jnp.asarray(ntu_examples[:1, :, :40])
    cos, sin = ops.stft_basis(256)
    out_default = ops.virtual_radar_spectrogram(
        x, jnp.zeros(3), jnp.asarray(9e-4)
    )
    out_custom = ops.virtual_radar_spectrogram(
        x, jnp.zeros(3), jnp.asarray(9e-4),
        cos_basis=jnp.asarray(cos), sin_basis=jnp.asarray(sin),
    )
    np.testing.assert_allclose(
        np.asarray(out_default), np.asarray(out_custom), atol=1e-5
    )
