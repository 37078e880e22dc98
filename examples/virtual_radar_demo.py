"""VirtualRadar demo — the TPU-native equivalent of
``virtual_radar_example.ipynb``.

Generates micro-Doppler spectrograms for each bundled data source and
saves them as PNGs, printing the shape/min/max anchors the notebook
records (cells 2-4), plus the scipy-STFT numerics cross-check of cell 8.

Usage:
    python examples/virtual_radar_demo.py [--out-dir /tmp/radar_demo]
        [--data-root /root/reference/data] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out-dir", default="/tmp/radar_demo")
    parser.add_argument("--data-root", default="/root/reference/data")
    parser.add_argument("--cpu", action="store_true")
    arg = parser.parse_args(argv)

    import jax

    if arg.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from skeleton_action_recognition_tpu import ops
    from skeleton_action_recognition_tpu.graphs import RADAR_EDGES

    os.makedirs(arg.out_dir, exist_ok=True)

    def spectrogram(data, edges, wavelength, pad):
        padded = ops.pad_frames(
            jnp.asarray(data, jnp.float32), num_pad_frames=pad
        )
        x = jnp.transpose(padded, (2, 0, 1))[None, ..., None]
        return np.asarray(
            ops.virtual_radar_spectrogram(
                x, jnp.zeros(3), jnp.asarray(wavelength), edges=edges
            )
        )[0]

    def save(name, spec):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(20, 10))
        plt.imshow(spec, aspect="auto", cmap="jet")
        plt.colorbar()
        path = os.path.join(arg.out_dir, f"{name}.png")
        plt.savefig(path, dpi=60)
        plt.close()
        print(
            f"{name}: shape {spec.shape} min {spec.min():.3f} "
            f"max {spec.max():.3f} -> {path}"
        )

    # CMU mocap (notebook cell 2): chain skeleton, mm -> m
    cmu = np.load(os.path.join(arg.data_root, "cmu_mocap.npy")) * 0.001
    save(
        "cmu_mocap",
        spectrogram(cmu, [(i, i + 1) for i in range(41)], 5e-3, 20),
    )

    # simulated gait (cell 3)
    gait_edges = [
        (0, 1), (1, 2), (1, 3), (3, 5), (5, 7), (1, 4), (4, 6), (6, 8),
        (0, 9), (9, 11), (11, 13), (13, 15), (0, 10), (10, 12),
        (12, 14), (14, 16),
    ]
    gait = np.load(os.path.join(arg.data_root, "simulated_gait.npy"))
    save("simulated_gait", spectrogram(gait, gait_edges, 5e-4, 10))

    # NTU example (cell 4)
    ntu = np.load(
        os.path.join(
            arg.data_root, "NTU_preprocessed_skeleton_examples.npy"
        )
    )[0, :, :, :, 0].transpose(1, 2, 0)
    save("ntu_example", spectrogram(ntu, RADAR_EDGES, 9e-4, 550))

    # scipy cross-check (cell 8): our STFT vs scipy.signal on the same
    # radar return
    from scipy import signal as ssig

    from skeleton_action_recognition_tpu.ops import stft as stft_ops
    from skeleton_action_recognition_tpu.ops.virtual_radar import (
        radar_return,
    )

    padded = ops.pad_frames(jnp.asarray(gait, jnp.float32), 10)
    x = jnp.transpose(padded, (2, 0, 1))[None, ..., None]
    re, im = radar_return(x, jnp.zeros(3), jnp.asarray(5e-4), gait_edges)
    sig = np.asarray(re)[0] + 1j * np.asarray(im)[0]

    f, t, scipy_spec = ssig.stft(
        sig, nperseg=256, noverlap=256 - 16, window="hann",
        return_onesided=False, boundary="even", padded=False,
    )
    win_sum = ssig.get_window("hann", 256, fftbins=True).sum()  # = 128
    scipy_mag = np.log(
        np.abs(np.fft.fftshift(scipy_spec * win_sum, axes=0)) + 1e-6
    )
    cos, sin = stft_ops.stft_basis(256)
    s_re, s_im = stft_ops.stft_complex(
        re, im, 16, jnp.asarray(cos), jnp.asarray(sin)
    )
    ours = np.asarray(stft_ops.log_magnitude(s_re, s_im))[0]
    n = min(ours.shape[1], scipy_mag.shape[1])
    mask = scipy_mag[:, :n] > np.median(scipy_mag)
    diff = np.abs(ours[:, :n] - scipy_mag[:, :n])[mask]
    print(
        f"scipy cross-check: mean |dlog| {diff.mean():.4f} "
        f"(99p {np.quantile(diff, 0.99):.4f})"
    )


if __name__ == "__main__":
    main()
