"""Kernel-level numerics: resample operators, STFT, graph einsums."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skeleton_action_recognition_tpu import ops


def test_gaussian_smooth_matrix_matches_scipy():
    from scipy.ndimage import gaussian_filter1d

    rng = np.random.default_rng(0)
    y = rng.normal(size=(50, 7))
    w = ops.gaussian_smooth_matrix(50, 3.0)
    np.testing.assert_allclose(
        w @ y, gaussian_filter1d(y, 3.0, axis=0), atol=1e-12
    )


def test_cubic_interp_matrix_matches_scipy():
    from scipy.interpolate import interp1d

    rng = np.random.default_rng(1)
    y = rng.normal(size=(30, 5))
    f = interp1d(np.linspace(0, 1, 30), y, "cubic", axis=0)
    expected = f(np.linspace(0, 1, 150))
    w = ops.cubic_interp_matrix(30, 150)
    np.testing.assert_allclose(w @ y, expected, atol=1e-10)


def test_pad_frames_matches_reference_dataset_variant():
    """utils.py:134-140 — smooth over time then cubic-upsample."""
    from scipy.interpolate import interp1d
    from scipy.ndimage import gaussian_filter1d

    rng = np.random.default_rng(2)
    data = rng.normal(size=(40, 25, 3)).astype(np.float32)
    f = interp1d(
        np.linspace(0, 1, 40),
        gaussian_filter1d(data, 3, axis=-3),
        "cubic",
        axis=-3,
    )
    expected = f(np.linspace(0, 1, 4 * 40))
    got = ops.pad_frames(
        jnp.asarray(data), num_pad_frames=4, smooth_axis="time"
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


def test_pad_frames_matches_reference_notebook_variant():
    """utils.py:82-89 — smooths over the *joint* axis (axis=1)."""
    from scipy.interpolate import interp1d
    from scipy.ndimage import gaussian_filter1d

    rng = np.random.default_rng(3)
    data = rng.normal(size=(40, 25, 3))
    f = interp1d(
        np.linspace(0, 1, 40),
        gaussian_filter1d(data, 3, axis=1),
        "cubic",
        axis=-3,
    )
    expected = f(np.linspace(0, 1, 4 * 40))
    got = ops.pad_frames(
        jnp.asarray(data.astype(np.float32)),
        num_pad_frames=4,
        smooth_axis="joints",
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


def test_stft_matches_scipy_spectrogram():
    """Cross-check vs scipy, the reference's own numerics oracle
    (notebook cell 8 re-implements the layer STFT with scipy.signal)."""
    from scipy import signal as ssig

    rng = np.random.default_rng(4)
    n_fft, hop, t = 256, 16, 4096
    x = rng.normal(size=(t,)).astype(np.float32)

    cos, sin = ops.stft_basis(n_fft)
    re, im = ops.stft_real(jnp.asarray(x), hop, jnp.asarray(cos), jnp.asarray(sin))

    win = ssig.get_window("hann", n_fft, fftbins=True)
    # scipy stft with boundary padding equivalent to center/reflect differs;
    # compare the interior frames against a manual framed DFT instead.
    pad = np.pad(x, n_fft // 2, mode="reflect")
    frames = np.lib.stride_tricks.sliding_window_view(pad, n_fft)[::hop]
    ref = np.fft.fft(frames * win, axis=-1)  # (F_frames, n_fft)
    np.testing.assert_allclose(
        np.asarray(re).T, ref.real, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(im).T, ref.imag, atol=2e-2
    )


def test_stft_complex_identity():
    """stft(a + bj) recombination identity (virtual_radar.py:27-34)."""
    rng = np.random.default_rng(5)
    t, n_fft, hop = 2048, 256, 16
    a = rng.normal(size=(t,))
    b = rng.normal(size=(t,))

    cos, sin = ops.stft_basis(n_fft)
    cos_j, sin_j = jnp.asarray(cos), jnp.asarray(sin)
    re, im = ops.stft_complex(
        jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
        hop, cos_j, sin_j,
    )

    pad_a = np.pad(a, n_fft // 2, mode="reflect")
    pad_b = np.pad(b, n_fft // 2, mode="reflect")
    frames = (
        np.lib.stride_tricks.sliding_window_view(pad_a + 1j * pad_b, n_fft)[
            ::hop
        ]
    )
    win = ops.stft_basis(n_fft)[0][0] * 0 + np.hanning(n_fft + 1)[:-1]
    ref = np.fft.fft(frames * win, axis=-1)
    np.testing.assert_allclose(np.asarray(re).T, ref.real, atol=2e-2)
    np.testing.assert_allclose(np.asarray(im).T, ref.imag, atol=2e-2)


def test_stft_complex_general_hop_matches_recombination():
    """stft_complex must equal the explicit two-real-STFT recombination
    at both a polyphase-friendly hop (divides n_fft) and a general hop
    (conv-fallback framing) — pins the recombination identity across
    both framing paths."""
    rng = np.random.default_rng(6)
    t, n_fft = 1024, 64
    a = jnp.asarray(rng.normal(size=(2, t)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(2, t)), jnp.float32)
    cos, sin = ops.stft_basis(n_fft)
    cos_j, sin_j = jnp.asarray(cos), jnp.asarray(sin)
    for hop in (16, 24):  # polyphase branch, conv-fallback branch
        re, im = ops.stft_complex(a, b, hop, cos_j, sin_j)
        ra, ia = ops.stft_real(a, hop, cos_j, sin_j)
        rb, ib = ops.stft_real(b, hop, cos_j, sin_j)
        np.testing.assert_allclose(
            np.asarray(re), np.asarray(ra - ib), atol=1e-4,
            err_msg=f"re hop={hop}",
        )
        np.testing.assert_allclose(
            np.asarray(im), np.asarray(ia + rb), atol=1e-4,
            err_msg=f"im hop={hop}",
        )


def test_spatial_graph_conv_equals_naive():
    rng = np.random.default_rng(6)
    n, t, v, ci, k, co = 2, 5, 25, 3, 3, 8
    x = rng.normal(size=(n, t, v, ci)).astype(np.float32)
    w = rng.normal(size=(ci, k, co)).astype(np.float32)
    a = rng.normal(size=(k, v, v)).astype(np.float32)

    got = ops.spatial_graph_conv(jnp.asarray(x), jnp.asarray(w), jnp.asarray(a))
    # naive: conv then reference einsum 'nkctv,kvw->nctw' transposed to our layout
    z = np.einsum("ntvi,iko->nkotv", x, w)
    expected = np.einsum("nkotv,kvw->ntwo", z, a)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


def test_gin_aggregate_appends_selfloop_last():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 4, 6, 5)).astype(np.float32)
    a = (rng.random(size=(2, 6, 6)) > 0.5).astype(np.float32)
    eps = 0.3
    got = ops.gin_aggregate(jnp.asarray(x), jnp.asarray(a), eps)
    assert got.shape == (2, 4, 3, 6, 5)
    np.testing.assert_allclose(
        np.asarray(got)[:, :, -1], (1 + eps) * x, atol=1e-5
    )


def test_stft_basis_freq_bins_subset():
    cos_full, _ = ops.stft_basis(256)
    cos_sub, sin_sub = ops.stft_basis(256, freq_bins=64)
    assert cos_sub.shape == sin_sub.shape == (64, 256)
    np.testing.assert_allclose(cos_sub, cos_full[:64], atol=0)


def test_graph_conv_static_adjacency():
    import jax

    from skeleton_action_recognition_tpu.models.gcn import GraphConv

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(2, 25, 4)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(25, 25)).astype(np.float32))
    layer = GraphConv(8)
    variables = layer.init(jax.random.key(0), x, a)
    out, a_out = layer.apply(variables, x, a)
    assert out.shape == (2, 25, 8)
    # matches the reference einsum semantics 'ncv,vw->ncw' (channels-last)
    k = np.asarray(variables["params"]["Dense_0"]["kernel"])
    b = np.asarray(variables["params"]["Dense_0"]["bias"])
    z = np.asarray(x) @ k + b
    np.testing.assert_allclose(
        np.asarray(out), np.einsum("nvc,vw->nwc", z, np.asarray(a)),
        atol=1e-5,
    )


def test_stft_polyphase_and_conv_paths_agree():
    """The polyphase framing (hop | n_fft, the hot path whose autodiff
    backward is overlap-add) and the strided-conv fallback (general hop)
    must both match a direct framed contraction, and the polyphase
    gradient must be finite and match the conv path's."""
    import jax

    rng = np.random.default_rng(11)
    n_fft, t = 64, 1024
    x = rng.normal(size=(t,)).astype(np.float32)
    cos, sin = ops.stft_basis(n_fft)

    for hop in (16, 24):  # 64 % 16 == 0 (polyphase), 64 % 24 != 0 (conv)
        re, im = ops.stft_real(
            jnp.asarray(x), hop, jnp.asarray(cos), jnp.asarray(sin)
        )
        pad = np.pad(x, n_fft // 2, mode="reflect")
        frames = np.lib.stride_tricks.sliding_window_view(pad, n_fft)[
            ::hop
        ]
        ref_re = frames @ cos.T  # (frames, F)
        ref_im = -(frames @ sin.T)
        assert re.shape[-1] == frames.shape[0]
        np.testing.assert_allclose(
            np.asarray(re).T, ref_re, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(im).T, ref_im, atol=1e-4
        )

    # gradient of a LINEAR functional of the frames: the exact reference
    # is overlap-add of R^T basis rows followed by the reflect-pad
    # transpose — precisely the two transposes the polyphase autodiff
    # must produce
    hop = 16
    n_frames = t // hop + 1
    r = rng.normal(size=(n_fft, n_frames)).astype(np.float32)

    def loss(xx):
        re, _ = ops.stft_real(
            xx, hop, jnp.asarray(cos), jnp.asarray(sin)
        )
        return jnp.sum(re * jnp.asarray(r))

    g_poly = np.asarray(jax.grad(loss)(jnp.asarray(x)), np.float64)

    # numpy reference: fold basis-weighted frame grads, then undo the
    # reflect pad (reflected positions accumulate back into the core)
    gpad = np.zeros(t + n_fft, np.float64)
    contrib = cos.T.astype(np.float64) @ r.astype(np.float64)  # (n_fft, frames)
    for f in range(n_frames):
        gpad[f * hop : f * hop + n_fft] += contrib[:, f]
    pad = n_fft // 2
    g_ref = gpad[pad : pad + t].copy()
    g_ref[1 : pad + 1] += gpad[:pad][::-1]
    g_ref[t - pad - 1 : t - 1] += gpad[pad + t :][::-1]
    np.testing.assert_allclose(g_poly, g_ref, rtol=1e-4, atol=1e-3)


def test_spline_factorization_matches_operator():
    """The (nseg*4, t_in) coefficient operator must reconstruct the
    dense smooth+cubic-interp operator exactly (float64)."""
    from skeleton_action_recognition_tpu.ops.resample import (
        pad_frames_operator,
        spline_coefficient_operator,
    )

    t_in, pad = 30, 20
    t_out = t_in * pad
    dense = pad_frames_operator(t_in, pad, dtype=np.float64)
    cc, xs = spline_coefficient_operator(t_in)
    nseg = t_in - 1
    cc = cc.reshape(nseg, 4, t_in)
    t = np.linspace(0.0, 1.0, t_out)
    seg = np.minimum(
        np.searchsorted(xs, t, side="right") - 1, nseg - 1
    )
    u = t - xs[seg]
    rebuilt = np.zeros((t_out, t_in))
    for k in range(4):
        rebuilt += cc[seg, k, :] * (u ** (3 - k))[:, None]
    np.testing.assert_allclose(rebuilt, dense, atol=1e-9)


def test_spline_tile_plan_matches_operator():
    """eval_mat[j] @ coeffs[tile_seg[j]] must reproduce each dense
    operator tile (f32 inputs, float64 accumulate), including the
    zero-padded rows of the last partial tile."""
    from skeleton_action_recognition_tpu.ops.resample import (
        pad_frames_operator,
        spline_tile_plan,
    )

    t_in, pad, tile = 30, 20, 128  # t_out=600 -> 5 tiles, 40 pad rows
    dense = pad_frames_operator(t_in, pad, dtype=np.float64)
    cc, tile_seg, ev = spline_tile_plan(t_in, pad, tile)
    nseg = t_in - 1
    num_tiles, _, ns4 = ev.shape
    assert num_tiles == 5 and tile_seg.shape[1] == ns4 // 4
    coeffs = cc.reshape(nseg, 4, t_in)
    rebuilt = np.concatenate(
        [
            ev[j].astype(np.float64)
            @ coeffs[tile_seg[j]].reshape(ns4, t_in)
            for j in range(num_tiles)
        ]
    )
    np.testing.assert_allclose(
        rebuilt[: t_in * pad], dense, atol=2e-6
    )
    assert np.all(rebuilt[t_in * pad :] == 0.0)
