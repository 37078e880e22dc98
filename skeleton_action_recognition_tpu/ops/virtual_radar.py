"""VirtualRadar: differentiable micro-Doppler spectrogram synthesis.

TPU-native re-design of the reference's centerpiece
(``layers/virtual_radar.py:79-134``). Each skeleton bone (edge) is modeled
as an ellipsoid; its radar-cross-section backscatter (Mahafza, *Radar
Systems Analysis and Design Using MATLAB*, 2000 — cited at
``layers/virtual_radar.py:22-25``) and round-trip phase are computed per
timestep, the complex returns of all edges and bodies are superimposed into
one signal, and a centered STFT produces the log-magnitude spectrogram.

Everything is expressed as elementwise VPU math over ``(N, T, E, M)``
tensors plus two MXU contractions (the optional time-upsampling operator
and the STFT bases), fully differentiable w.r.t. the joint trajectories,
the wavelength, the radar location, and the STFT bases.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from skeleton_action_recognition_tpu.graphs.ntu_rgb_d import RADAR_EDGES
from skeleton_action_recognition_tpu.ops import stft as stft_ops


def _safe_norm(x, axis):
    """L2 norm with a well-defined (zero) gradient at the origin.

    ``jnp.linalg.norm`` backpropagates ``x / ||x||`` — NaN at zero, and
    all-zero bodies (empty second skeleton after padding) are routine in
    NTU clips, which would poison every gradient. Forward values are
    bit-identical to the plain norm."""
    s = jnp.sum(x * x, axis=axis)
    zero = s == 0
    return jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, s)))


def radar_return(
    x,
    radar_location,
    wavelength,
    edges: Sequence[Tuple[int, int]] = tuple(RADAR_EDGES),
):
    """Complex radar time signal from skeleton joint trajectories.

    Mirrors ``layers/virtual_radar.py:93-123`` step for step:

    * gather per-edge source/destination joints;
    * radar→source distance and aspect angles theta (midpoint-to-radar vs
      bone direction) and phi (elevation of the radar in the source's x-y
      plane), both with the reference's ``1e-6`` denominators;
    * ellipsoid RCS with ``c = (time-mean bone length)^2``, kept in the
      reference's unreduced ``sin/cos(phi)`` form so the rounding matches;
    * complex return ``sqrt(rcs) * exp(j * 4 pi d / lambda)``;
    * superposition over edges and bodies.

    Deviations (gradient safety only; forward values unchanged outside
    degenerate corners): the ``acos``/``asin`` arguments are clamped to
    ``[-1+1e-7, 1-1e-7]`` (the reference NaNs when its ``1e-6`` slack is
    insufficient, and has infinite derivatives at exactly |1|), norms use
    a zero-gradient-at-zero formulation, and the amplitude is computed
    from the mean bone length directly rather than ``sqrt(mean^2)``.

    Args:
      x: ``(N, 3, T, V, M)`` joint positions (reference layout).
      radar_location: ``(3,)`` radar position.
      wavelength: scalar radar wavelength.
      edges: bone list as ``(src, dst)`` vertex pairs.

    Returns:
      ``(re, im)`` each of shape ``(N, T)``.
    """
    src_idx = np.asarray([e[0] for e in edges])
    dst_idx = np.asarray([e[1] for e in edges])

    # (N, 3, T, E, M)
    src = x[:, :, :, src_idx]
    dst = x[:, :, :, dst_idx]
    loc = radar_location[None, :, None, None, None]

    # mean_t bone length, kept per (N, 1, E, M); c = mean_len^2.
    mean_len = jnp.mean(
        _safe_norm(dst - src, axis=1), axis=1, keepdims=True
    )
    return _edge_returns(
        src, dst, loc, radar_location, wavelength, mean_len
    )


def _edge_returns(src, dst, loc_b, radar_location, wavelength, mean_len):
    """Per-timestep complex returns given gathered edge endpoints.

    ``src``/``dst``: ``(N, 3, T, E, M)``; ``mean_len``: precomputed
    ``(N, 1, E, M)`` time-mean bone length (the RCS uses ``c =
    mean_len^2``; taking ``sqrt(c)`` back out of the amplitude would have
    an infinite derivative at zero-length bones, so the amplitude uses
    ``mean_len`` directly). Returns ``(re, im)`` summed over edges and
    bodies, each ``(N, T)``.
    """
    rev = src - loc_b
    distances = _safe_norm(rev, axis=1)
    a_vec = loc_b - (src + dst) / 2.0
    b_vec = dst - src
    cos_theta = jnp.sum(a_vec * b_vec, axis=1) / (
        _safe_norm(a_vec, axis=1) * _safe_norm(b_vec, axis=1) + 1e-6
    )
    # clip epsilon keeps d(arccos) finite at the degenerate |ct| = 1 corner
    theta = jnp.arccos(jnp.clip(cos_theta, -1.0 + 1e-7, 1.0 - 1e-7))
    sin_phi = (radar_location[1] - src[:, 1]) / (
        _safe_norm(rev[:, :2], axis=1) + 1e-6
    )
    phi = jnp.arcsin(jnp.clip(sin_phi, -1.0 + 1e-7, 1.0 - 1e-7))
    c = mean_len * mean_len
    sin_t2 = jnp.sin(theta) ** 2
    denom = jnp.abs(
        sin_t2 * jnp.cos(phi) ** 2
        + sin_t2 * jnp.sin(phi) ** 2
        + c * jnp.cos(theta) ** 2
    )
    # amp = sqrt(pi * c / denom^4)... NB reference squares the bracket
    # then sqrt's: amp = sqrt(pi) * mean_len / |bracket|
    amp = np.sqrt(np.pi) * mean_len / denom
    phase = 4.0 * np.pi * distances / wavelength
    re = jnp.sum(amp * jnp.cos(phase), axis=(2, 3))
    im = jnp.sum(amp * jnp.sin(phase), axis=(2, 3))
    return re, im


def _pick_tile(t_out: int, target: int = 1536) -> int:
    """Largest divisor of ``t_out`` not exceeding ``target``."""
    best = 1
    for d in range(1, target + 1):
        if t_out % d == 0:
            best = d
    return best


def radar_return_upsampled(
    x_raw,
    pad_operator,
    radar_location,
    wavelength,
    edges: Sequence[Tuple[int, int]] = tuple(RADAR_EDGES),
    tile: int | None = None,
):
    """Radar return with the cubic time-upsampling fused on-device.

    The reference inflates clips 250x on CPU loader workers
    (``utils.py:134-140``) *before* the radar layer; materializing that
    here would cost gigabytes of HBM per batch
    (``(N, 3, 75000, V, M)``). Instead the padded time axis is produced
    tile-by-tile inside a ``lax.scan``: each tile is one
    ``(tile, T_in)`` slice of the resampling operator contracted against
    the *gathered edge endpoints*, immediately reduced to the ``(N, tile)``
    complex signal — peak temporary memory drops from O(T_out * V) to
    O(tile * E).

    Two passes are needed because the RCS uses the *time-mean* bone length
    over the padded sequence (``virtual_radar.py:110-113``): pass 1
    accumulates mean bone lengths, pass 2 emits the signal.

    Args:
      x_raw: ``(N, 3, T_in, V, M)`` un-padded joints.
      pad_operator: ``(T_out, T_in)`` smoothing+interpolation matrix
        (see :func:`..resample.pad_frames_operator`).
      tile: T_out tile length (must divide T_out; auto-picked if None).

    Returns:
      ``(re, im)`` each ``(N, T_out)``.
    """
    from jax import lax

    src_idx = np.asarray([e[0] for e in edges])
    dst_idx = np.asarray([e[1] for e in edges])
    t_out = pad_operator.shape[0]
    if tile is None:
        tile = _pick_tile(t_out)
    if t_out % tile:
        raise ValueError(f"tile {tile} must divide T_out {t_out}")
    num_tiles = t_out // tile

    src_raw = x_raw[:, :, :, src_idx]  # (N, 3, T_in, E, M)
    dst_raw = x_raw[:, :, :, dst_idx]
    w = pad_operator.reshape(num_tiles, tile, -1)
    loc_b = radar_location[None, :, None, None, None]

    def interp(w_tile, raw):
        return jnp.einsum(
            "ot,nctem->ncoem", w_tile, raw,
            precision=lax.Precision.HIGHEST,
        )

    # pass 1: accumulate sum of bone lengths over padded time
    def length_pass(carry, w_tile):
        bone = interp(w_tile, dst_raw - src_raw)
        return carry + jnp.sum(
            _safe_norm(bone, axis=1), axis=1
        ), None

    n, _, _, e, m = src_raw.shape
    len_sum, _ = lax.scan(
        length_pass, jnp.zeros((n, e, m), x_raw.dtype), w
    )
    mean_len = (len_sum / t_out)[:, None]  # (N, 1, E, M)

    # pass 2: emit signal tiles
    def signal_pass(_, w_tile):
        src = interp(w_tile, src_raw)
        dst = interp(w_tile, dst_raw)
        return None, _edge_returns(
            src, dst, loc_b, radar_location, wavelength, mean_len
        )

    _, (re_tiles, im_tiles) = lax.scan(signal_pass, None, w)
    re = jnp.moveaxis(re_tiles, 0, 1).reshape(n, t_out)
    im = jnp.moveaxis(im_tiles, 0, 1).reshape(n, t_out)
    return re, im


def radar_return_sharded(
    x_raw,
    pad_operator,
    radar_location,
    wavelength,
    mesh,
    edges: Sequence[Tuple[int, int]] = tuple(RADAR_EDGES),
    axis_name: str = "data",
):
    """Sequence-parallel radar return: the padded time axis sharded over a
    mesh axis.

    The SURVEY §2 sequence-parallel design: the 75k-sample radar time axis
    is the one long-sequence workload; each chip computes the signal for
    its own slice of the resampling operator's rows (the raw joints are
    tiny and replicated), the time-mean bone length is a ``psum`` over
    ICI, and the finished signal shards are ``all_gather``-ed (the signal
    is KBs per clip — the expensive part, interpolation + backscatter, is
    what gets parallelized). No ring/all-to-all is required.

    Returns replicated ``(re, im)`` of shape ``(N, T_out)``.
    """
    from jax import lax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    src_idx = np.asarray([e[0] for e in edges])
    dst_idx = np.asarray([e[1] for e in edges])
    n_dev = mesh.shape[axis_name]
    t_out = pad_operator.shape[0]
    t_pad = -(-t_out // n_dev) * n_dev
    w = jnp.pad(pad_operator, ((0, t_pad - t_out), (0, 0)))

    def local_fn(w_local, x_rep, loc, lam):
        src_raw = x_rep[:, :, :, src_idx]
        dst_raw = x_rep[:, :, :, dst_idx]
        t_local = w_local.shape[0]
        tile = _pick_tile(t_local)
        wt = w_local.reshape(t_local // tile, tile, -1)

        def interp(w_tile, raw):
            return jnp.einsum(
                "ot,nctem->ncoem", w_tile, raw,
                precision=lax.Precision.HIGHEST,
            )

        def length_pass(carry, w_tile):
            bone = interp(w_tile, dst_raw - src_raw)
            return carry + jnp.sum(_safe_norm(bone, axis=1), axis=1), None

        n, _, _, e, m = src_raw.shape
        local_sum, _ = lax.scan(
            length_pass, jnp.zeros((n, e, m), x_rep.dtype), wt
        )
        # global time-mean bone length: one psum over ICI
        global_sum = lax.psum(local_sum, axis_name)
        mean_len = (global_sum / t_out)[:, None]

        loc_b = loc[None, :, None, None, None]

        def signal_pass(_, w_tile):
            src = interp(w_tile, src_raw)
            dst = interp(w_tile, dst_raw)
            return None, _edge_returns(src, dst, loc_b, loc, lam, mean_len)

        _, (re_t, im_t) = lax.scan(signal_pass, None, wt)
        re = jnp.moveaxis(re_t, 0, 1).reshape(n, t_local)
        im = jnp.moveaxis(im_t, 0, 1).reshape(n, t_local)
        re = lax.all_gather(re, axis_name, axis=1, tiled=True)
        im = lax.all_gather(im, axis_name, axis=1, tiled=True)
        return re, im

    re, im = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(w, x_raw, jnp.asarray(radar_location, jnp.float32),
      jnp.asarray(wavelength, jnp.float32))
    return re[:, :t_out], im[:, :t_out]


def radar_spectrogram_sharded(
    x_raw,
    pad_operator,
    radar_location,
    wavelength,
    mesh,
    edges: Sequence[Tuple[int, int]] = tuple(RADAR_EDGES),
    axis_name: str = "data",
    n_fft: int = 256,
    hop_length: int = 16,
):
    """Fully sequence-parallel radar -> spectrogram: signal AND STFT
    frames sharded over the mesh axis.

    Extends :func:`radar_return_sharded` so the finished signal is never
    gathered: each device keeps its own time slice and computes its own
    STFT frames, fetching the ``n_fft/2``-sample halos it needs from its
    neighbors with two ``ppermute``s over ICI (the SURVEY §5 long-context
    design: "a halo-exchange of n_fft−hop samples between neighbors over
    ICI suffices — embarrassingly parallel, no ring needed"). Boundary
    devices reproduce the centered-STFT reflect padding locally; the
    single final frame (frame count is ``T//hop + 1``) is computed from
    the last device's tail.

    Constraints: ``T_out`` divisible by ``n_devices``, the local length by
    ``hop_length``, and halos of ``n_fft // 2`` must fit in one shard.

    Returns the log-magnitude spectrogram ``(N, n_fft, T//hop + 1)``
    replicated (frames are gathered at the very end — the spectrogram is
    tiny compared to the signal).
    """
    from jax import lax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    src_idx = np.asarray([e[0] for e in edges])
    dst_idx = np.asarray([e[1] for e in edges])
    n_dev = mesh.shape[axis_name]
    t_out = pad_operator.shape[0]
    if t_out % n_dev or (t_out // n_dev) % hop_length:
        raise ValueError(
            f"T_out={t_out} must split evenly into {n_dev} hop-aligned "
            "shards"
        )
    t_loc = t_out // n_dev
    pad = n_fft // 2
    if pad > t_loc:
        raise ValueError("halo exceeds local shard length")

    cos_np, sin_np = stft_ops.stft_basis(n_fft)
    cos_b, sin_b = jnp.asarray(cos_np), jnp.asarray(sin_np)

    def local_fn(w_local, x_rep, loc, lam):
        # --- local radar signal (same as radar_return_sharded) ---
        src_raw = x_rep[:, :, :, src_idx]
        dst_raw = x_rep[:, :, :, dst_idx]
        tile = _pick_tile(t_loc)
        wt = w_local.reshape(t_loc // tile, tile, -1)

        def interp(w_tile, raw):
            return jnp.einsum(
                "ot,nctem->ncoem", w_tile, raw,
                precision=lax.Precision.HIGHEST,
            )

        def length_pass(carry, w_tile):
            bone = interp(w_tile, dst_raw - src_raw)
            return carry + jnp.sum(_safe_norm(bone, axis=1), axis=1), None

        n, _, _, e, m = src_raw.shape
        local_sum, _ = lax.scan(
            length_pass, jnp.zeros((n, e, m), x_rep.dtype), wt
        )
        mean_len = (lax.psum(local_sum, axis_name) / t_out)[:, None]
        loc_b = loc[None, :, None, None, None]

        def signal_pass(_, w_tile):
            s = interp(w_tile, src_raw)
            d = interp(w_tile, dst_raw)
            return None, _edge_returns(s, d, loc_b, loc, lam, mean_len)

        _, (re_t, im_t) = lax.scan(signal_pass, None, wt)
        sig = jnp.stack(
            [
                jnp.moveaxis(re_t, 0, 1).reshape(n, t_loc),
                jnp.moveaxis(im_t, 0, 1).reshape(n, t_loc),
            ],
            axis=1,
        )  # (N, 2, T_loc)

        # --- halo exchange: left/right n_fft/2 samples over ICI ---
        idx = lax.axis_index(axis_name)
        perm_r = [(d, (d + 1) % n_dev) for d in range(n_dev)]
        perm_l = [(d, (d - 1) % n_dev) for d in range(n_dev)]
        left = lax.ppermute(sig[:, :, -pad:], axis_name, perm_r)
        right = lax.ppermute(sig[:, :, :pad], axis_name, perm_l)
        # boundary devices: centered-STFT reflect padding of their own edge
        reflect_l = jnp.flip(sig[:, :, 1 : pad + 1], axis=-1)
        reflect_r = jnp.flip(sig[:, :, -pad - 1 : -1], axis=-1)
        left = jnp.where(idx == 0, reflect_l, left)
        right = jnp.where(idx == n_dev - 1, reflect_r, right)
        padded = jnp.concatenate([left, sig, right], axis=-1)

        # --- local frames: T_loc/hop of the global T_out/hop + 1 ---
        re_loc, im_loc = stft_ops.stft_complex(
            padded[:, 0], padded[:, 1], hop_length, cos_b, sin_b,
            center=False,
        )
        f_loc = t_loc // hop_length
        re_loc = re_loc[..., :f_loc]
        im_loc = im_loc[..., :f_loc]
        re_all = lax.all_gather(re_loc, axis_name, axis=2, tiled=True)
        im_all = lax.all_gather(im_loc, axis_name, axis=2, tiled=True)

        # final (T//hop + 1)-th frame from the last device's tail
        tail = jnp.concatenate(
            [sig[:, :, -pad:], reflect_r], axis=-1
        )  # (N, 2, n_fft)
        re_f, im_f = stft_ops.stft_complex(
            tail[:, 0], tail[:, 1], hop_length, cos_b, sin_b,
            center=False,
        )
        last = jnp.stack([re_f[..., 0], im_f[..., 0]], axis=0)
        last = lax.psum(
            jnp.where(idx == n_dev - 1, last, jnp.zeros_like(last)),
            axis_name,
        )
        re_full = jnp.concatenate([re_all, last[0][..., None]], axis=-1)
        im_full = jnp.concatenate([im_all, last[1][..., None]], axis=-1)
        return stft_ops.log_magnitude(re_full, im_full)

    t_pad_rows = t_loc * n_dev
    w = jnp.pad(
        pad_operator, ((0, t_pad_rows - t_out), (0, 0))
    )
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(w, x_raw, jnp.asarray(radar_location, jnp.float32),
      jnp.asarray(wavelength, jnp.float32))


def virtual_radar_spectrogram(
    x,
    radar_location,
    wavelength,
    cos_basis=None,
    sin_basis=None,
    edges: Sequence[Tuple[int, int]] = tuple(RADAR_EDGES),
    n_fft: int = 256,
    hop_length: int = 16,
):
    """Full VirtualRadar forward: joints -> log-magnitude spectrogram.

    Equivalent of ``VirtualRadar.forward`` (``layers/virtual_radar.py:79-134``)
    with defaults from ``:36-45`` (``n_fft=256``, ``hop=16``). Output shape is
    ``(N, n_fft, T // hop + 1)`` with zero Doppler centered (fftshift roll).

    ``cos_basis`` / ``sin_basis`` may be passed in (e.g. as trainable
    parameters mirroring ``train_stft_kernel``); by default the Hann-windowed
    Fourier bases are used.
    """
    if cos_basis is None or sin_basis is None:
        cos_np, sin_np = stft_ops.stft_basis(n_fft)
        cos_basis = jnp.asarray(cos_np) if cos_basis is None else cos_basis
        sin_basis = jnp.asarray(sin_np) if sin_basis is None else sin_basis

    re, im = radar_return(x, radar_location, wavelength, edges)
    s_re, s_im = stft_ops.stft_complex(re, im, hop_length, cos_basis, sin_basis)
    return stft_ops.log_magnitude(s_re, s_im)
