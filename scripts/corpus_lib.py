"""Synthetic NTU-shaped corpus generation, shared by the corpus-scale
e2e proof (``corpus_e2e.py``) and the reference duel
(``reference_duel.py``).

Each class is a distinct static pose deformation plus a per-joint
oscillation pattern layered on a plausible base skeleton — a signal that
survives pre-normalization (centering/rotation do not change body shape
or temporal frequency content). Clips serialize in the NTU ``.skeleton``
text format the parser reads (``data/skeleton.py:48-127``), i.e. exactly
what the reference's ``gen_joint_data.py:96-177`` chain consumes.

``difficulty`` de-saturates the task (VERDICT r4 weak-#1: a corpus both
stacks ace at val 1.00 cannot detect accuracy regressions). One scalar in
[0, 1] drives four physically-distinct confounds at once:

* the static class pose deformation shrinks (less inter-class distance),
* per-sample corruption of that deformation grows (intra-class variance
  approaches inter-class distance),
* per-sample frequency wobble blurs the spectral signature (this is the
  knob the micro-Doppler / spectrogram stack feels),
* per-frame jitter grows (measurement noise).

difficulty=0.0 reproduces the round-3 saturated corpus exactly (same
class RNG streams, same arithmetic).
"""

from __future__ import annotations

import os

import numpy as np

NUM_JOINTS = 25
NUM_CLASSES = 60

# a plausible upright stick figure in NTU joint order (meters, camera
# coords): enough structure that pre-normalization's spine/shoulder
# alignment (data/preprocess.py) is well-conditioned
BASE_POSE = np.array(
    [
        [0.00, 0.00, 3.0],   # 1 base of spine
        [0.00, 0.30, 3.0],   # 2 middle of spine
        [0.00, 0.55, 3.0],   # 3 neck
        [0.00, 0.70, 3.0],   # 4 head
        [-0.20, 0.50, 3.0],  # 5 left shoulder
        [-0.45, 0.30, 3.0],  # 6 left elbow
        [-0.55, 0.05, 3.0],  # 7 left wrist
        [-0.60, -0.05, 3.0], # 8 left hand
        [0.20, 0.50, 3.0],   # 9 right shoulder
        [0.45, 0.30, 3.0],   # 10 right elbow
        [0.55, 0.05, 3.0],   # 11 right wrist
        [0.60, -0.05, 3.0],  # 12 right hand
        [-0.10, -0.05, 3.0], # 13 left hip
        [-0.12, -0.50, 3.0], # 14 left knee
        [-0.13, -0.90, 3.0], # 15 left ankle
        [-0.14, -1.00, 3.0], # 16 left foot
        [0.10, -0.05, 3.0],  # 17 right hip
        [0.12, -0.50, 3.0],  # 18 right knee
        [0.13, -0.90, 3.0],  # 19 right ankle
        [0.14, -1.00, 3.0],  # 20 right foot
        [0.00, 0.42, 3.0],   # 21 spine (shoulder center)
        [-0.62, -0.10, 3.0], # 22 left hand tip
        [-0.58, -0.02, 3.0], # 23 left thumb
        [0.62, -0.10, 3.0],  # 24 right hand tip
        [0.58, -0.02, 3.0],  # 25 right thumb
    ],
    np.float32,
)


def make_clip(
    label: int,
    sample_rng: np.random.Generator,
    t: int,
    difficulty: float = 0.0,
):
    """(t, 25, 3) trajectory whose class signal is a static per-joint
    pose deformation plus a per-joint oscillation pattern (both keyed by
    ``label``), plus per-sample noise scaled by ``difficulty``."""
    crng = np.random.default_rng(1000 + label)
    pose_def = crng.normal(scale=0.12, size=(NUM_JOINTS, 3))
    freq = crng.uniform(0.5, 6.0, size=NUM_JOINTS)        # cycles per clip
    phase = crng.uniform(0, 2 * np.pi, size=NUM_JOINTS)
    direction = crng.normal(size=(NUM_JOINTS, 3))
    direction /= np.linalg.norm(direction, axis=1, keepdims=True)
    amp = crng.uniform(0.05, 0.15, size=NUM_JOINTS)

    d = float(difficulty)
    if d > 0.0:
        # shrink the class signal and blur it with per-sample corruption
        pose_def = pose_def * (1.0 - 0.75 * d) + sample_rng.normal(
            scale=0.09 * d, size=(NUM_JOINTS, 3)
        )
        amp = amp * (1.0 - 0.5 * d)
        freq = freq * (
            1.0 + sample_rng.normal(scale=0.15 * d, size=NUM_JOINTS)
        )
        phase = phase + sample_rng.uniform(
            0, 2 * np.pi * d, size=NUM_JOINTS
        )
    jitter_scale = 0.01 + 0.05 * d

    tt = np.linspace(0.0, 1.0, t, dtype=np.float32)[:, None]
    osc = np.sin(2 * np.pi * freq[None, :] * tt + phase[None, :])
    motion = osc[:, :, None] * (amp[:, None] * direction)[None]
    jitter = sample_rng.normal(scale=jitter_scale, size=(t, NUM_JOINTS, 3))
    speed = sample_rng.uniform(0.9, 1.1)
    offset = sample_rng.normal(scale=0.1, size=(1, 1, 3))
    return (
        BASE_POSE[None] + pose_def[None] + motion * speed + jitter + offset
    ).astype(np.float32)


def write_skeleton_file(path: str, clip: np.ndarray) -> None:
    """Serialize one body's trajectory in the NTU .skeleton text format
    the parser reads (data/skeleton.py:48-127)."""
    t = clip.shape[0]
    lines = [str(t)]
    for f in range(t):
        lines.append("1")
        lines.append("1001 0 1 1 1 1 0 0.0 0.0 2")
        lines.append(str(NUM_JOINTS))
        for j in range(NUM_JOINTS):
            x, y, z = clip[f, j]
            lines.append(f"{x:.5f} {y:.5f} {z:.5f} 0 0 0 0 0 0 0 0 2")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def synthesize_corpus(
    raw_dir: str,
    clips_per_class: int,
    seed: int = 7,
    num_classes: int = NUM_CLASSES,
    difficulty: float = 0.0,
):
    """Write clips_per_class x num_classes .skeleton files. Camera 1 ->
    xview val, cameras 2-3 -> xview train (the real split,
    data/skeleton.py). Class labels are always drawn from the front of
    the NTU action range (A001..)."""
    os.makedirs(raw_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n = 0
    for label in range(num_classes):
        for s in range(clips_per_class):
            cam = (s % 3) + 1
            subj = (s % 40) + 1
            rep = (s % 2) + 1
            setup = (s % 17) + 1
            name = (
                f"S{setup:03d}C{cam:03d}P{subj:03d}R{rep:03d}"
                f"A{label + 1:03d}.skeleton"
            )
            t = int(rng.integers(60, 90))
            clip = make_clip(label, rng, t, difficulty=difficulty)
            write_skeleton_file(os.path.join(raw_dir, name), clip)
            n += 1
    return n
