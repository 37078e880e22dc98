"""Demonstrate the learnable radar wavelength actually LEARNING.

The reference intends staged unfreezing of the radar wavelength
(``main_spectrogram.py:128-136``) but it is a silent no-op there (the
``radar_lambda`` name never matches a parameter). This framework's
schedule works — this experiment shows it *helps*, not merely that
training stays finite.

Experiment design (v2 — v1's negative result and why)
-----------------------------------------------------
v1 ran frozen-vs-unfrozen on the ``corpus_e2e.py`` corpus and FAILED:
frozen-at-detuned already reached 0.998 val top-1, so there was no
accuracy pressure on lambda, and lambda random-walked. Root cause: that
corpus's load-bearing class signal is a *static pose deformation*
(``corpus_e2e.make_clip`` docstring), which survives any wavelength —
the spectrogram's amplitude structure alone separates the classes.

v2 synthesizes a corpus whose ONLY class signal is micro-Doppler
structure that a detuned wavelength genuinely destroys:

* one rigid hand cluster (right hand + tip + thumb, joints 11/23/24)
  oscillates laterally; every other joint is static. Class = the
  oscillation frequency ``f_c`` (geometric ladder).
* sinusoidal displacement of amplitude ``a`` at ``f`` cycles/clip gives
  a phase modulation ``beta*sin(2*pi*f_m*n)`` with index
  ``beta = 4*pi*a_r/lambda`` (radial amplitude ``a_r``), i.e. a
  micro-Doppler band of half-width ``beta*f_m`` cycles/sample
  = ``4*pi*a_r*f/(lambda*T_up) * n_fft`` STFT bins.
* the amplitude is tuned so the band half-widths span ~4-40 bins at the
  good wavelength but collapse to ~0.6-7 bins at a 6x-too-large one:
  the lower half of the class ladder becomes sub-bin — indistinguishable
  smears at DC — so detuning measurably costs accuracy, and the CE
  gradient through the spectrogram rewards shrinking lambda (bands
  spread apart again).
* per-sample STATIC pose jitter decorrelates the static inter-edge
  interference phases ``4*pi*(d1-d2)/lambda`` across samples (the
  oscillatory component of dL/dlambda), so the batch-mean lambda
  gradient is dominated by the smooth band-position envelope. (The
  per-sample world offset alone cannot do this: pre-normalization's
  centering removes it exactly.)

v3 hardens the evidence (round-3 advisor: v2's conclusion rested on a
single best-epoch spike in a noisy series):

* arms run at multiple model-init seeds (``--seeds``), and the headline
  metric is the mean val top-1 over the last k epochs, not the best
  epoch;
* the lambda step anneals geometrically per active step
  (``--lambda-step-decay``, new optimizer capability): v2's constant
  ±2%/step random walk kept perturbing the spectrogram statistics
  under the classifier late in training and its accuracy collapsed.

Per seed: (a) wavelength frozen at the detuned value, (b) same detuned
init, ``--lambda-train-epoch 2`` staged unfreeze (the reference's
intended schedule); plus one (c) frozen at the good value (the
ceiling). Success = mean-over-seeds last-k val top-1 of (b) >= (a) AND
(b)'s final radar_lambda is closer to the good value than the detuned
init in every seed.

Stages (all via ``--stage``, default ``all``):

* ``synth``: write the .skeleton corpus + run the production data_gen
  chain (same path as ``corpus_e2e.py``).
* ``probe``: no-training separability check — nearest-centroid accuracy
  on pooled spectrograms at the good vs detuned wavelength. Cheap
  (~2 min on TPU); verifies the corpus design delivers contrast before
  burning three training runs.
* ``train``: the three CLI runs; writes
  ``runs/lambda_learning_REPORT.{json,md}``.

Usage:

    python scripts/lambda_learning.py [--stage all] [--detune 6.0]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# the probe stage jit-compiles the spline radar kernel in-process; use
# the TPU-primed persistent cache (jax reads this env var natively)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache")
)

from scripts.corpus_e2e import BASE_POSE, write_skeleton_file  # noqa: E402

GOOD_LAMBDA = 5e-4  # the spectrogram model default (reference value)
NUM_CLASSES = 15
CLIPS_PER_CLASS = 120  # cam 1 (1/3) -> val, cams 2-3 -> train
CLIP_T = 300           # == max_frame: no null-frame repetition
FREQ_LO, FREQ_HI = 1.2, 12.0   # cycles/clip, geometric ladder
HAND = (11, 23, 24)    # right hand, hand tip, thumb (0-indexed)
AMP = 0.04             # meters, lateral hand oscillation


def class_freqs():
    r = (FREQ_HI / FREQ_LO) ** (1.0 / (NUM_CLASSES - 1))
    return [FREQ_LO * r ** c for c in range(NUM_CLASSES)]


def make_clip(label: int, rng: np.random.Generator) -> np.ndarray:
    """(T,25,3) clip: static base pose + per-sample static jitter, with
    the rigid hand cluster oscillating along x at the class frequency."""
    f = class_freqs()[label] * rng.uniform(0.97, 1.03)
    phase = rng.uniform(0, 2 * np.pi)
    pose = BASE_POSE + rng.normal(scale=0.02, size=(25, 3))
    tt = np.linspace(0.0, 1.0, CLIP_T, dtype=np.float32)
    osc = AMP * np.sin(2 * np.pi * f * tt + phase)
    clip = np.repeat(pose[None], CLIP_T, axis=0)
    for j in HAND:
        clip[:, j, 0] += osc
    clip += rng.normal(scale=0.003, size=clip.shape)
    clip += rng.normal(scale=0.1, size=(1, 1, 3))  # world offset
    return clip.astype(np.float32)


def synthesize(raw_dir: str, seed: int = 11) -> int:
    os.makedirs(raw_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n = 0
    for label in range(NUM_CLASSES):
        for s in range(CLIPS_PER_CLASS):
            cam = (s % 3) + 1
            name = (
                f"S{(s % 17) + 1:03d}C{cam:03d}P{(s % 40) + 1:03d}"
                f"R{(s % 2) + 1:03d}A{label + 1:03d}.skeleton"
            )
            write_skeleton_file(
                os.path.join(raw_dir, name), make_clip(label, rng)
            )
            n += 1
    return n


def stage_synth(args):
    raw = os.path.join(args.workdir, "raw")
    out = os.path.join(args.workdir, "ntu")
    if not os.path.isdir(raw) or not os.listdir(raw):
        t0 = time.time()
        n = synthesize(raw)
        print(f"synthesized {n} .skeleton files in {time.time()-t0:.1f}s")
    skip = os.path.join(args.workdir, "missing.txt")
    open(skip, "a").close()
    if not os.path.exists(
        os.path.join(out, "xview", "train_data_joint.npy")
    ):
        cmd = [
            sys.executable, "-m",
            "skeleton_action_recognition_tpu.cli.data_gen",
            "--data-path", raw, "--ignored-sample-path", skip,
            "--out-folder", out, "--benchmarks", "xview",
            "--num-shards", "4",
        ]
        print("+", " ".join(cmd), flush=True)
        subprocess.run(cmd, cwd=_REPO, check=True)


def stage_probe(args):
    """Nearest-centroid separability of pooled spectrograms per lambda.

    Not a classifier benchmark — a cheap go/no-go: the corpus only
    supports the experiment if good-lambda separability is high AND
    detuned-lambda separability has genuinely collapsed."""
    import jax
    import jax.numpy as jnp
    from skeleton_action_recognition_tpu.models import spectrogram

    xview = os.path.join(args.workdir, "ntu", "xview")
    per = 24  # clips per class for the probe
    data = np.load(os.path.join(xview, "train_data_joint.npy"),
                   mmap_mode="r")
    import pickle
    with open(os.path.join(xview, "train_label.pkl"), "rb") as fh:
        _, labels = pickle.load(fh)
    labels = np.asarray(labels)
    idx = np.concatenate([
        np.nonzero(labels == c)[0][:per] for c in range(NUM_CLASSES)
    ])
    x = jnp.asarray(np.array(data[idx]), jnp.float32)
    y = labels[idx]

    points = [("good", GOOD_LAMBDA),
              ("detuned", args.detune * GOOD_LAMBDA)]
    # optional sweep (multiples of GOOD_LAMBDA): maps the separability
    # landscape between good and detuned, to check whether the chosen
    # detune sits inside a monotone recovery basin (v4) or out on the
    # collapsed plateau (v3's 6x, where the lambda gradient had no
    # consistent sign and the staged unfreeze random-walked)
    for mult in args.probe_sweep:
        points.append((f"x{mult:g}", mult * GOOD_LAMBDA))
    seen = set()
    results = {}
    for tag, lam in points:
        if lam in seen:
            continue
        seen.add(lam)
        model = spectrogram.VirtualRadar(
            num_pad_frames=250, wavelength=lam, use_pallas=True,
        )
        params = model.init(jax.random.key(0), x[:1])

        @jax.jit
        def spec_fn(xb, params=params, model=model):
            s = model.apply(params, xb)  # (B, n_fft, frames)
            # band structure is the class signal: keep the full
            # frequency axis, reduce time to mean + std profiles
            return jnp.concatenate(
                [s.mean(-1), s.std(-1)], axis=-1
            )

        feats = []
        for i in range(0, x.shape[0], 8):
            feats.append(np.asarray(spec_fn(x[i:i + 8])))
        f = np.concatenate(feats).reshape(len(idx), -1)
        f = (f - f.mean(0)) / (f.std(0) + 1e-6)
        tr = np.arange(len(idx)) % per < per // 2
        cents = np.stack([
            f[tr & (y == c)].mean(0) for c in range(NUM_CLASSES)
        ])
        d = ((f[~tr, None] - cents[None]) ** 2).sum(-1)
        acc = float((d.argmin(1) == y[~tr]).mean())
        results[tag] = {"lambda": lam, "centroid_acc": round(acc, 4)}
        print(f"{tag}: lambda={lam:g} centroid_acc={acc:.4f}", flush=True)
    # cache in the workdir (merged across invocations) so a later
    # --stage train picks the landscape up into its report even when
    # the stages run as separate processes
    cache = os.path.join(args.workdir, "probe_results.json")
    merged = {}
    if os.path.exists(cache):
        with open(cache) as fh:
            merged = json.load(fh)
    merged.update(results)
    with open(cache, "w") as fh:
        json.dump(merged, fh, indent=2)
        fh.write("\n")
    return results


def run_cli(tag, args, logs, extra, seed=0):
    xview = os.path.join(args.workdir, "ntu", "xview")
    cmd = [
        sys.executable, "-m",
        "skeleton_action_recognition_tpu.cli.main_spectrogram",
        "--num-epochs", str(args.epochs),
        "--num-classes", str(NUM_CLASSES),
        "--batch-size", str(args.batch_size),
        "--base-lr", "1e-3",
        "--seed", str(seed),
        "--data-path", os.path.join(xview, "{}_data_joint.npy"),
        "--label-path", os.path.join(xview, "{}_label.pkl"),
        "--log-dir", logs,
        "--notes", f"lamlearn_{tag}_s{seed}",
    ] + extra
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    # share the TPU-primed persistent compile cache across the three
    # arms: they run near-identical programs, and the axon compile
    # helper takes minutes per program
    env = {
        **os.environ,
        "JAX_COMPILATION_CACHE_DIR": os.path.join(_REPO, ".jax_cache"),
    }
    # stream the arm's stdout to a file (an interrupted run keeps its
    # progress; capture_output lost 45 min of the first attempt) and
    # reuse a completed arm's log on re-run instead of re-training.
    # The log name is keyed by the arm's wavelength so regime variants
    # (different --detune) never reuse each other's runs; legacy v3
    # logs (no lam key) are only picked up for the detune-independent
    # good arm via the explicit copy in stage_train.
    lam = extra[extra.index("--wavelength") + 1]
    arm_log = os.path.join(
        args.workdir, f"arm_{tag}_lam{lam}_s{seed}.log"
    )
    done_marker = f"__ARM_DONE rc=0 epochs={args.epochs}__"
    if os.path.exists(arm_log) and done_marker in open(arm_log).read():
        print(f"(reusing completed arm log {arm_log})", flush=True)
        out = open(arm_log).read()
        dt = 0.0
    else:
        with open(arm_log, "w") as lf:
            proc = subprocess.run(
                cmd, cwd=_REPO, stdout=lf,
                stderr=subprocess.STDOUT, text=True, env=env,
            )
        dt = time.time() - t0
        out = open(arm_log).read()
        if proc.returncode != 0:
            print(out[-3000:])
            raise RuntimeError(f"{tag} failed rc={proc.returncode}")
        with open(arm_log, "a") as lf:
            lf.write("\n" + done_marker + "\n")
    val_acc = [
        float(m) for m in re.findall(r"val Loss: \S+ Acc: (\S+)", out)
    ]
    lam_traj = [float(m) for m in re.findall(r"radar_lambda: (\S+)", out)]
    # robust headline metric: the mean of the last-k epochs. A single
    # best-epoch spike in a noisy series is not evidence (round-3
    # advisor finding: the v2 conclusion rested on exactly that).
    k = max(5, args.epochs // 6)
    return {
        "seconds": round(dt, 1),
        "val_acc": val_acc,
        "final_val_acc": val_acc[-1] if val_acc else None,
        "best_val_acc": max(val_acc) if val_acc else None,
        "lastk_mean_val_acc": (
            round(float(np.mean(val_acc[-k:])), 4) if val_acc else None
        ),
        "lastk": k,
        "lambda_trajectory": lam_traj,
    }


def stage_train(args, probe=None):
    logs = os.path.join(args.workdir, "logs")
    detuned = args.detune * GOOD_LAMBDA
    seeds = [int(s) for s in str(args.seeds).split(",") if s != ""]
    report = {
        "design": "micro-Doppler frequency-ladder corpus, multi-seed, "
                  "annealed lambda step, last-k-mean headline metric, "
                  f"detune {args.detune:g}x "
                  "(see scripts/lambda_learning.py docstring)",
        "num_classes": NUM_CLASSES,
        "good_lambda": GOOD_LAMBDA,
        "detuned_lambda": detuned,
        "epochs": args.epochs,
        "seeds": seeds,
        "lambda_rel_step": args.lambda_rel_step,
        "lambda_step_decay": args.lambda_step_decay,
        "unfreeze_epoch": args.unfreeze_epoch,
        "probe": probe,
        "arms": {},
    }
    dst = os.path.join(_REPO, "runs")
    os.makedirs(dst, exist_ok=True)

    def dump():
        with open(
            os.path.join(
                dst, f"lambda_learning{args.report_suffix}_REPORT.json"
            ), "w"
        ) as f:
            json.dump(report, f, indent=2)
            f.write("\n")

    for seed in seeds:
        report["arms"][f"frozen_detuned_s{seed}"] = run_cli(
            "frozen", args, logs,
            ["--wavelength", str(detuned)], seed=seed)
        dump()
        report["arms"][f"unfrozen_detuned_s{seed}"] = run_cli(
            "unfrozen", args, logs,
            ["--wavelength", str(detuned),
             "--lambda-train-epoch", str(args.unfreeze_epoch),
             "--lambda-rel-step", str(args.lambda_rel_step),
             "--lambda-step-decay", str(args.lambda_step_decay)],
            seed=seed,
        )
        dump()
    report["arms"]["frozen_good"] = run_cli(
        "good", args, logs, ["--wavelength", str(GOOD_LAMBDA)],
        seed=seeds[0])
    dump()
    # control arm: unfreeze AT the good wavelength. Tests whether
    # lambda-training is at least harmless when the user's guess is
    # already right (the realistic reference use case) — i.e. whether
    # the optimum is a stationary point of the training gradient or
    # the same up-lambda drift seen off-optimum pulls it away.
    report["arms"]["unfrozen_good"] = run_cli(
        "unfrozen_good", args, logs,
        ["--wavelength", str(GOOD_LAMBDA),
         "--lambda-train-epoch", str(args.unfreeze_epoch),
         "--lambda-rel-step", str(args.lambda_rel_step),
         "--lambda-step-decay", str(args.lambda_step_decay)],
        seed=seeds[0])

    fr_lastk = [
        report["arms"][f"frozen_detuned_s{s}"]["lastk_mean_val_acc"]
        for s in seeds
    ]
    un_lastk = [
        report["arms"][f"unfrozen_detuned_s{s}"]["lastk_mean_val_acc"]
        for s in seeds
    ]
    finals = [
        report["arms"][f"unfrozen_detuned_s{s}"]["lambda_trajectory"][-1]
        for s in seeds
        if report["arms"][f"unfrozen_detuned_s{s}"]["lambda_trajectory"]
    ]
    moved = [
        bool(abs(lam - GOOD_LAMBDA) < abs(detuned - GOOD_LAMBDA))
        for lam in finals
    ]
    report["aggregate"] = {
        "frozen_detuned_lastk_mean": round(float(np.mean(fr_lastk)), 4),
        "frozen_detuned_lastk_std": round(float(np.std(fr_lastk)), 4),
        "unfrozen_detuned_lastk_mean": round(float(np.mean(un_lastk)), 4),
        "unfrozen_detuned_lastk_std": round(float(np.std(un_lastk)), 4),
        "per_seed_lambda_final": finals,
        "per_seed_lambda_moved_toward_good": moved,
    }
    report["unfrozen_beats_frozen"] = bool(
        np.mean(un_lastk) >= np.mean(fr_lastk)
    )
    report["lambda_moved_toward_good"] = bool(moved and all(moved))
    # the control arm is a headline too (VERDICT r4 weak-#5: the d6
    # report under-reported that unfrozen@good BEAT frozen@good — the
    # detuned arms measure recovery, the good arms measure whether
    # lambda-training helps near a good init)
    report["unfrozen_good_beats_frozen_good"] = bool(
        report["arms"]["unfrozen_good"]["lastk_mean_val_acc"]
        >= report["arms"]["frozen_good"]["lastk_mean_val_acc"]
    )
    dump()

    good = report["arms"]["frozen_good"]
    k = report["arms"]["frozen_good"]["lastk"]
    lines = [
        "# Learnable radar wavelength: frozen vs staged-unfreeze "
        f"(detune {args.detune:g}x)",
        "",
        f"Corpus: {NUM_CLASSES}-class micro-Doppler frequency ladder "
        f"(`scripts/lambda_learning.py`), {args.epochs} epochs per arm, "
        f"seeds {seeds}, detuned init {detuned:g} vs good "
        f"{GOOD_LAMBDA:g}, unfreeze after epoch {args.unfreeze_epoch}, "
        f"lambda step {args.lambda_rel_step:g} annealed by "
        f"{args.lambda_step_decay:g}/step.",
        "",
        f"Headline metric: mean val top-1 over the last {k} epochs "
        "(a single best-epoch spike in a noisy series is not evidence; "
        "per-seed series are in the JSON).",
        "",
        f"| arm | seed | last-{k} mean | best | final lambda |",
        "|---|---|---|---|---|",
    ]
    for s in seeds:
        a = report["arms"][f"frozen_detuned_s{s}"]
        lines.append(
            f"| frozen @ detuned | {s} | {a['lastk_mean_val_acc']} "
            f"| {a['best_val_acc']} | {detuned:g} |")
    for s in seeds:
        a = report["arms"][f"unfrozen_detuned_s{s}"]
        lam = (a["lambda_trajectory"][-1]
               if a["lambda_trajectory"] else float("nan"))
        lines.append(
            f"| unfrozen @ detuned | {s} | {a['lastk_mean_val_acc']} "
            f"| {a['best_val_acc']} | {lam:g} |")
    ug = report["arms"]["unfrozen_good"]
    ug_lam = (ug["lambda_trajectory"][-1]
              if ug["lambda_trajectory"] else float("nan"))
    lines += [
        f"| frozen @ good (ceiling) | {seeds[0]} | "
        f"{good['lastk_mean_val_acc']} | {good['best_val_acc']} | "
        f"{GOOD_LAMBDA:g} |",
        f"| unfrozen @ good (control) | {seeds[0]} | "
        f"{ug['lastk_mean_val_acc']} | {ug['best_val_acc']} | "
        f"{ug_lam:g} |",
        "",
        f"Aggregate over seeds (last-{k} mean): unfrozen "
        f"{report['aggregate']['unfrozen_detuned_lastk_mean']} ± "
        f"{report['aggregate']['unfrozen_detuned_lastk_std']} vs frozen "
        f"{report['aggregate']['frozen_detuned_lastk_mean']} ± "
        f"{report['aggregate']['frozen_detuned_lastk_std']}.",
        "",
        f"Probe (nearest-centroid, no training): {probe}",
        "",
        "lambda trajectory (unfrozen, seed "
        f"{seeds[0]}): "
        f"{report['arms'][f'unfrozen_detuned_s{seeds[0]}']['lambda_trajectory']}",
        "",
        f"unfrozen >= frozen at detune {args.detune:g}x "
        f"(last-{k} mean over seeds): "
        f"{report['unfrozen_beats_frozen']}; "
        f"lambda moved toward good value in every seed: "
        f"{report['lambda_moved_toward_good']}; "
        "unfrozen >= frozen at the GOOD init (control): "
        f"{report['unfrozen_good_beats_frozen_good']}",
    ]
    with open(
        os.path.join(
            dst, f"lambda_learning{args.report_suffix}_REPORT.md"
        ), "w",
    ) as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({k: report[k] for k in (
        "unfrozen_beats_frozen", "lambda_moved_toward_good")}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/lambda_corpus")
    ap.add_argument("--stage", default="all",
                    choices=["synth", "probe", "train", "all"])
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--detune", type=float, default=6.0,
                    help="detuned init = detune * GOOD_LAMBDA")
    ap.add_argument("--unfreeze-epoch", type=int, default=2)
    ap.add_argument(
        "--seeds", default="0,1,2",
        help="comma-separated model-init seeds; frozen/unfrozen arms "
        "run per seed (the corpus itself is fixed)",
    )
    ap.add_argument(
        "--probe-sweep", default="",
        help="comma-separated extra probe lambdas as multiples of "
        "GOOD_LAMBDA (e.g. '1.5,2,3,4'): maps the separability "
        "landscape so a training detune can be placed inside the "
        "monotone recovery basin",
    )
    ap.add_argument(
        "--report-suffix", default="",
        help="suffix for runs/lambda_learning<suffix>_REPORT.{json,md} "
        "so regime variants (e.g. _d2 within-basin) don't overwrite "
        "the main report",
    )
    ap.add_argument(
        "--lambda-rel-step", type=float, default=2e-2,
        help="per-step relative lambda move once unfrozen (ln(6)/2e-2 "
        "~ 90 consistent-sign steps to cross a 6x detune)",
    )
    ap.add_argument(
        "--lambda-step-decay", type=float, default=0.998,
        help="geometric per-active-step anneal of the lambda step; "
        "bounds total log-space movement at rel_step/(1-decay) = 10 "
        "(vs ln(6)=1.8 needed) and calms the late-run +-2%%/step "
        "random walk that collapsed v2's unfrozen-arm accuracy",
    )
    args = ap.parse_args()
    args.probe_sweep = [
        float(s) for s in str(args.probe_sweep).split(",") if s
    ]

    if args.stage in ("synth", "probe", "train", "all"):
        stage_synth(args)
    probe = None
    if args.stage in ("probe", "all"):
        probe = stage_probe(args)
    if args.stage in ("train", "all"):
        if probe is None:
            cache = os.path.join(args.workdir, "probe_results.json")
            if os.path.exists(cache):
                with open(cache) as fh:
                    probe = json.load(fh)
        stage_train(args, probe)


if __name__ == "__main__":
    main()
