"""Demonstrate the learnable radar wavelength actually LEARNING.

The reference intends staged unfreezing of the radar wavelength
(``main_spectrogram.py:128-136``) but it is a silent no-op there (the
``radar_lambda`` name never matches a parameter). This framework's
schedule works — and this experiment shows it *helps*, not merely that
training stays finite:

* three runs on the SAME synthetic corpus (reuses the ``corpus_e2e.py``
  artifacts): (a) wavelength frozen at a detuned value, (b) same detuned
  init but ``--lambda-train-epoch 0`` so radar_lambda unfreezes after
  epoch 0, (c) wavelength frozen at the good value (the accuracy target);
* success = unfrozen (b) beats frozen (a) on val top-1 AND its
  radar_lambda trajectory moves from the detuned init toward the good
  value (the micro-Doppler band the class-keyed oscillations occupy at
  the corpus's motion scale).

Physics of the detune: every Doppler shift is ``2 v / lambda``; a 4x too
large wavelength compresses all class-distinguishing micro-Doppler bands
4x toward DC where the STFT's resolution cannot separate them, so the
gradient through the spectrogram pushes lambda down.

Writes ``runs/lambda_learning_REPORT.{json,md}``.

Usage (after ``scripts/corpus_e2e.py`` has populated ``--workdir``):

    python scripts/lambda_learning.py [--epochs 12] [--detune 4.0]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

GOOD_LAMBDA = 5e-4  # the spectrogram model default (reference value)


def run_cli(tag, workdir, logs, args, extra):
    xview = os.path.join(workdir, "ntu", "xview")
    cmd = [
        sys.executable, "-m",
        "skeleton_action_recognition_tpu.cli.main_spectrogram",
        "--num-epochs", str(args.epochs),
        "--num-classes", "60",
        "--batch-size", str(args.batch_size),
        "--base-lr", "1e-3",
        "--data-path", os.path.join(xview, "{}_data_joint.npy"),
        "--label-path", os.path.join(xview, "{}_label.pkl"),
        "--log-dir", logs,
        "--notes", f"lamlearn_{tag}",
    ] + extra
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=_REPO, capture_output=True, text=True)
    dt = time.time() - t0
    if proc.returncode != 0:
        print(proc.stdout[-3000:])
        print(proc.stderr[-3000:])
        raise RuntimeError(f"{tag} failed rc={proc.returncode}")
    out = proc.stdout
    val_acc = [
        float(m) for m in re.findall(r"val Loss: \S+ Acc: (\S+)", out)
    ]
    lam_traj = [float(m) for m in re.findall(r"radar_lambda: (\S+)", out)]
    return {
        "seconds": round(dt, 1),
        "val_acc": val_acc,
        "final_val_acc": val_acc[-1] if val_acc else None,
        "best_val_acc": max(val_acc) if val_acc else None,
        "lambda_trajectory": lam_traj,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/corpus_e2e")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument(
        "--detune", type=float, default=4.0,
        help="detuned init = detune * GOOD_LAMBDA",
    )
    ap.add_argument(
        "--lambda-rel-step", type=float, default=2e-2,
        help="per-step relative lambda move once unfrozen (ln(4)/2e-2 "
        "~ 70 steps to cross a 4x detune)",
    )
    args = ap.parse_args()

    xview = os.path.join(args.workdir, "ntu", "xview")
    if not os.path.exists(os.path.join(xview, "train_data_joint.npy")):
        raise SystemExit(
            f"corpus artifacts missing under {xview}; run "
            "scripts/corpus_e2e.py first"
        )
    logs = os.path.join(args.workdir, "logs_lamlearn")
    detuned = args.detune * GOOD_LAMBDA

    report = {
        "good_lambda": GOOD_LAMBDA,
        "detuned_lambda": detuned,
        "epochs": args.epochs,
        "lambda_rel_step": args.lambda_rel_step,
    }
    report["frozen_detuned"] = run_cli(
        "frozen", args.workdir, logs, args,
        ["--wavelength", str(detuned)],
    )
    report["unfrozen_detuned"] = run_cli(
        "unfrozen", args.workdir, logs, args,
        ["--wavelength", str(detuned),
         "--lambda-train-epoch", "0",
         "--lambda-rel-step", str(args.lambda_rel_step)],
    )
    report["frozen_good"] = run_cli(
        "good", args.workdir, logs, args,
        ["--wavelength", str(GOOD_LAMBDA)],
    )

    fr = report["frozen_detuned"]["best_val_acc"]
    un = report["unfrozen_detuned"]["best_val_acc"]
    traj = report["unfrozen_detuned"]["lambda_trajectory"]
    moved_toward_good = bool(
        traj and abs(traj[-1] - GOOD_LAMBDA) < abs(detuned - GOOD_LAMBDA)
    )
    report["unfrozen_beats_frozen"] = bool(un is not None and fr is not None
                                           and un >= fr)
    report["lambda_moved_toward_good"] = moved_toward_good

    dst = os.path.join(_REPO, "runs")
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(dst, "lambda_learning_REPORT.json"), "w") as f:
        json.dump(report, f, indent=2)

    lines = [
        "# Learnable radar wavelength: frozen vs staged-unfreeze",
        "",
        f"Corpus: `{args.workdir}` (from `scripts/corpus_e2e.py`), "
        f"{args.epochs} epochs each, detuned init "
        f"{detuned:g} vs good {GOOD_LAMBDA:g}.",
        "",
        "| run | best val top-1 | final lambda |",
        "|---|---|---|",
        f"| frozen @ detuned | {fr} | {detuned:g} |",
        f"| **unfrozen** @ detuned | {un} | "
        f"{traj[-1] if traj else None:g} |",
        f"| frozen @ good | {report['frozen_good']['best_val_acc']} | "
        f"{GOOD_LAMBDA:g} |",
        "",
        f"lambda trajectory (unfrozen): {traj}",
        "",
        f"unfrozen >= frozen: {report['unfrozen_beats_frozen']}; "
        f"lambda moved toward good value: {moved_toward_good}",
    ]
    with open(os.path.join(dst, "lambda_learning_REPORT.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
