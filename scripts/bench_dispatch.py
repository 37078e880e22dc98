"""Steady-state CLI trainer throughput vs --steps-per-dispatch on the
real chip (VERDICT r4 weak-#3 / next-#5).

The driver-captured 467 clips/s is the *compiled-step* rate; what a user
gets from ``cli.main_gnn`` also pays host-side batch assembly and — in
this image — the axon tunnel's per-dispatch RTT, which K-step scan
dispatch (``parallel/sharding.py::group_batches``) amortizes. This
harness runs the actual CLI on the duel corpus TFRecords for a few
epochs per K and reports the steady-state (last-epoch) train clips/s,
i.e. the number users actually get, next to the kernel rate.

The per-step fetch pattern being amortized is exactly the reference's
(``/root/reference/main_gnn.py:363-379``: one ``next()`` + one
dispatched step per iteration).

Usage:
    python scripts/bench_dispatch.py --data /tmp/duel/main/ntu/xview \
        [--ks 1 4 16] [--epochs 3] [--json runs/dispatch_sweep.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRAIN_RE = re.compile(r"train: (\d+) clips in ([\d.]+)s \(([\d.]+) clips/s\)")


def run_k(data: str, k: int, epochs: int, batch: int) -> dict:
    with tempfile.TemporaryDirectory(prefix=f"dispatch_k{k}_") as logs:
        cmd = [
            sys.executable, "-m",
            "skeleton_action_recognition_tpu.cli.main_gnn",
            "--model", "stgcn", "--num-classes", "10",
            "--batch-size", str(batch), "--base-lr", "0.02",
            "--num-epochs", str(epochs), "--steps", str(epochs + 100),
            "--train-data-path", os.path.join(data, "train_data_joint"),
            "--test-data-path", os.path.join(data, "val_data_joint"),
            "--log-dir", logs, "--save-freq", "1000",
            "--steps-per-dispatch", str(k), "--seed", "0",
            "--notes", f"dispatch_k{k}",
        ]
        t0 = time.time()
        proc = subprocess.run(
            cmd, cwd=_REPO, capture_output=True, text=True
        )
        wall = time.time() - t0
    if proc.returncode != 0:
        print(proc.stdout[-2000:])
        print(proc.stderr[-2000:])
        raise RuntimeError(f"K={k} failed rc={proc.returncode}")
    rates = [float(m.group(3)) for m in TRAIN_RE.finditer(proc.stdout)]
    if not rates:
        raise RuntimeError(f"K={k}: no train-rate lines in stdout")
    return {
        "steps_per_dispatch": k,
        "per_epoch_clips_per_sec": rates,
        # first epoch pays compilation; steady state = the rest
        "steady_clips_per_sec": round(
            sum(rates[1:]) / max(len(rates) - 1, 1), 1
        ),
        "wall_seconds": round(wall, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/duel/main/ntu/xview")
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument(
        "--json", default=os.path.join(_REPO, "runs", "dispatch_sweep.json")
    )
    args = ap.parse_args()

    rows = []
    for k in args.ks:
        r = run_k(args.data, k, args.epochs, args.batch_size)
        rows.append(r)
        print(
            f"K={k}: steady {r['steady_clips_per_sec']} clips/s "
            f"(epochs: {r['per_epoch_clips_per_sec']})",
            flush=True,
        )

    out = {
        "batch_size": args.batch_size,
        "epochs_per_arm": args.epochs,
        "data": args.data,
        "arms": rows,
    }
    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"-> {args.json}")


if __name__ == "__main__":
    main()
