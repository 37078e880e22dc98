"""Full-scale data_gen measurement: the real 56,880-file NTU workload
(VERDICT r4 weak-#6 / next-#8).

PARITY.md previously claimed "~2.3 min" for the C++ corpus parse at 56k
files by extrapolating from a 3000-clip run; at 56k files the pipeline
crosses shard-count and memory regimes the small run never touches. This
harness synthesizes a 56,880-file ``.skeleton`` tree (60 classes x 948
clips — the exact file count of the reference workload,
``/root/reference/data_gen/gen_joint_data.py:96-177``) and runs
``cli.data_gen`` end-to-end (parse -> pre-normalize -> bone/motion
streams -> TFRecords, xview split), recording wall clock per phase and
the peak RSS of the data_gen process.

Disk budget: ~4.6 GB raw text + ~49 GB of .npy/TFRecord outputs. The
workdir is deleted afterwards unless --keep.

Usage:
    python scripts/datagen_fullscale.py [--workdir /tmp/datagen56k]
        [--clips-per-class 948] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import subprocess
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_SCRIPTS)
if _SCRIPTS not in sys.path:
    sys.path.insert(0, _SCRIPTS)

from corpus_lib import synthesize_corpus  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/datagen56k")
    ap.add_argument("--clips-per-class", type=int, default=948)
    ap.add_argument("--num-classes", type=int, default=60)
    ap.add_argument("--num-shards", type=int, default=40)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--json",
        default=os.path.join(_REPO, "runs", "datagen_fullscale.json"),
    )
    args = ap.parse_args()

    raw = os.path.join(args.workdir, "raw")
    out = os.path.join(args.workdir, "ntu")
    os.makedirs(args.workdir, exist_ok=True)

    expect = args.clips_per_class * args.num_classes
    t0 = time.time()
    if os.path.isdir(raw) and len(os.listdir(raw)) == expect:
        # raw tree pre-synthesized (e.g. while the CPU was busy with an
        # unrelated run) — only the data_gen phase below is measured
        n, synth_s = expect, 0.0
        print(f"reusing {n} pre-synthesized files", flush=True)
    else:
        n = synthesize_corpus(
            raw, args.clips_per_class, num_classes=args.num_classes
        )
        synth_s = time.time() - t0
        print(f"synthesized {n} files in {synth_s:.0f}s", flush=True)

    skip = os.path.join(args.workdir, "missing.txt")
    open(skip, "a").close()

    cmd = [
        sys.executable, "-m",
        "skeleton_action_recognition_tpu.cli.data_gen",
        "--data-path", raw, "--ignored-sample-path", skip,
        "--out-folder", out, "--benchmarks", "xview",
        "--num-shards", str(args.num_shards),
    ]
    before = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=_REPO, text=True)
    gen_s = time.time() - t0
    peak_kb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    if proc.returncode != 0:
        raise RuntimeError(f"data_gen failed rc={proc.returncode}")

    def du(path):
        total = 0
        for root, _, files in os.walk(path):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        return total

    report = {
        "num_files": n,
        "synthesize_seconds": round(synth_s, 1),
        "data_gen_seconds": round(gen_s, 1),
        "data_gen_minutes": round(gen_s / 60, 2),
        "peak_rss_gb": round(max(peak_kb, before) / 1024 / 1024, 2),
        "raw_bytes": du(raw),
        "output_bytes": du(out),
        "num_shards": args.num_shards,
        "benchmarks": ["xview"],
        "host_cpus": os.cpu_count(),
    }
    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report))

    if not args.keep:
        shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
