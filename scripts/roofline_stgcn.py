"""Analytic roofline for the ST-GCN train step at the bench shape.

Computes, per component of one spatio-temporal block (and for the whole
10-block plan), the stock algorithmic FLOPs, the FLOPs the fused kernels
actually execute (block-diagonal / VP padding included), and the minimum
HBM bytes each pass must move — then converts both to time lower bounds
at the chip's peak matmul rate and HBM bandwidth. Combined with
``scripts/microbench_components.py`` measurements this yields the
"profile decomposition proving the remaining time is irreducible (or
not)" that the round-2 VERDICT asks for (item 5).

No TPU needed — pure arithmetic. Pass a microbench JSONL file (one
``{"name": ..., "ms": ...}`` per line) to annotate measured times:

    python scripts/roofline_stgcn.py [--micro /tmp/tpu_q/micro.log]
        [--peak-tflops 197] [--hbm-gbps 820]

Model constants mirror ``bench.py``: batch 128 x 2 bodies, T=300, V=25,
bf16 compute (2 bytes/activation), 10-block plan from
``models/stgcn.py::STGCNBackbone`` (reference ``stgcn.py:114-123``).
"""

import argparse
import json
import os
import re
import sys

NM = 256
V = 25
VP = 32          # roundup8(25)
K = 3            # spatial partitions
BYTES = 2        # bf16 activations

# (T_in, C_in, C_out, stride) per block of the stock plan
PLAN = [
    (300, 3, 64, 1),
    (300, 64, 64, 1),
    (300, 64, 64, 1),
    (300, 64, 64, 1),
    (300, 64, 128, 2),
    (150, 128, 128, 1),
    (150, 128, 128, 1),
    (150, 128, 256, 2),
    (75, 256, 256, 1),
    (75, 256, 256, 1),
]


def block_costs(t, c_in, c_out, stride):
    """Returns {component: (stock_flops, executed_flops, hbm_bytes)} for
    the training FORWARD of one block; backward multiplies matmul/conv
    FLOPs by 2 and roughly doubles elementwise traffic."""
    rows = NM * t * V
    rows_out = NM * (t // stride) * V

    # spatial 1x1 conv (one (rows, C_in) @ (C_in, K*C_out) matmul)
    f_dense = 2 * rows * c_in * K * c_out
    # adjacency contraction, stock: sum over k, v for each output node
    f_adj = 2 * rows * K * V * c_out
    # fused kernel executes the G-fold block-diagonal form:
    # per group of g frames, (g*VP, K*g*VP) @ (K*g*VP, C_out)
    g = max(d for d in range(1, 65) if d * VP <= 128 and t % d == 0)
    n_groups = NM * t // g
    f_adj_exec = 2 * n_groups * (g * VP) * (K * g * VP) * c_out
    # fused kernel HBM: read x once, write out once (z stays in VMEM);
    # stock XLA also round-trips the K*C_out z intermediate
    b_fused = (rows * c_in + rows * c_out) * BYTES
    b_stock = b_fused + 2 * rows * K * c_out * BYTES

    # temporal 9x1 conv
    f_tconv = 2 * rows_out * 9 * c_out * c_out
    b_tconv = (rows * c_out + rows_out * c_out) * BYTES

    # BN passes: BN1 stats read + normalize read/write (train fwd),
    # BN2 the same at rows_out
    b_bn1 = 3 * rows * c_out * BYTES
    b_bn2 = 3 * rows_out * c_out * BYTES
    # residual add + relu: read res + read x + write
    b_res = 3 * rows_out * c_out * BYTES

    return {
        "spatial_dense": (f_dense, f_dense, 0),
        "spatial_adj": (f_adj, f_adj_exec, 0),
        "spatial_hbm_fused": (0, 0, b_fused),
        "spatial_hbm_stock_extra": (0, 0, b_stock - b_fused),
        "tconv": (f_tconv, f_tconv, b_tconv),
        "bn_elem": (0, 0, b_bn1 + b_bn2 + b_res),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro", help="microbench JSONL to annotate")
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--hbm-gbps", type=float, default=820.0)
    args = ap.parse_args()

    peak = args.peak_tflops * 1e12
    bw = args.hbm_gbps * 1e9

    measured = {}
    if args.micro and os.path.exists(args.micro):
        for line in open(args.micro):
            m = re.search(r'\{.*"name".*\}', line)
            if m:
                d = json.loads(m.group(0))
                measured[d["name"]] = d["ms"]

    total = {}
    print(f"{'component':26s} {'stock GF':>9s} {'exec GF':>9s} "
          f"{'HBM MB':>8s} {'t_mxu ms':>9s} {'t_hbm ms':>9s}")
    for i, (t, ci, co, s) in enumerate(PLAN):
        for name, (fs, fe, b) in block_costs(t, ci, co, s).items():
            acc = total.setdefault(name, [0, 0, 0])
            acc[0] += fs
            acc[1] += fe
            acc[2] += b

    tot_f = tot_fe = tot_b = 0.0
    for name, (fs, fe, b) in total.items():
        t_mxu = fe / peak * 1e3
        t_hbm = b / bw * 1e3
        tot_f += fs
        tot_fe += fe
        tot_b += b
        print(f"{name:26s} {fs/1e9:9.1f} {fe/1e9:9.1f} {b/1e6:8.1f} "
              f"{t_mxu:9.3f} {t_hbm:9.3f}")

    # whole-step bounds: fwd above; bwd ~2x matmul FLOPs + ~2x traffic
    fwd_mxu = tot_fe / peak * 1e3
    fwd_hbm = tot_b / bw * 1e3
    print("-" * 75)
    print(f"{'FWD total':26s} {tot_f/1e9:9.1f} {tot_fe/1e9:9.1f} "
          f"{tot_b/1e6:8.1f} {fwd_mxu:9.3f} {fwd_hbm:9.3f}")
    step_mxu = 3 * fwd_mxu
    step_hbm = 3 * fwd_hbm
    lower = max(step_mxu, step_hbm)
    print(json.dumps({
        "batch": NM // 2,
        "fwd_exec_gflop": round(tot_fe / 1e9, 1),
        "train_step_mxu_ms_lower": round(step_mxu, 2),
        "train_step_hbm_ms_lower": round(step_hbm, 2),
        "clips_per_sec_upper_bound": round((NM // 2) / (lower / 1e3), 1),
    }))
    if measured:
        print("\nmeasured (microbench):")
        for k in sorted(measured):
            print(f"  {k:26s} {measured[k]:8.3f} ms")


if __name__ == "__main__":
    main()
