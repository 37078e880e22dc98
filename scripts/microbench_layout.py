"""Layout microbench: does a V=25 second-minor axis pay padded HBM traffic?

TPU HBM layouts tile the last two dims (8,128)/f32, (16,128)/bf16 — an
``(NM, T, 25, C)`` activation may be stored as ``(..., 32, roundup128(C))``
tiles, in which case every elementwise pass pays 1.28x (V) and up to 2x
(C=64 lanes) *physical* bytes over the logical size. The ST-GCN roofline
(``scripts/roofline_stgcn.py``) assumes logical bytes; if padded traffic
is real, relayouting the backbone (fold V into lanes, or carry VP=32) is
the next HBM lever. This measures it directly: the same logical
reduce/elementwise/conv work in V-minor, VP-padded, and V-folded-into-C
layouts.

Scan-delta methodology (see ``bench.py``). Usage:
``python scripts/microbench_layout.py [stage ...]``
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

NM, T, V, C = 256, 300, 25, 64
STEPS = 6


def timeit(name, fn, *args):
    def multi(k):
        @jax.jit
        def run(*a):
            def body(c, _):
                return c + fn(*a, c), None

            return jax.lax.scan(body, jnp.float32(0), None, length=k)[0]

        return run

    f1, fn_ = multi(1), multi(STEPS)
    float(f1(*args)); float(fn_(*args))
    t0 = time.perf_counter(); float(f1(*args)); d1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(fn_(*args)); dn = time.perf_counter() - t0
    ms = (dn - d1) / (STEPS - 1) * 1e3
    print(json.dumps({name: {"ms": round(ms, 3)}}), flush=True)
    return ms


def main():
    want = sys.argv[1:]

    def sel(n):
        return not want or any(w in n for w in want)

    rng = np.random.default_rng(0)
    x25 = jnp.asarray(
        rng.normal(size=(NM, T, V, C)).astype(np.float16).astype(np.float32)
    ).astype(jnp.bfloat16)
    x32 = jnp.pad(x25, ((0, 0), (0, 0), (0, 32 - V), (0, 0)))
    xflat = x25.reshape(NM, T, V * C)  # (256,300,1600): lanes dense
    scale = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

    # pure read bandwidth: full reduce of the same logical bytes
    if sel("read_v25"):
        timeit("read_v25", lambda a, c: jnp.sum(
            a.astype(jnp.float32)) * (1 + c * 0) * 1e-9, x25)
    if sel("read_v32"):
        timeit("read_v32", lambda a, c: jnp.sum(
            a.astype(jnp.float32)) * (1 + c * 0) * 1e-9, x32)
    if sel("read_flat"):
        timeit("read_flat", lambda a, c: jnp.sum(
            a.astype(jnp.float32)) * (1 + c * 0) * 1e-9, xflat)

    # read + write: BN-normalize-like affine + relu (out consumed by a
    # tiny reduce so the write can't be elided)
    def affine(a, s, b, c):
        y = jnp.maximum(a.astype(jnp.float32) * s + b + c * 0, 0.0)
        y = y.astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    if sel("affine_v25"):
        timeit("affine_v25", affine, x25, scale, shift)
    if sel("affine_v32"):
        timeit("affine_v32", affine, x32, scale, shift)
    if sel("affine_flat"):
        timeit(
            "affine_flat", affine, xflat,
            jnp.tile(scale, V), jnp.tile(shift, V),
        )

    # the 9x1 temporal conv in each layout
    kern = jnp.asarray(
        rng.normal(size=(9, 1, C, C)).astype(np.float32) * 0.05
    ).astype(jnp.bfloat16)

    def conv4(a, k, c):
        y = jax.lax.conv_general_dilated(
            a * (1 + c * 0).astype(a.dtype), k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(y) * 1e-9

    if sel("tconv_v25"):
        timeit("tconv_v25", conv4, x25, kern)
    if sel("tconv_v32"):
        timeit("tconv_v32", conv4, x32, kern)

    # grouped 1D conv on the V-folded layout: feature_group_count=V with
    # the kernel replicated per joint — identical math/FLOPs, lanes dense
    kern_g = jnp.tile(kern.reshape(9, C, C), (1, V, 1))  # (9, V*C, C)

    def conv_grouped(a, k, c):
        y = jax.lax.conv_general_dilated(
            a * (1 + c * 0).astype(a.dtype), k, (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=V,
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(y) * 1e-9

    if sel("tconv_grouped"):
        timeit("tconv_grouped", conv_grouped, xflat, kern_g)


if __name__ == "__main__":
    main()
