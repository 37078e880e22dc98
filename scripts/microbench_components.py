"""Per-component ST-GCN train-step cost breakdown on one TPU chip.

Times the pieces of one spatio-temporal block (spatial conv, temporal
conv, the BN/elementwise chains) forward and forward+backward, at the
three block shapes of the stock 10-block plan, using the same
scan-delta methodology as ``bench.py`` (the axon tunnel executes lazily
and replays on fetch, so each measurement runs N chained iterations
inside one jitted ``lax.scan`` and differences the N-step and 1-step
programs).

Usage::

    python scripts/microbench_components.py [filter ...]

Optional positional filters restrict which component names run
(substring match). Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax

_CACHE = os.path.join(_REPO, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

BATCH_NM = 256  # batch 128 x 2 bodies
V = 25
STEPS = 6

# (tag, T, C_in, C_out): the three steady-state block shapes
SHAPES = [
    ("b64", 300, 64, 64),
    ("b128", 150, 128, 128),
    ("b256", 75, 256, 256),
]


def timeit(name, make_body, *args):
    """``make_body(carry, *args) -> carry``; scan-delta timing. Large
    tensors ride in ``args`` (jit arguments, NOT captured constants —
    the remote compile helper caps the request body size)."""
    carry = jnp.float32(0.0)

    def multi(k):
        @jax.jit
        def run(carry, *args):
            def body(c, _):
                return make_body(c, *args), None

            return jax.lax.scan(body, carry, None, length=k)[0]

        return run

    f1, fn = multi(1), multi(STEPS)
    float(f1(carry, *args))
    float(fn(carry, *args))
    t0 = time.perf_counter()
    float(f1(carry, *args))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(carry, *args))
    dn = time.perf_counter() - t0
    ms = (dn - d1) / (STEPS - 1) * 1e3
    print(json.dumps({"name": name, "ms": round(ms, 3)}), flush=True)
    return ms


def feed(out):
    """Fold an op output back into the scalar carry (keeps scan
    iterations dependent so XLA cannot hoist or dedupe them)."""
    return jnp.mean(out.astype(jnp.float32)) * 1e-12


def grad_feed(val, grads):
    gsum = sum(
        jnp.sum(l.astype(jnp.float32) ** 2)
        for l in jax.tree_util.tree_leaves(grads)
    )
    return (val + gsum * 1e-12) * 1e-12


def main():
    filters = sys.argv[1:]

    def want(name):
        return not filters or any(f in name for f in filters)

    rng = np.random.default_rng(0)
    from skeleton_action_recognition_tpu.graphs.ntu_rgb_d import Graph
    from skeleton_action_recognition_tpu.models.gcn import GraphConvTD
    from skeleton_action_recognition_tpu.models.stgcn import (
        STConvBlock,
        TemporalConv,
    )

    a_np = Graph("spatial").A.astype(np.float32)

    for tag, t, c_in, c_out in SHAPES:
        x_np = rng.normal(size=(BATCH_NM, t, V, c_in)).astype(np.float32)
        x32 = jnp.asarray(x_np)
        x16 = x32.astype(jnp.bfloat16)
        a = jnp.asarray(a_np)

        # --- whole block, fwd and train (grad wrt params) ---
        blk = STConvBlock(c_out, stride=1, residual=True,
                          dtype=jnp.bfloat16)
        vs = blk.init(jax.random.key(0), x32[:1], a, False)

        def block_fwd(c, x, vs, blk=blk, a=a):
            out, _ = blk.apply(vs, x + c, a, True,
                               mutable=["batch_stats"])
            return feed(out[0])

        if want(f"block_{tag}_fwd"):
            timeit(f"block_{tag}_fwd", block_fwd, x32, vs)

        def block_train(c, x, vs, blk=blk, a=a):
            def loss(p):
                out, _ = blk.apply(
                    {"params": p, "batch_stats": vs["batch_stats"]},
                    x + c, a, True, mutable=["batch_stats"],
                )
                return jnp.mean(out[0].astype(jnp.float32))

            val, g = jax.value_and_grad(loss)(vs["params"])
            return grad_feed(val, g)

        if want(f"block_{tag}_train"):
            timeit(f"block_{tag}_train", block_train, x32, vs)

        # --- spatial conv alone (Dense + adjacency einsum) ---
        sp = GraphConvTD(c_out, dtype=jnp.bfloat16)
        spv = sp.init(jax.random.key(0), x32[:1], a)

        def spatial_fwd(c, x, spv, sp=sp, a=a):
            out, _ = sp.apply(spv, x + c.astype(x.dtype), a)
            return feed(out)

        if want(f"spatial_{tag}_fwd"):
            timeit(f"spatial_{tag}_fwd", spatial_fwd, x16, spv)

        def spatial_train(c, x, spv, sp=sp, a=a):
            def loss(p):
                out, _ = sp.apply(p, x + c.astype(x.dtype), a)
                return jnp.mean(out.astype(jnp.float32))

            val, g = jax.value_and_grad(loss)(spv)
            return grad_feed(val, g)

        if want(f"spatial_{tag}_train"):
            timeit(f"spatial_{tag}_train", spatial_train, x16, spv)

        # --- fused Pallas spatial conv (fwd / train) ---
        from skeleton_action_recognition_tpu.ops.pallas.sgcn import (
            make_fused_graph_conv,
        )

        fgc = make_fused_graph_conv(a_np, V)
        fw = jnp.asarray(
            rng.normal(size=(c_in, 3 * c_out)).astype(np.float32) * 0.1
        )
        fb = jnp.zeros((3 * c_out,), jnp.float32)

        def fspatial_fwd(c, x, fw, fb):
            return feed(fgc(x + c.astype(x.dtype), fw, fb))

        if want(f"fspatial_{tag}_fwd"):
            timeit(f"fspatial_{tag}_fwd", fspatial_fwd, x16, fw, fb)

        def fspatial_train(c, x, fw, fb):
            def loss(args):
                fw_, fb_ = args
                out = fgc(x + c.astype(x.dtype), fw_, fb_)
                return jnp.mean(out.astype(jnp.float32))

            val, g = jax.value_and_grad(loss)((fw, fb))
            return grad_feed(val, g)

        if want(f"fspatial_{tag}_train"):
            timeit(f"fspatial_{tag}_train", fspatial_train, x16, fw, fb)

        # --- dense part only (the K*F channel matmul) ---
        w = jnp.asarray(
            rng.normal(size=(c_in, 3 * c_out)).astype(np.float32)
        ).astype(jnp.bfloat16)

        def dense_fwd(c, x, w):
            return feed((x + c.astype(x.dtype)) @ w)

        if want(f"dense_{tag}_fwd"):
            timeit(f"dense_{tag}_fwd", dense_fwd, x16, w)

        # --- adjacency einsum only ---
        z = jnp.asarray(
            rng.normal(size=(BATCH_NM, t, V, 3, c_out)).astype(
                np.float32
            )
        ).astype(jnp.bfloat16)

        def adj_fwd(c, z, a):
            zz = z + c.astype(z.dtype)
            return feed(
                jnp.einsum("ntvko,kvw->ntwo", zz, a.astype(zz.dtype))
            )

        if want(f"adj_{tag}_fwd"):
            timeit(f"adj_{tag}_fwd", adj_fwd, z, a.astype(jnp.bfloat16))

        # --- temporal conv (BN->relu->conv9x1->BN) fwd/train ---
        tc = TemporalConv(c_out, dtype=jnp.bfloat16)
        y_np = rng.normal(size=(BATCH_NM, t, V, c_out)).astype(
            np.float32
        )
        y32 = jnp.asarray(y_np)
        tcv = tc.init(jax.random.key(0), y32[:1], False)

        def tconv_fwd(c, y, tcv, tc=tc):
            out, _ = tc.apply(tcv, y + c, True, mutable=["batch_stats"])
            return feed(out)

        if want(f"tconv_{tag}_fwd"):
            timeit(f"tconv_{tag}_fwd", tconv_fwd, y32, tcv)

        def tconv_train(c, y, tcv, tc=tc):
            def loss(p):
                out, _ = tc.apply(
                    {"params": p, "batch_stats": tcv["batch_stats"]},
                    y + c, True, mutable=["batch_stats"],
                )
                return jnp.mean(out.astype(jnp.float32))

            val, g = jax.value_and_grad(loss)(tcv["params"])
            return grad_feed(val, g)

        if want(f"tconv_{tag}_train"):
            timeit(f"tconv_{tag}_train", tconv_train, y32, tcv)

        # --- fused Pallas temporal conv (fwd / train) ---
        from skeleton_action_recognition_tpu.ops.pallas.tconv import (
            affine_relu_tconv,
        )

        ck0 = jnp.asarray(
            rng.normal(size=(9, 1, c_out, c_out)).astype(np.float32)
            * 0.05
        )
        cb0 = jnp.zeros((c_out,), jnp.float32)
        sc0 = jnp.ones((c_out,), jnp.float32)
        sh0 = jnp.zeros((c_out,), jnp.float32)
        y16 = y32.astype(jnp.bfloat16)

        def ftconv_fwd(c, y, ck, cb, sc, sh):
            u, s2, ss2 = affine_relu_tconv(
                y + c.astype(y.dtype), sc, sh, ck, cb, V, 9
            )
            return feed(u) + feed(s2)

        if want(f"ftconv_{tag}_fwd"):
            timeit(f"ftconv_{tag}_fwd", ftconv_fwd, y16, ck0, cb0,
                   sc0, sh0)

        def ftconv_train(c, y, ck, cb, sc, sh):
            def loss(args):
                ck_, cb_, sc_, sh_ = args
                u, s2, ss2 = affine_relu_tconv(
                    y + c.astype(y.dtype), sc_, sh_, ck_, cb_, V, 9
                )
                n = u.size // u.shape[-1]
                mean = s2 / n
                var = ss2 / n - mean * mean
                un = (u.astype(jnp.float32) - mean) * jax.lax.rsqrt(
                    var + 1e-3
                )
                return jnp.mean(un)

            val, g = jax.value_and_grad(loss)((ck, cb, sc, sh))
            return grad_feed(val, g)

        if want(f"ftconv_{tag}_train"):
            timeit(f"ftconv_{tag}_train", ftconv_train, y16, ck0, cb0,
                   sc0, sh0)

        # --- bare conv9x1 (no BN) ---
        ck = ck0.astype(jnp.bfloat16)

        def conv_fwd(c, y, ck):
            out = jax.lax.conv_general_dilated(
                y + c.astype(y.dtype), ck[:, :, :, :], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return feed(out)

        if want(f"conv_{tag}_fwd"):
            timeit(f"conv_{tag}_fwd", conv_fwd, y16,
                   ck.reshape(9, 1, c_out, c_out))

        # --- conv9x1 as explicit im2col matmul (MXU-shape probe: at
        # C=64 the conv's contraction K=9*C=576 against Co=64 output
        # lanes may lower better as one big matmul) ---
        wm = jnp.asarray(
            rng.normal(size=(9 * c_out, c_out)).astype(np.float32)
        ).astype(jnp.bfloat16)

        def convm_fwd(c, y, wm):
            yy = y + c.astype(y.dtype)
            ypad = jnp.pad(yy, ((0, 0), (4, 4), (0, 0), (0, 0)))
            cols = jnp.concatenate(
                [ypad[:, k : k + yy.shape[1]] for k in range(9)],
                axis=-1,
            )
            return feed(cols @ wm)

        if want(f"convm_{tag}_fwd"):
            timeit(f"convm_{tag}_fwd", convm_fwd, y16, wm)

        # --- conv9x1 with (NM, V, T, C) layout (kernel (1,9)) ---
        def convt_fwd(c, y, ck):
            yy = jnp.transpose(y + c.astype(y.dtype), (0, 2, 1, 3))
            out = jax.lax.conv_general_dilated(
                yy, ck, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return feed(out)

        if want(f"convt_{tag}_fwd"):
            timeit(
                f"convt_{tag}_fwd", convt_fwd, y16,
                ck0.astype(jnp.bfloat16).reshape(1, 9, c_out, c_out),
            )

        # --- one training-mode BN+relu pass (f32 in, f32 out) ---
        bn = nn.BatchNorm(
            use_running_average=False, momentum=0.99, epsilon=1e-3
        )
        bnv = bn.init(jax.random.key(0), y32[:1])

        def bn_fwd(c, y, bnv, bn=bn):
            out, _ = bn.apply(bnv, y + c, mutable=["batch_stats"])
            return feed(nn.relu(out))

        if want(f"bn_{tag}_fwd"):
            timeit(f"bn_{tag}_fwd", bn_fwd, y32, bnv)

        # --- same BN but bf16 compute dtype ---
        bnh = nn.BatchNorm(
            use_running_average=False, momentum=0.99, epsilon=1e-3,
            dtype=jnp.bfloat16,
        )
        bnhv = bnh.init(jax.random.key(0), y16[:1])

        def bnh_fwd(c, y, bnhv, bnh=bnh):
            out, _ = bnh.apply(
                bnhv, y + c.astype(y.dtype), mutable=["batch_stats"]
            )
            return feed(nn.relu(out))

        if want(f"bnh_{tag}_fwd"):
            timeit(f"bnh_{tag}_fwd", bnh_fwd, y16, bnhv)


if __name__ == "__main__":
    main()
