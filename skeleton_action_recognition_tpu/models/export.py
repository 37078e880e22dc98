"""Inference export: ST-GCN with constants folded for serving speed.

At inference every BatchNorm is a per-channel affine and the adjacency
stack is a constant, so each block's spatial conv

    ``out[t, w, co] = sum_k sum_v A[k, v, w] (x[t, v, :] @ W_k + b_k)[co]``

folds into ONE dense matmul over joint-channel features:

    ``Wf[(v, ci), (w, co)] = sum_k A[k, v, w] * W[ci, k, co]``
    ``out[t] = relu(x[t].reshape(V*Ci) @ Wf + bf)``

with the post-conv BatchNorm's scale/shift absorbed into ``Wf``/``bf``,
and the data-BN absorbed into the first block's ``Wf``. The folded matmul
is ~6x the FLOPs of the factored form but runs at MXU-ideal shapes
(``V*C`` = 1600-6400 lanes) with zero layout churn — measured faster on
v5e, and it removes every elementwise BN/affine pass from the block.

The temporal ``[9, 1]`` conv stays a convolution (it already runs at
near-peak) with its following BatchNorm folded into its kernel/bias.

Produces identical results to ``model.apply(..., train=False)`` up to
float reassociation; validated in ``tests/test_export.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from skeleton_action_recognition_tpu.graphs.ntu_rgb_d import Graph


def _bn_affine(bn_params, bn_stats, eps=1e-3):
    """BatchNorm(train=False) as (scale, shift)."""
    scale = np.asarray(bn_params["scale"]) / np.sqrt(
        np.asarray(bn_stats["var"]) + eps
    )
    shift = np.asarray(bn_params["bias"]) - scale * np.asarray(
        bn_stats["mean"]
    )
    return scale, shift


class FusedSTGCNPredictor:
    """Folded-constant ST-GCN forward for inference.

    Built from a trained ``models.stgcn.Model``'s ``params`` +
    ``batch_stats`` (the stock 10-block plan). Call with
    ``(N, 3, T, V, M)``; returns logits ``(N, num_classes)``.
    """

    BLOCK_PLAN = (
        (64, 1, False), (64, 1, True), (64, 1, True), (64, 1, True),
        (128, 2, True), (128, 1, True), (128, 1, True),
        (256, 2, True), (256, 1, True), (256, 1, True),
    )

    def __init__(self, params, batch_stats, dtype=jnp.bfloat16):
        p = jax.device_get(params)["backbone"]
        s = jax.device_get(batch_stats)["backbone"]
        a = Graph("spatial").A.astype(np.float64)  # (K, V, V)
        k_parts, v = a.shape[0], a.shape[1]
        self.v = v
        self.dtype = dtype
        self.weights = []
        self.static = []

        # data-BN affine over flattened (V*C) features
        dbn_scale, dbn_shift = _bn_affine(
            p["data_bn"]["BatchNorm_0"], s["data_bn"]["BatchNorm_0"]
        )

        self.blocks = []
        c_in = 3
        for i, (c_out, stride, residual) in enumerate(self.BLOCK_PLAN):
            bp = p[f"block_{i}"]
            bs = s[f"block_{i}"]
            kernel = np.asarray(
                bp["sgcn"]["Dense_0"]["kernel"], np.float64
            ).reshape(c_in, k_parts, c_out)
            bias = np.asarray(
                bp["sgcn"]["Dense_0"]["bias"], np.float64
            ).reshape(k_parts, c_out)

            # Wf[(v,ci),(w,co)] = sum_k A[k,v,w] W[ci,k,co]
            wf = np.einsum("kvw,iko->viwo", a, kernel).reshape(
                v * c_in, v * c_out
            )
            bf = np.einsum("kvw,ko->wo", a, bias).reshape(v * c_out)

            # fold BN1 (pre-relu) into Wf/bf
            s1, t1 = _bn_affine(
                bp["tgcn"]["BatchNorm_0"], bs["tgcn"]["BatchNorm_0"]
            )
            wf = wf * np.tile(s1, v)[None, :]
            bf = bf * np.tile(s1, v) + np.tile(t1, v)

            if i == 0:
                # absorb the data-BN affine into block 0's matmul:
                # (x*s + t) @ Wf = x @ (diag(s) Wf) + t @ Wf
                bf = bf + dbn_shift @ wf
                wf = wf * dbn_scale[:, None]

            # temporal conv with BN2 folded into kernel/bias
            ck = np.asarray(bp["tgcn"]["Conv_0"]["kernel"], np.float64)
            cb = np.asarray(bp["tgcn"]["Conv_0"]["bias"], np.float64)
            s2, t2 = _bn_affine(
                bp["tgcn"]["BatchNorm_1"], bs["tgcn"]["BatchNorm_1"]
            )
            ck = ck * s2[None, None, None, :]
            cb = cb * s2 + t2

            res = None
            if residual and (c_in != c_out or stride != 1):
                rk = np.asarray(
                    bp["residual_conv"]["kernel"], np.float64
                )[0, 0]
                rb = np.asarray(bp["residual_conv"]["bias"], np.float64)
                sr, tr = _bn_affine(
                    bp["residual_bn"], bs["residual_bn"]
                )
                res = (rk * sr[None, :], rb * sr + tr)

            # weights live in a pytree passed as jit ARGUMENTS — folded
            # weights total ~700 MB and would blow up the program as
            # inlined constants
            self.weights.append(
                dict(
                    wf=jnp.asarray(wf, dtype),
                    bf=jnp.asarray(bf, jnp.float32),
                    ck=jnp.asarray(ck, dtype),
                    cb=jnp.asarray(cb, jnp.float32),
                    res=None if res is None else (
                        jnp.asarray(res[0], dtype),
                        jnp.asarray(res[1], jnp.float32),
                    ),
                )
            )
            self.static.append((stride, residual, c_out))
            c_in = c_out

        head = jax.device_get(params)["backbone"]["logits"]
        self.head = (
            jnp.asarray(head["kernel"], jnp.float32),
            jnp.asarray(head["bias"], jnp.float32),
        )

    def forward(self, weights, head, x):
        n, _, t, v, m = x.shape
        h = jnp.transpose(x, (0, 4, 2, 3, 1)).reshape(n * m, t, v, -1)
        for blk, (stride, residual, c_out) in zip(weights, self.static):
            nm, t_cur, _, c_in = h.shape
            flat = h.reshape(nm, t_cur, v * c_in).astype(self.dtype)
            z = (
                jnp.einsum(
                    "ntf,fg->ntg", flat, blk["wf"],
                    preferred_element_type=jnp.float32,
                )
                + blk["bf"]
            )
            z = jnp.maximum(z, 0.0).reshape(nm, t_cur, v, c_out)
            z = jax.lax.conv_general_dilated(
                z.astype(self.dtype),
                blk["ck"],
                window_strides=(stride, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ) + blk["cb"]

            if not residual:
                res = 0.0
            elif blk["res"] is None:
                res = h
            else:
                rk, rb = blk["res"]
                strided = h[:, ::stride]
                res = (
                    jnp.einsum(
                        "ntvc,cd->ntvd", strided.astype(self.dtype), rk,
                        preferred_element_type=jnp.float32,
                    )
                    + rb
                )
            h = jnp.maximum(z + res, 0.0)

        pooled = jnp.mean(h, axis=(1, 2))  # (NM, C)
        pooled = pooled.reshape(n, m, -1).mean(axis=1)
        return pooled @ head[0] + head[1]

    def __call__(self, x):
        return self.forward(self.weights, self.head, x)


def _jit_predictor(pred, mesh=None, axis: str = "data"):
    """Jit a predictor's ``forward`` with weights passed as arguments
    (not inlined constants). With a mesh, weights are replicated and the
    batch axis of input/output is sharded over ``axis`` — multi-chip
    data-parallel serving (the batch must divide the axis size; callers
    pad partial batches)."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P(axis))
        fwd = jax.jit(
            pred.forward,
            in_shardings=(rep, rep, shard),
            out_shardings=shard,
        )
    else:
        fwd = jax.jit(pred.forward)

    def run(x):
        return fwd(pred.weights, pred.head, x)

    return run


def fused_stgcn_predictor(
    params, batch_stats, dtype=jnp.bfloat16, jit: bool = True,
    mesh=None, axis: str = "data",
):
    pred = FusedSTGCNPredictor(params, batch_stats, dtype)
    if not jit and mesh is None:
        return pred.__call__
    return _jit_predictor(pred, mesh=mesh, axis=axis)


# ---------------------------------------------------------------------------
# int8 weight-only quantization of the folded predictor
# ---------------------------------------------------------------------------

def _quantize_cols(w: jnp.ndarray):
    """Per-output-column symmetric int8 quantization of a 2-D weight."""
    w64 = np.asarray(w, np.float32)
    scale = np.abs(w64).max(axis=0) / 127.0
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(w64 / scale[None, :]), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scale, jnp.float32)


class QuantizedSTGCNPredictor(FusedSTGCNPredictor):
    """Folded predictor with int8 weight-only storage.

    The big folded matrices (``wf``, up to 6400x6400) are stored as int8
    with per-output-column scales and dequantized to bf16 at the matmul —
    halving weight memory/HBM traffic. Measured throughput on v5e is at
    parity with bf16 (1,577 vs 1,591 clips/s at B=256): these shapes are
    compute-bound, so the win is memory footprint, not speed. (True int8
    MXU rate would additionally need activation quantization.)
    """

    def __init__(self, params, batch_stats):
        super().__init__(params, batch_stats, dtype=jnp.bfloat16)
        for blk in self.weights:
            q, scale = _quantize_cols(blk.pop("wf"))
            blk["wf_q"] = q
            blk["wf_scale"] = scale

    def forward(self, weights, head, x):
        n, _, t, v, m = x.shape
        h = jnp.transpose(x, (0, 4, 2, 3, 1)).reshape(n * m, t, v, -1)
        for blk, (stride, residual, c_out) in zip(weights, self.static):
            nm, t_cur, _, c_in = h.shape
            flat = h.reshape(nm, t_cur, v * c_in).astype(self.dtype)
            z = jnp.einsum(
                "ntf,fg->ntg",
                flat,
                blk["wf_q"].astype(self.dtype),
                preferred_element_type=jnp.float32,
            ) * blk["wf_scale"] + blk["bf"]
            z = jnp.maximum(z, 0.0).reshape(nm, t_cur, v, c_out)
            z = jax.lax.conv_general_dilated(
                z.astype(self.dtype),
                blk["ck"],
                window_strides=(stride, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ) + blk["cb"]
            if not residual:
                res = 0.0
            elif blk["res"] is None:
                res = h
            else:
                rk, rb = blk["res"]
                res = (
                    jnp.einsum(
                        "ntvc,cd->ntvd",
                        h[:, ::stride].astype(self.dtype), rk,
                        preferred_element_type=jnp.float32,
                    )
                    + rb
                )
            h = jnp.maximum(z + res, 0.0)

        pooled = jnp.mean(h, axis=(1, 2)).reshape(n, m, -1).mean(axis=1)
        return pooled @ head[0] + head[1]


def quantized_stgcn_predictor(
    params, batch_stats, jit: bool = True, mesh=None, axis: str = "data"
):
    pred = QuantizedSTGCNPredictor(params, batch_stats)
    if not jit and mesh is None:
        return pred.__call__
    return _jit_predictor(pred, mesh=mesh, axis=axis)


# ---------------------------------------------------------------------------
# int8 weight+activation quantization (W8A8): the int8 MXU path
# ---------------------------------------------------------------------------

def _quantize_rows(x: jnp.ndarray):
    """Dynamic symmetric int8 quantization along the last axis.

    Returns ``(q, scale)`` with ``q`` int8 of ``x``'s shape and ``scale``
    of ``x.shape[:-1]`` such that ``q * scale[..., None] ~= x``.
    """
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(
        jnp.round(x / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


class Int8STGCNPredictor(QuantizedSTGCNPredictor):
    """Folded predictor with int8 weights AND activations (W8A8).

    Each block's folded spatial matmul runs as ``s8 x s8 -> s32``
    ``dot_general`` — the MXU's double-rate int8 path (v5e: 394 TOPS vs
    197 bf16 TFLOP/s) — with dynamic per-row symmetric activation scales
    computed on the fly and the per-column weight scales from
    :class:`QuantizedSTGCNPredictor`. Dequantization is a rank-1
    outer-product rescale fused into the bias add. The temporal ``[9,1]``
    conv and the tiny residual/head matmuls stay bf16: they carry a small
    fraction of the FLOPs, and the conv already runs near peak.

    Accuracy: the extra activation rounding roughly doubles weight-only
    quantization noise (still argmax-preserving in
    ``tests/test_export.py``); validate on a held-out split before
    serving, as with any post-training quantization.

    Implements the serving counterpart of the reference's eval path
    (``main_gnn.py:340-368``) at int8 rate; the reference has no
    quantized inference at all.
    """

    def forward(self, weights, head, x):
        n, _, t, v, m = x.shape
        h = jnp.transpose(x, (0, 4, 2, 3, 1)).reshape(n * m, t, v, -1)
        for blk, (stride, residual, c_out) in zip(weights, self.static):
            nm, t_cur, _, c_in = h.shape
            flat = h.reshape(nm, t_cur, v * c_in)
            qa, a_scale = _quantize_rows(flat)
            acc = jax.lax.dot_general(
                qa,
                blk["wf_q"],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            z = (
                acc.astype(jnp.float32)
                * a_scale[:, :, None]
                * blk["wf_scale"]
                + blk["bf"]
            )
            z = jnp.maximum(z, 0.0).reshape(nm, t_cur, v, c_out)
            z = jax.lax.conv_general_dilated(
                z.astype(self.dtype),
                blk["ck"],
                window_strides=(stride, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ) + blk["cb"]
            if not residual:
                res = 0.0
            elif blk["res"] is None:
                res = h
            else:
                rk, rb = blk["res"]
                res = (
                    jnp.einsum(
                        "ntvc,cd->ntvd",
                        h[:, ::stride].astype(self.dtype), rk,
                        preferred_element_type=jnp.float32,
                    )
                    + rb
                )
            h = jnp.maximum(z + res, 0.0)

        pooled = jnp.mean(h, axis=(1, 2)).reshape(n, m, -1).mean(axis=1)
        return pooled @ head[0] + head[1]


def int8_stgcn_predictor(
    params, batch_stats, jit: bool = True, mesh=None, axis: str = "data"
):
    pred = Int8STGCNPredictor(params, batch_stats)
    if not jit and mesh is None:
        return pred.__call__
    return _jit_predictor(pred, mesh=mesh, axis=axis)
