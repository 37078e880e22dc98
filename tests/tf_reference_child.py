"""Subprocess worker for tests/test_tf_parity.py's full-model tests.

Runs the ACTUAL reference model code (a patched-as-documented copy of
``/root/reference`` prepared by ``scripts/reference_duel.py``'s
``prepare_reference``) under TF + legacy Keras on CPU:

* loads weights exported from our flax model,
* records eval- and train-mode forward logits,
* runs K steps of the reference trainer's exact update
  (``main_gnn.py:219-239``: summed-CE/global-batch loss, SGD nesterov
  m=0.9 with ``PiecewiseConstantDecay``, adjacency excluded),
* dumps per-step losses, final weights, and final eval logits.

Must run in a subprocess: ``TF_USE_LEGACY_KERAS`` has to be set before
TensorFlow is imported, and the pytest process may already hold a
Keras-3 TF.

Usage: python tf_reference_child.py <ref_dir> <in.npz> <out.npz>
"""

import json
import sys

import numpy as np


def assign_model_weights(model, w):
    """Copy the flat exported weight dict into the built Keras model."""

    def set_bn(bn, prefix):
        bn.gamma.assign(w[prefix + "/scale"])
        bn.beta.assign(w[prefix + "/bias"])
        bn.moving_mean.assign(w[prefix + "/mean"])
        bn.moving_variance.assign(w[prefix + "/var"])

    set_bn(model.data_bn, "data_bn")
    for i, layer in enumerate(model.STGCN_layers):
        p = f"block_{i}"
        # sgcn: 1x1 conv with K*C filters; our Dense kernel (Cin, K*C)
        # == the conv kernel's [0, 0] slice (k-major blocks both sides)
        layer.sgcn.conv.kernel.assign(w[f"{p}/sgcn/kernel"][None, None])
        layer.sgcn.conv.bias.assign(w[f"{p}/sgcn/bias"])
        bn1, _act, conv, bn2 = layer.tgcn.layers
        set_bn(bn1, f"{p}/tgcn/bn1")
        conv.kernel.assign(w[f"{p}/tgcn/kernel"])  # (9,1,Cin,Cout) HWIO
        conv.bias.assign(w[f"{p}/tgcn/bias"])
        set_bn(bn2, f"{p}/tgcn/bn2")
        if hasattr(layer.residual, "layers"):  # Sequential: conv + BN
            rconv, rbn = layer.residual.layers
            rconv.kernel.assign(w[f"{p}/res/kernel"])
            rconv.bias.assign(w[f"{p}/res/bias"])
            set_bn(rbn, f"{p}/res/bn")
    # logits: 1x1 conv == our Dense (C, num_classes)
    model.logits.kernel.assign(w["logits/kernel"][None, None])
    model.logits.bias.assign(w["logits/bias"])


def export_model_weights(model):
    out = {}

    def get_bn(bn, prefix):
        out[prefix + "/scale"] = bn.gamma.numpy()
        out[prefix + "/bias"] = bn.beta.numpy()
        out[prefix + "/mean"] = bn.moving_mean.numpy()
        out[prefix + "/var"] = bn.moving_variance.numpy()

    get_bn(model.data_bn, "data_bn")
    for i, layer in enumerate(model.STGCN_layers):
        p = f"block_{i}"
        out[f"{p}/sgcn/kernel"] = layer.sgcn.conv.kernel.numpy()[0, 0]
        out[f"{p}/sgcn/bias"] = layer.sgcn.conv.bias.numpy()
        bn1, _act, conv, bn2 = layer.tgcn.layers
        get_bn(bn1, f"{p}/tgcn/bn1")
        out[f"{p}/tgcn/kernel"] = conv.kernel.numpy()
        out[f"{p}/tgcn/bias"] = conv.bias.numpy()
        get_bn(bn2, f"{p}/tgcn/bn2")
        if hasattr(layer.residual, "layers"):
            rconv, rbn = layer.residual.layers
            out[f"{p}/res/kernel"] = rconv.kernel.numpy()
            out[f"{p}/res/bias"] = rconv.bias.numpy()
            get_bn(rbn, f"{p}/res/bn")
    out["logits/kernel"] = model.logits.kernel.numpy()[0, 0]
    out["logits/bias"] = model.logits.bias.numpy()
    return out


def main():
    ref_dir, in_path, out_path = sys.argv[1:4]
    sys.path.insert(0, ref_dir)

    import tensorflow as tf

    data = np.load(in_path)
    cfg = json.loads(str(data["config"]))
    weights = {
        k[2:]: data[k] for k in data.files if k.startswith("w:")
    }

    from models.stgcn import Model

    model = Model(num_classes=int(cfg["num_classes"]))
    x_eval = tf.constant(data["x_eval"])
    model(x_eval, training=False)  # build all layers (incl. residuals)
    model.A.assign(data["adjacency"])
    assign_model_weights(model, weights)

    out = {
        "logits_eval_init": model(x_eval, training=False).numpy(),
    }

    lr = tf.keras.optimizers.schedules.PiecewiseConstantDecay(
        [int(b) for b in cfg["boundaries"]],
        [
            float(cfg["base_lr"]) * 0.1**i
            for i in range(len(cfg["boundaries"]) + 1)
        ],
    )
    optimizer = tf.keras.optimizers.SGD(
        learning_rate=lr, momentum=0.9, nesterov=True
    )
    gbs = float(cfg["global_batch_size"])

    losses = []
    for k in range(int(cfg["num_steps"])):
        xb = tf.constant(data[f"x:{k}"])
        yb = tf.constant(data[f"y:{k}"])
        with tf.GradientTape() as tape:
            logits = model(xb, training=True)
            ce = tf.nn.softmax_cross_entropy_with_logits(
                logits=logits, labels=yb
            )
            loss = tf.reduce_sum(ce) * (1.0 / gbs)
        tvars = [
            v for v in model.trainable_variables
            if "adjacency_matrix" not in v.name
        ]
        grads = tape.gradient(loss, tvars)
        optimizer.apply_gradients(zip(grads, tvars))
        losses.append(float(loss))

    out["losses"] = np.asarray(losses, np.float64)
    out["logits_eval_final"] = model(x_eval, training=False).numpy()
    for k, v in export_model_weights(model).items():
        out["w:" + k] = v
    np.savez(out_path, **out)


if __name__ == "__main__":
    main()
