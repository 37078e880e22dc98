"""Loss functions.

The GNN trainer's loss is softmax cross-entropy against one-hot labels,
summed over the batch and scaled by ``1 / global_batch_size``
(``main_gnn.py:222-226``) so that data-parallel gradient averaging is a
plain ``psum``.

Note on regularization: the reference *declares* L2(1e-4) on every conv
kernel (``models/gcn.py:4``) but its custom training loop never adds
``model.losses`` to the objective (``main_gnn.py:221-226``), so the penalty
is dead code there. :func:`total_loss` exposes it behind ``l2_weight``
(default 0.0 = reference behavior as committed; pass 1e-4 for what the
model definitions intended).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from skeleton_action_recognition_tpu.models.layers import l2_regularization


def softmax_cross_entropy(logits, labels_onehot):
    """Per-sample CE, numerically stable log-softmax formulation."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(labels_onehot * log_probs, axis=-1)


def total_loss(logits, labels_onehot, params, global_batch_size, l2_weight=0.0):
    """Summed CE / global batch (+ optional L2 over kernels)."""
    ce = jnp.sum(softmax_cross_entropy(logits, labels_onehot)) * (
        1.0 / global_batch_size
    )
    if l2_weight:
        ce = ce + l2_regularization(params, l2_weight)
    return ce
