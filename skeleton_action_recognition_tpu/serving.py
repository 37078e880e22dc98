"""Serving: compiled predictors for production inference.

The reference has no inference/serving path at all beyond the eval loop
inside training (``test_step``, ``main_gnn.py:205-208``). This module
packages a checkpointed model as a compiled predictor:

* one jitted XLA program per (model, batch-shape), optionally bf16;
* data-parallel batch sharding over a mesh for multi-chip serving;
* partial-batch padding so a single compiled shape serves any request
  size up to ``max_batch``.

For the stock ST-GCN, :mod:`.models.export` additionally provides a
folded-constant predictor (BatchNorms and the adjacency stack fused into
the matmuls) — pass ``fused=True`` to use it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Predictor:
    """Compiled softmax predictor over a fixed max batch shape."""

    def __init__(
        self,
        model,
        params,
        batch_stats,
        max_batch: int = 64,
        mesh=None,
        axis: str = "data",
        fused: bool = False,
        quantize: str | None = None,
    ):
        self.model = model
        self.max_batch = max_batch
        if mesh is not None:
            n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
            if max_batch % n:
                raise ValueError(
                    f"max_batch {max_batch} must divide the mesh's "
                    f"{n} devices"
                )
        variables = {"params": params, "batch_stats": batch_stats}

        if quantize is not None and not fused:
            raise ValueError("quantize requires fused=True")
        if fused:
            from skeleton_action_recognition_tpu.models import export

            # already jitted with the ~700 MB folded-weight pytree passed
            # as arguments — re-jitting here would inline it as program
            # constants and blow the compiler's input limits. With a mesh
            # the folded weights are replicated and the batch sharded over
            # ``axis`` (max_batch padding keeps the shape divisible).
            factory = {
                None: export.fused_stgcn_predictor,
                "w8": export.quantized_stgcn_predictor,
                "w8a8": export.int8_stgcn_predictor,
            }.get(quantize, None)
            if factory is None:
                raise ValueError(
                    f"quantize must be None, 'w8' (int8 weights) or "
                    f"'w8a8' (int8 weights+activations), got {quantize!r}"
                )
            kwargs = {} if quantize else {"dtype": jnp.bfloat16}
            fwd = factory(
                params, batch_stats, jit=True, mesh=mesh, axis=axis,
                **kwargs,
            )

            def forward(x):
                return jax.nn.softmax(fwd(x), axis=-1)

            self._fn = forward
            return

        def forward(x):
            logits = model.apply(variables, x, train=False)
            return jax.nn.softmax(logits, axis=-1)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._fn = jax.jit(
                forward,
                in_shardings=NamedSharding(mesh, P(axis)),
                out_shardings=NamedSharding(mesh, P(axis)),
            )
        else:
            self._fn = jax.jit(forward)

    @classmethod
    def from_checkpoint(
        cls,
        model,
        checkpoint_dir: str,
        sample_input,
        max_batch: int = 64,
        mesh=None,
    ) -> "Predictor":
        import optax

        from skeleton_action_recognition_tpu.train import (
            checkpoint as ckpt_lib,
            create_train_state,
        )

        state = create_train_state(
            model, jax.random.key(0), jnp.asarray(sample_input),
            optax.sgd(0.1),
        )
        manager = ckpt_lib.CheckpointManager(checkpoint_dir)
        params, batch_stats, step = manager.restore_for_eval(
            jax.device_get(state.params),
            jax.device_get(state.batch_stats),
        )
        manager.close()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint in {checkpoint_dir}"
            )
        return cls(
            model, params, batch_stats, max_batch=max_batch, mesh=mesh
        )

    def __call__(self, x) -> np.ndarray:
        """Predict class probabilities for ``(n, ...)`` with
        ``n <= max_batch`` (padded internally to one compiled shape)."""
        x = np.asarray(x, np.float32)
        n = len(x)
        if n > self.max_batch:
            raise ValueError(
                f"batch {n} exceeds max_batch {self.max_batch}"
            )
        if n < self.max_batch:
            x = np.concatenate(
                [x, np.zeros((self.max_batch - n,) + x.shape[1:],
                             np.float32)]
            )
        return np.asarray(self._fn(jnp.asarray(x)))[:n]
