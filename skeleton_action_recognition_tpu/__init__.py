"""TPU-native skeleton action recognition framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``itskalvik/skeleton-action-recognition`` (reference mounted at
``/root/reference``):

* ``graphs``   — skeleton graph adjacency construction (NTU RGB+D, Azure
  Kinect), spatial / GIN labelings.
* ``data``     — NTU ``.skeleton`` parsing, pre-normalization, bone/motion
  stream derivation, TFRecord IO implemented from scratch (no TensorFlow),
  and a sharded host→device input pipeline.
* ``ops``      — the kernel library: graph convolutions as MXU einsums,
  STFT-as-matmul, linear-operator resampling, the fused VirtualRadar
  micro-Doppler op, and Pallas TPU kernels for the hot paths.
* ``models``   — flax.linen model zoo: STGCN, STGIN, STPGCN, STPGCNP,
  ResNet-18, the VirtualRadar spectrogram classifier, plus the
  experimental zoo (GPool/SGCN/SGTACN, temporal LSTM sampler).
* ``parallel`` — device-mesh construction and shardings (data parallel via
  ``jax.sharding`` + XLA collectives over ICI).
* ``train``    — jitted/pjit train steps, optimizers and schedules
  (piecewise SGD-nesterov, cyclic Adam, adjacency-freeze masks), metrics,
  Orbax checkpointing *with resume*, TensorBoard event writing from
  scratch.
* ``cli``      — ``main_gnn`` / ``main_spectrogram`` equivalents with the
  reference's flag surface.

Unlike the reference (a TF2/Keras GNN stack plus a PyTorch CNN stack that
only share numpy artifacts), everything here is one JAX program compiled by
XLA for TPU; data parallelism is a sharding annotation, not a strategy
object.
"""

__version__ = "0.1.0"

from skeleton_action_recognition_tpu import graphs  # noqa: F401
