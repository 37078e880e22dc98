"""flax.linen model zoo.

Parity targets (reference files in parentheses):

* :mod:`.stgcn`        — 10-block ST-GCN (``models/stgcn.py``)
* :mod:`.stgin`        — ST-GIN variant (``models/stgin.py``)
* :mod:`.stpgcn`       — ST-GCN + projection graph conv (``models/stpgcn.py``)
* :mod:`.stpgcnp`      — projection-pooling pyramid (``models/stpgcnp.py``)
* :mod:`.resnet18`     — 1-channel width-parameterized ResNet-18
  (``models/resnet18.py``)
* :mod:`.spectrogram`  — VirtualRadar + ResNet-18 classifier
  (``models/resnet.py`` + ``layers/virtual_radar.py``)
* :mod:`.lstm_sampler` — LSTM temporal frame sampler (``models/lstm_sampler.py``)
* :mod:`.experimental` — GPool / SGCN / SGTACN debug zoo
  (``models/stgcn_debug.py``)

The reference's stale ``from model.gcn import ...`` imports
(``stgcn.py:2`` etc. — broken as committed) are deliberately not
reproduced.

Each model module exposes a ``Model`` class so the CLI's dotted-path model
selection (``main_gnn.py:129-134,261``) works identically here.
"""

from skeleton_action_recognition_tpu.models import (  # noqa: F401
    gcn,
    resnet18,
    spectrogram,
    stgcn,
    stgin,
    stpgcn,
    stpgcnp,
)

__all__ = [
    "gcn",
    "resnet18",
    "spectrogram",
    "stgcn",
    "stgin",
    "stpgcn",
    "stpgcnp",
]
