"""Confusion-matrix rendering to PNG (for TensorBoard image summaries).

Equivalent of ``plot_confusion_matrix`` / ``plot_to_image``
(``main_gnn.py:80-126``) and ``get_confusion_matrix``
(``utils.py:151-188``): row-normalized matrix rendered as a heatmap with
per-cell annotations.
"""

from __future__ import annotations

import io
from typing import Optional, Sequence, Tuple

import numpy as np


def confusion_matrix_png(
    cm: np.ndarray,
    class_names: Optional[Sequence[str]] = None,
    annotate: bool = True,
    figsize: float = 25.0,
) -> Tuple[bytes, int, int]:
    """Render a confusion matrix; returns ``(png_bytes, height, width)``."""
    import matplotlib

    matplotlib.use("Agg")
    import itertools

    import matplotlib.pyplot as plt

    n = cm.shape[0]
    if class_names is None:
        class_names = [str(i) for i in range(n)]

    fig = plt.figure(figsize=(figsize, figsize))
    plt.imshow(cm, interpolation="nearest", cmap=plt.cm.Oranges)
    plt.title("Confusion matrix")
    ticks = np.arange(n)
    plt.xticks(ticks, class_names, rotation=45)
    plt.yticks(ticks, class_names)

    row = cm.sum(axis=1)[:, None]
    norm = np.around(cm.astype(float) / np.maximum(row, 1), decimals=2)
    if annotate:
        threshold = norm.max() / 2.0
        for i, j in itertools.product(range(n), range(n)):
            color = "white" if norm[i, j] > threshold else "black"
            plt.text(
                j, i, norm[i, j], horizontalalignment="center", color=color
            )

    plt.tight_layout()
    plt.ylabel("True label")
    plt.xlabel("Predicted label")

    buf = io.BytesIO()
    plt.savefig(buf, format="png")
    plt.close(fig)
    buf.seek(0)
    png = buf.read()

    width, height = fig.canvas.get_width_height()
    return png, height, width
