"""Config plumbing: YAML dump, run naming, dotted-path model import.

Reproduces the reference's conventions:

* the full argparse namespace is dumped as ``config.yaml`` into the log dir
  (``main_gnn.py:137-143``, ``utils.py:191-196``);
* the run's log-dir name is the hyperparameter dict string-mangled with
  spaces/quotes removed and commas as dashes (``main_gnn.py:263-280``,
  ``main_spectrogram.py:70-86``);
* models are selected by dotted import path (``import_class``,
  ``main_gnn.py:129-134``).
"""

from __future__ import annotations

import importlib
import os
from typing import Iterable


def import_class(name: str):
    """Resolve ``pkg.module.Attr`` (or ``pkg.module``) to an object."""
    parts = name.split(".")
    for split in range(len(parts), 0, -1):
        try:
            mod = importlib.import_module(".".join(parts[:split]))
        except ImportError:
            continue
        obj = mod
        for attr in parts[split:]:
            obj = getattr(obj, attr)
        return obj
    raise ImportError(f"cannot import {name!r}")


def run_name_from_args(
    args_dict: dict,
    exclude: Iterable[str] = (),
    notes: str = "",
) -> str:
    """Reference-style run-name mangling of the hyperparameter dict."""
    params = {
        k: v for k, v in args_dict.items() if k not in set(exclude)
    }
    name = (
        str(params)
        .replace(" ", "")
        .replace("'", "")
        .replace(",", "-")[1:-1]
    )
    if notes:
        name += "-" + notes
    # Strip glob metacharacters: tensorstore/orbax glob for OCDBT
    # per-process subdirs during checkpoint finalization, and a '[10-50]'
    # (from the reference-style --steps list mangling) in the path makes
    # that glob match nothing — the merge is silently skipped and the
    # checkpoint is unreadable. Measured, not hypothetical.
    for ch in "[]*?":
        name = name.replace(ch, "")
    return name


def save_arg(args_dict: dict, log_dir: str) -> str:
    """Dump the config dict as ``config.yaml`` in the log dir."""
    import yaml

    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, "config.yaml")
    with open(path, "w") as f:
        yaml.dump(args_dict, f)
    return path


def snapshot_sources(log_dir: str, objects) -> None:
    """Copy the defining source file of each object into the log dir
    (the reference's reproducibility snapshot, ``main_gnn.py:284``)."""
    import inspect
    import shutil

    os.makedirs(log_dir, exist_ok=True)
    for obj in objects:
        try:
            src = inspect.getfile(obj)
        except TypeError:
            continue
        shutil.copy2(src, log_dir)
