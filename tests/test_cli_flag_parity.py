"""Every reference CLI flag must be accepted, with matching defaults.

Guards the MIGRATION.md contract: a reference user's command lines keep
working here. Flag inventories transcribed from the reference argparse
blocks (``main_gnn.py:25-77``, ``main_spectrogram.py:13-62``).
"""

import argparse

from skeleton_action_recognition_tpu.cli import main_gnn, main_spectrogram

# (flag, reference default) — None default means required / no default.
REFERENCE_GNN_FLAGS = {
    "--model": None,                 # required in both
    "--base-lr": 1e-1,
    "--num-classes": 60,
    "--batch-size": 64,
    "--num-epochs": 80,
    "--save-freq": 10,
    "--freeze-graph-until": 80,
    "--log-dir": "logs/",
    "--train-data-path": None,       # path default differs by layout
    "--test-data-path": None,
    "--notes": "",
    "--steps": [10, 50],
}

REFERENCE_SPECTROGRAM_FLAGS = {
    "--base-lr": 1e-1,
    "--num-classes": 60,
    "--batch-size": 64,
    "--num-epochs": 80,
    "--num-filters": 64,
    "--log-dir": "logs/",
    "--data-path": None,
    "--label-path": None,
    "--notes": "",
    "--model-type": "resnet",
    "--lr_cycle": 10,
    "--lambda-train-epoch": 1000,
    "--loc-train-epoch": 1000,
}


def _actions_by_flag(parser: argparse.ArgumentParser):
    out = {}
    for action in parser._actions:
        for opt in action.option_strings:
            out[opt] = action
    return out


def _check(parser, flags):
    actions = _actions_by_flag(parser)
    missing = [f for f in flags if f not in actions]
    assert not missing, f"reference flags not accepted: {missing}"
    wrong = {
        f: (actions[f].default, want)
        for f, want in flags.items()
        if want is not None and actions[f].default != want
    }
    assert not wrong, f"defaults diverge from the reference: {wrong}"


def test_main_gnn_accepts_every_reference_flag():
    _check(main_gnn.get_parser(), REFERENCE_GNN_FLAGS)


def test_main_spectrogram_accepts_every_reference_flag():
    _check(main_spectrogram.get_parser(), REFERENCE_SPECTROGRAM_FLAGS)


def test_reference_command_lines_parse():
    """The reference README-style invocations parse unchanged."""
    gnn = main_gnn.get_parser().parse_args(
        ["--model", "stgcn", "--base-lr", "0.1", "--batch-size", "64",
         "--num-epochs", "80", "--steps", "10", "50",
         "--freeze-graph-until", "80", "--notes", "repro"]
    )
    assert gnn.model == "stgcn" and gnn.steps == [10, 50]
    spec = main_spectrogram.get_parser().parse_args(
        ["--model-type", "resnet", "--num-filters", "64",
         "--lambda-train-epoch", "5", "--loc-train-epoch", "1000",
         "--lr_cycle", "10"]
    )
    assert spec.model_type == "resnet" and spec.lambda_train_epoch == 5


def test_precision_flag_parses_and_names_runs_stably():
    """--precision default must not change run names (resume compat for
    runs created before the flag existed); non-default must name the
    run so arms of a numerics A/B land in distinct dirs."""
    base = ["--model", "stgcn", "--notes", "p"]
    d = main_gnn.get_parser().parse_args(base)
    h = main_gnn.get_parser().parse_args(base + ["--precision", "highest"])
    assert d.precision == "default" and h.precision == "highest"
    assert "precision" not in main_gnn.build_log_dir(d)
    assert "precision:highest" in main_gnn.build_log_dir(h)
