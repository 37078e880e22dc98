"""Alias module for CLI parity.

The reference's ``--model-type resnet`` (the default,
``main_spectrogram.py:47-49``) dotted-imports ``models.resnet.Model`` —
the VirtualRadar + ResNet-18 spectrogram classifier. Same mapping here.
"""

from skeleton_action_recognition_tpu.models.spectrogram import (  # noqa: F401
    Model,
)
