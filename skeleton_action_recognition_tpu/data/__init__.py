"""Data layer: NTU parsing, normalization, streams, TFRecord IO, pipeline."""

from skeleton_action_recognition_tpu.data.skeleton import (
    TRAINING_CAMERAS,
    TRAINING_SUBJECTS,
    parse_skeleton_file,
    read_xyz,
    sample_metadata,
)
from skeleton_action_recognition_tpu.data.preprocess import (
    pre_normalize,
    pre_normalize_np,
)
from skeleton_action_recognition_tpu.data.streams import (
    bone_stream,
    motion_stream,
)
from skeleton_action_recognition_tpu.data.tfrecord import (
    TFRecordReader,
    TFRecordWriter,
    parse_example,
    serialize_example,
)

__all__ = [
    "TFRecordReader",
    "TFRecordWriter",
    "TRAINING_CAMERAS",
    "TRAINING_SUBJECTS",
    "bone_stream",
    "motion_stream",
    "parse_example",
    "parse_skeleton_file",
    "pre_normalize",
    "pre_normalize_np",
    "read_xyz",
    "sample_metadata",
    "serialize_example",
]
