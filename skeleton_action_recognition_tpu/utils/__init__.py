"""Runtime utilities: config, observability, TensorBoard event writing."""

from skeleton_action_recognition_tpu.utils.config import (
    import_class,
    run_name_from_args,
    save_arg,
)
from skeleton_action_recognition_tpu.utils.tb_writer import SummaryWriter
from skeleton_action_recognition_tpu.utils.confusion import (
    confusion_matrix_png,
)

__all__ = [
    "SummaryWriter",
    "confusion_matrix_png",
    "import_class",
    "run_name_from_args",
    "save_arg",
]
