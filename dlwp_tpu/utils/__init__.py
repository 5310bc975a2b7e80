"""Cross-cutting utilities: scaling, serialization, reflection."""

from dlwp_tpu.utils.scaler import StandardScaler, MinMaxScaler, MeanImputer
from dlwp_tpu.utils.serialization import save_model, load_model
from dlwp_tpu.utils.reflection import get_from_module, get_classes, get_methods
from dlwp_tpu.utils.split import train_test_split_ind, delete_nan_samples
from dlwp_tpu.utils.tensorboard import TensorBoardWriter
from dlwp_tpu.utils.compile_safe import compile_forward_safe

__all__ = [
    "TensorBoardWriter",
    "compile_forward_safe",
    "StandardScaler",
    "MinMaxScaler",
    "MeanImputer",
    "save_model",
    "load_model",
    "get_from_module",
    "get_classes",
    "get_methods",
    "train_test_split_ind",
    "delete_nan_samples",
]
