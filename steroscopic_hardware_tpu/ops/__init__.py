"""Compute kernels: grayscale conversion, SAD disparity (golden / XLA /
Pallas), left-right consistency, features and matching."""

from steroscopic_hardware_tpu.ops.gray import to_grayscale
from steroscopic_hardware_tpu.ops.sad_xla import disparity_xla
from steroscopic_hardware_tpu.ops.sad_golden import (
    disparity_golden,
    sad_window_golden,
)

__all__ = [
    "to_grayscale",
    "disparity_xla",
    "disparity_golden",
    "sad_window_golden",
]
