"""Compute kernels: grayscale conversion, SAD disparity (golden / XLA /
Pallas), left-right consistency, features and matching."""

from steroscopic_hardware_tpu.ops.gray import to_grayscale
from steroscopic_hardware_tpu.ops.sad_xla import (
    disparity_raw_xla,
    disparity_xla,
)
from steroscopic_hardware_tpu.ops.sad_golden import (
    disparity_golden,
    sad_window_golden,
)
from steroscopic_hardware_tpu.ops.lr_check import disparity_lr_checked
from steroscopic_hardware_tpu.ops.sad_pallas import (
    disparity_pallas,
    disparity_pallas_batch,
)
from steroscopic_hardware_tpu.ops.sgm import sgm_disparity
from steroscopic_hardware_tpu.ops.census import census5x5
from steroscopic_hardware_tpu.ops.features import (
    detect_and_describe,
    fast_detect,
    orb_describe,
)
from steroscopic_hardware_tpu.ops.matching import match

__all__ = [
    "to_grayscale",
    "disparity_xla",
    "disparity_raw_xla",
    "disparity_golden",
    "sad_window_golden",
    "disparity_lr_checked",
    "disparity_pallas",
    "disparity_pallas_batch",
    "sgm_disparity",
    "census5x5",
    "detect_and_describe",
    "fast_detect",
    "orb_describe",
    "match",
]
