"""Utilities: parameter validation, timing, metrics, logging."""

from steroscopic_hardware_tpu.utils.params import Parameters, validate_params

__all__ = ["Parameters", "validate_params"]
