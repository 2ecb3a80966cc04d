"""Streaming runtime: frame sources, in-memory frame bus, camera manager,
disparity pipeline, HTTP serving, TCP ingest.

Replaces the reference's L4/L5 tiers (``pkg/camera``, ``cmd/``) with one
important architectural fix: the reference exchanged live frames through
PNG files in the user's home directory (``pkg/homedir``, SURVEY.md section
1 "quirk"); here frames move through an in-memory bus with sequence
numbers, and the serving layer reads the bus directly.
"""

from steroscopic_hardware_tpu.runtime.bus import FrameBus, Frame
from steroscopic_hardware_tpu.runtime.manager import CameraManager
from steroscopic_hardware_tpu.runtime.sources import (
    StaticSource,
    SyntheticSource,
    TcpSource,
)

__all__ = [
    "FrameBus",
    "Frame",
    "CameraManager",
    "StaticSource",
    "SyntheticSource",
    "TcpSource",
]
