"""User-facing model families: block-matching disparity, visual odometry,
SLAM."""

from steroscopic_hardware_tpu.models.blockmatch import BlockMatcher

__all__ = ["BlockMatcher"]
