"""Device-mesh parallelism: spatially sharded disparity with halo exchange,
distributed bundle adjustment collectives."""

from steroscopic_hardware_tpu.parallel.mesh import make_mesh
from steroscopic_hardware_tpu.parallel.disparity_shard import (
    disparity_sharded,
)

__all__ = ["make_mesh", "disparity_sharded"]
