"""Multi-device execution: meshes, sharded IWE accumulation, fleet solves.

The reference is strictly single-process/single-device (SURVEY §2.10);
this layer is new capability designed for TPU pods:

* data axis — frames/event-windows are embarrassingly parallel when warm
  start is off (the eval loop's frame chain), so they shard over "data",
* event axis — bilinear voting is an associative scatter-sum, so a single
  frame's events shard over "event" and partial IWEs combine with psum
  (the sequence-parallelism analog for event streams).
"""

from .sharded import (
    build_fleet_step,
    make_mesh,
    sharded_iwe,
    sharded_multifocal_loss,
)

__all__ = ["make_mesh", "sharded_iwe", "sharded_multifocal_loss", "build_fleet_step"]
