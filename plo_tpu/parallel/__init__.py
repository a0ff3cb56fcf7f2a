"""Multi-chip scale-out: mesh construction, sharded matching, collective
solve reductions, windowed BA (SURVEY.md §2.3 — new first-class components
with no reference counterpart)."""
from plo_tpu.parallel.sharding import (  # noqa: F401
    get_mesh, shard_cloud, replicate, make_sharded_icp_step)
from plo_tpu.parallel.odometry import ShardedMapOdometry  # noqa: F401
