"""Scale-out layer: batch data-parallelism over a 1-D device mesh
(``mesh``) and single-frame spatial sharding with halo exchange
(``spatial``)."""

from terran_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    global_batch_from_local,
    initialize_multi_host,
    local_results,
    pad_batch_to_multiple,
    replicated_sharding,
    shard_batch,
    shard_params,
)
from terran_tpu.parallel.spatial import (  # noqa: F401
    SpatialShardedDetector,
    make_spatial_detect_fn,
    slab_layout,
)
