from qpnet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated_sharding, shard_batch,
)
from qpnet_tpu.parallel.distributed import (  # noqa: F401
    global_min_and_any, global_min_scalar, host_shard_list,
    initialize_multihost,
    make_global_batch,
)
