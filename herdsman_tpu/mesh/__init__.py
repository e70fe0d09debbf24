from herdsman_tpu.mesh.sharding import (  # noqa: F401
    make_mesh,
    shard_server_key,
    bootstrap_bool_sharded,
    gate_step_sharded,
    pbs_batch_sharded,
    pbs_many_batch_sharded,
)
from herdsman_tpu.mesh.distributed import (  # noqa: F401
    init_multihost,
    make_pod_mesh,
)
