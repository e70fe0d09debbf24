from herdsman_tpu.mesh.sharding import (  # noqa: F401
    make_mesh,
    shard_server_key,
    bootstrap_bool_sharded,
    gate_step_sharded,
)
