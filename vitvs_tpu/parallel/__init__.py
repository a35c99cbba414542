from vitvs_tpu.parallel.mesh import (
    make_mesh,
    shard_vit_params,
    replicate,
    batch_servo_step,
    sharded_batch_rollout,
)

__all__ = [
    "make_mesh",
    "shard_vit_params",
    "replicate",
    "batch_servo_step",
    "sharded_batch_rollout",
]
