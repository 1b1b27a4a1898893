from robot_manipulation_vq_vae_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    shard_params,
    shard_state,
)
