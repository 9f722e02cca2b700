from jpdse_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    make_sharded_train_step,
)
