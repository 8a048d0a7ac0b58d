from vlsat_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_eval_batches,
    shard_stacked_batch,
    replicate,
)
