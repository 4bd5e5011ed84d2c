from tweediemix_tpu.parallel.mesh import (
    concept_sharded_unet_fn,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "concept_sharded_unet_fn"]
