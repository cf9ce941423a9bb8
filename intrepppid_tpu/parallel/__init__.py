from intrepppid_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_batch_to_multiple,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "pad_batch_to_multiple",
]
