from intrepppid_tpu.parallel.mesh import (
    batch_sharding,
    broadcast_from_primary_int,
    broadcast_from_primary_str,
    initialize_distributed,
    put_global_batch,
    make_mesh,
    pad_batch_to_multiple,
    pad_batch_to_size,
    replicated_sharding,
    shard_batch,
    stacked_batch_sharding,
)

__all__ = [
    "broadcast_from_primary_int",
    "broadcast_from_primary_str",
    "initialize_distributed",
    "put_global_batch",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "stacked_batch_sharding",
    "pad_batch_to_multiple",
    "pad_batch_to_size",
]
