from .mesh import (data_sharding, make_mesh, pad_to_devices, replicated,
                   shard_batch)

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "pad_to_devices"]
