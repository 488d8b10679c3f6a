from .mesh import (LOGICAL_RULES, batch_sharding, make_mesh, param_shardings,
                   put_batch_fn, shard_params, single_device_mesh)
