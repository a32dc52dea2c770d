from disvae_tpu.parallel.mesh import (create_mesh, make_sharded_train_step,
                                      replicate, shard_batch)

__all__ = ["create_mesh", "make_sharded_train_step", "replicate",
           "shard_batch"]
