from rave_tpu.parallel.mesh import data_mesh, replicate, shard_batch

__all__ = ["data_mesh", "shard_batch", "replicate"]
