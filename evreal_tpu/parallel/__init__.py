from evreal_tpu.parallel.mesh import make_mesh, batch_sharding, shard_params
