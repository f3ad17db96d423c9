from clair3_tpu.parallel.mesh import get_mesh, shard_batch, pad_to_multiple  # noqa: F401
