from fedrann_tpu.parallel.mesh import make_mesh, shard_rows  # noqa: F401
