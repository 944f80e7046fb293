from hevctpu.parallel.sharded import ShardedEncoder, make_mesh  # noqa: F401
