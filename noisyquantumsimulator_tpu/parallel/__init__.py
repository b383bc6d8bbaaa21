from .mesh import make_mesh, shard_leading, replicated  # noqa: F401
