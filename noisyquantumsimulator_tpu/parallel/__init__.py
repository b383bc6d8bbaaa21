from .mesh import make_mesh, shard_leading, replicated  # noqa: F401
from . import bb_mc  # noqa: F401
from .bb_mc import run_bb_memory_sharded  # noqa: F401
