"""Distribution layers: single-process multi-device sharding
(:mod:`.mesh`) and the multi-process multi-host runtime
(:mod:`.multihost`)."""

from .mesh import make_mesh, ShardedCascade, sharded_search
from . import multihost

__all__ = ["make_mesh", "ShardedCascade", "sharded_search", "multihost"]
