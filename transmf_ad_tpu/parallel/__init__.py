"""Mesh construction + sharding rules (data/tensor parallelism over ICI)
and the multi-host runtime (DCN-aware meshes, per-process placement)."""

from .distributed import (  # noqa: F401
    NullLogger,
    fetch_global,
    init_distributed,
    is_primary,
    make_hybrid_mesh,
    place_global,
    process_count,
    put_replicated,
)
from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_state,
)
