"""Mesh construction + sharding rules (data/tensor parallelism over ICI)."""

from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_state,
)
