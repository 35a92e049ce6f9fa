from vcagan.parallel import dryrun
from vcagan.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_state,
    state_shardings,
)

__all__ = [
    "batch_sharding",
    "dryrun",
    "make_mesh",
    "replicated",
    "shard_batch",
    "shard_state",
    "state_shardings",
]
