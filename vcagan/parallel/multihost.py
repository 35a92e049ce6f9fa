"""Multi-host (DCN) initialization and per-host input sharding.

The reference has no multi-node story at all (single-process DataParallel,
SURVEY.md §2.6).  This module is the TPU-native scale-out path:

- ``initialize_distributed`` wires ``jax.distributed`` from env vars
  (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID) or explicit args; the
  global mesh then spans all hosts, with ICI inside each slice and DCN
  between them, and XLA routes collectives accordingly.
- ``local_batch_slice`` maps a per-host loader onto the global batch: each
  process feeds only its addressable shard, and
  ``jax.make_array_from_process_local_data`` assembles the global array.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process; no-op (returns
    False) in single-process runs."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", "0"))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("PROCESS_ID", "-1"))
    )
    if not coordinator_address or num_processes <= 1 or process_id < 0:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def local_batch_slice(global_batch_size: int) -> slice:
    """The half-open [start, stop) of the global batch this process feeds."""
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {n} processes"
        )
    per = global_batch_size // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def globalize(local_array: np.ndarray, sharding) -> jax.Array:
    """Assemble a global device array from this process's local shard."""
    global_shape = (
        local_array.shape[0] * jax.process_count(),
    ) + local_array.shape[1:]
    return jax.make_array_from_process_local_data(
        sharding, local_array, global_shape
    )
