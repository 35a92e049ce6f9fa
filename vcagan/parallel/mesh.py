"""Device mesh and sharding layout.

The reference's entire parallelism story is single-host
``torch.nn.DataParallel`` (reference: train.py:112-119) — replicate, scatter
the batch, gather outputs.  The TPU-native design instead declares a 2-D
``(data, model)`` mesh and annotates shardings; XLA GSPMD inserts the
collectives (gradient psums over ICI for the data axis, all-gathers /
reduce-scatters for the model axis).

- ``data`` axis: batch dimension of every input; gradients are reduced
  across it automatically because params are replicated along it.
- ``model`` axis (optional, off by default): shards the widest projection
  matrices — the GRU input/hidden projections (512x1536 per direction) and
  the attention/postnet dense kernels — along their output column.  The
  model is small enough that pure DP is optimal on real hardware; the axis
  exists so the same train step scales past HBM if the model family grows,
  and to keep the multi-chip path honest (tp + dp both exercised in tests
  and the dry-run).

Pipeline/sequence/expert parallelism are deliberately N/A for this model
family (SURVEY.md §2.6): sequences are <= 160 frames and layers are <= 1M
params, so PP/SP/EP would only add latency.  Sequence handling is windowing
+ masking (see vcagan.kernels.masked_attention), not ring attention.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    model_parallel: int = 1, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over the data axis, replicated over model."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every array in a batch pytree with the batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


# Parameters sharded along the model axis when model_parallel > 1:
# (path-substring, axis to shard).  Only the attention projections are
# column-sharded: their outputs are consumed head-dim-contracted (q) or
# elementwise (mel residual), so GSPMD lowers them to one psum/all-gather
# each.  The GRU's fused (in, 3H) projections are deliberately NOT sharded:
# the per-gate jnp.split in the scan body cuts across a 3H shard boundary,
# which forced involuntary full rematerialization in round 1's dryrun — and
# a 512-wide sequential recurrence has no TP win to offer anyway (see the
# tp=1 vs tp=2 measurement in tools/bench_tp.py).
_MODEL_SHARDED = (
    ("att1/q", "kernel", 1),
    ("att2/q", "kernel", 1),
    ("att1/mel", "kernel", 1),
    ("att2/mel", "kernel", 1),
)


def _param_spec(path: str, leaf: jax.Array, model_parallel: int) -> P:
    if model_parallel > 1 and leaf.ndim == 2:
        for scope, name, axis in _MODEL_SHARDED:
            if scope in path and path.endswith(name):
                if leaf.shape[axis] % model_parallel == 0:
                    spec = [None, None]
                    spec[axis] = "model"
                    return P(*spec)
    return P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", None)
        parts.append(str(key if key is not None else p))
    return "/".join(parts)


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """Sharding pytree for a GANTrainState (params model-sharded per the
    table above, everything else replicated)."""
    model_parallel = mesh.shape["model"]

    def spec_for(path, leaf):
        return NamedSharding(
            mesh, _param_spec(_path_str(path), leaf, model_parallel)
        )

    return jax.tree_util.tree_map_with_path(spec_for, state)


def shard_state(state: Any, mesh: Mesh) -> Any:
    shardings = state_shardings(state, mesh)
    return jax.tree.map(jax.device_put, state, shardings)
