"""custom_partitioning wiring for the attention kernel on the CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vcagan.kernels.masked_attention import (
    _attention_pallas,
    _attention_xla,
    make_spmd_kernel,
)
from vcagan.parallel import make_mesh


def test_sharded_kernel_matches_unsharded():
    """8-way batch-sharded execution through the custom_partitioning path
    (interpret-mode kernel per shard) equals the XLA oracle."""
    kernel = make_spmd_kernel(
        functools.partial(_attention_pallas, interpret=True)
    )
    mesh = make_mesh(model_parallel=1)

    b, t, s, d = 16, 12, 8, 64
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, t, d))
    k = jax.random.normal(kk, (b, s, d))
    v = jax.random.normal(kv, (b, s, d))
    lengths = jnp.asarray((np.arange(b) % s) + 1, jnp.int32)

    batch_sh = NamedSharding(mesh, P("data"))
    qs = jax.device_put(q, NamedSharding(mesh, P("data", None, None)))
    ks = jax.device_put(k, NamedSharding(mesh, P("data", None, None)))
    vs = jax.device_put(v, NamedSharding(mesh, P("data", None, None)))
    ls = jax.device_put(lengths, batch_sh)

    out = jax.jit(kernel)(qs, ks, vs, ls)
    # result keeps the batch sharding (no forced replication)
    assert len(out.sharding.device_set) == 8

    ref = _attention_xla(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
