"""Fused length-masked cross-attention: softmax(QK^T/sqrt(d) + mask) V.

Pallas TPU kernel for the AVAttention core (reference semantics:
generator.py:158-167, including the per-sample -inf masking of keys past the
clip length at generator.py:162-163).

The problem is small (T <= 640 queries, S <= 160 keys, d = 256) but sits in
the generator's inner loop twice per forward.  Fusing QK^T, the additive
length mask, the row softmax, and the PV matmul into one kernel keeps the
(T, S) score matrix in VMEM — it never touches HBM — and both matmuls hit
the MXU.  Grid is over the batch; each program owns one sample.

An XLA einsum fallback (`_attention_xla`) provides the same math for
non-TPU backends and as a parity oracle in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import; CPU test environments fall back to interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_NEG_INF = -1e30


def _attention_xla(
    q: jax.Array, k: jax.Array, v: jax.Array, lengths: jax.Array
) -> jax.Array:
    """Reference XLA path: (B,T,D), (B,S,D), (B,S,D), (B,) -> (B,T,D)."""
    d = q.shape[-1]
    scores = jnp.einsum("btd,bsd->bts", q, k) / jnp.sqrt(jnp.asarray(d, q.dtype))
    s = k.shape[1]
    key_idx = jnp.arange(s)[None, None, :]
    mask = key_idx < lengths[:, None, None]
    scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bts,bsd->btd", probs, v)


def _attention_kernel(len_ref, q_ref, k_ref, v_ref, o_ref):
    """One batch element: q (T,D), k (S,D), v (S,D) -> o (T,D).

    ``len_ref`` is the scalar-prefetched (B,) lengths array in SMEM.
    """
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    d = q.shape[-1]
    scale = jax.lax.rsqrt(jnp.asarray(d, jnp.float32))

    scores = (
        jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # (T, S)

    length = len_ref[pl.program_id(0)]
    key_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
    scores = jnp.where(key_idx < length, scores, _NEG_INF)

    # Numerically stable row softmax, fully in VMEM.
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)

    o_ref[:] = jnp.dot(
        probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attention_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    lengths: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    if not _HAS_PLTPU:  # pragma: no cover — exotic builds without pltpu
        return _attention_xla(q, k, v, lengths)

    b, t, d = q.shape
    s = k.shape[1]
    lengths = lengths.astype(jnp.int32)
    vmem = pltpu.VMEM if not interpret else pl.ANY

    # Lengths ride as a scalar-prefetch arg: the whole (B,) vector lives in
    # SMEM and the kernel indexes it with program_id — rank-1 VMEM blocking
    # restrictions don't apply to prefetched scalars.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, t, d), lambda i, _: (i, 0, 0), memory_space=vmem),
            pl.BlockSpec((None, s, d), lambda i, _: (i, 0, 0), memory_space=vmem),
            pl.BlockSpec((None, s, d), lambda i, _: (i, 0, 0), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec(
            (None, t, d), lambda i, _: (i, 0, 0), memory_space=vmem
        ),
    )
    return pl.pallas_call(
        _attention_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
        interpret=interpret,
    )(lengths, q, k, v)


# ---- GSPMD partitioning: the kernel is embarrassingly parallel over the
# batch, so under a sharded jit each device runs it on its local batch
# shard instead of XLA replicating an unpartitionable custom call.
def make_spmd_kernel(impl):
    """Wrap a per-shard attention impl in custom_partitioning: the op is
    embarrassingly parallel over batch, so each device runs ``impl`` on its
    local shard; Shardy propagates the batch factor via the einsum rule."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def _batch_axis(sharding):
        spec = sharding.spec
        return spec[0] if len(spec) else None

    wrapped = custom_partitioning(lambda q, k, v, lengths: impl(q, k, v, lengths))

    def _infer_sharding(mesh, arg_infos, result_info):
        return NamedSharding(mesh, P(_batch_axis(arg_infos[0].sharding), None, None))

    def _partition(mesh, arg_infos, result_info):
        batch_axis = _batch_axis(arg_infos[0].sharding)
        arg_shardings = (
            NamedSharding(mesh, P(batch_axis, None, None)),
            NamedSharding(mesh, P(batch_axis, None, None)),
            NamedSharding(mesh, P(batch_axis, None, None)),
            NamedSharding(mesh, P(batch_axis)),
        )
        out_sharding = NamedSharding(mesh, P(batch_axis, None, None))

        def lower_fn(q, k, v, lengths):
            return impl(q, k, v, lengths)

        return mesh, lower_fn, out_sharding, arg_shardings

    wrapped.def_partition(
        infer_sharding_from_operands=_infer_sharding,
        partition=_partition,
        # batch factor shards; t/s/d stay whole within each invocation
        sharding_rule="b t d, b s d, b s d, b -> b t d",
    )
    return wrapped


try:
    _SPMD_KERNEL = make_spmd_kernel(_attention_pallas)
except Exception:  # pragma: no cover — older jax without custom_partitioning
    _SPMD_KERNEL = _attention_pallas


@jax.custom_vjp
def _attention_pallas_ad(q, k, v, lengths):
    return _SPMD_KERNEL(q, k, v, lengths)


def _attn_fwd(q, k, v, lengths):
    return _SPMD_KERNEL(q, k, v, lengths), (q, k, v, lengths)


def _attn_bwd(residuals, g):
    # Backward via XLA recompute of the (tiny) forward — the score matrix is
    # cheap to rebuild and this keeps the kernel forward-only.
    q, k, v, lengths = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: _attention_xla(q_, k_, v_, lengths), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_attention_pallas_ad.defvjp(_attn_fwd, _attn_bwd)


def masked_cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    lengths: jax.Array,
    use_pallas: bool = True,
) -> jax.Array:
    """Length-masked scaled-dot-product cross-attention.

    q: (B, T, D) queries; k, v: (B, S, D); lengths: (B,) valid key counts.
    Keys at positions >= lengths[b] receive zero attention weight.
    """
    if use_pallas and jax.default_backend() == "tpu":
        return _attention_pallas_ad(q, k, v, lengths)
    return _attention_xla(q, k, v, lengths)
