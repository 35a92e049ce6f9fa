"""Pallas masked-attention kernel parity vs the XLA oracle (interpret mode
on CPU; the same kernel compiles via Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcagan.kernels.masked_attention import _attention_pallas, _attention_xla


@pytest.mark.parametrize(
    "b,t,s,d",
    [
        (1, 8, 8, 64),
        (4, 32, 16, 256),
        (3, 77, 21, 256),  # non-aligned shapes
    ],
)
def test_pallas_matches_xla(b, t, s, d):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, t, d))
    k = jax.random.normal(kk, (b, s, d))
    v = jax.random.normal(kv, (b, s, d))
    lengths = jnp.asarray((np.arange(b) % s) + 1, jnp.int32)

    out_p = np.asarray(_attention_pallas(q, k, v, lengths, interpret=True))
    out_x = np.asarray(_attention_xla(q, k, v, lengths))
    np.testing.assert_allclose(out_p, out_x, rtol=1e-5, atol=1e-5)


def test_full_mask_uses_all_keys():
    b, t, s, d = 2, 16, 8, 128
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (b, t, d))
    k = jax.random.normal(kk, (b, s, d))
    v = jax.random.normal(kv, (b, s, d))
    lengths = jnp.full((b,), s, jnp.int32)
    out = np.asarray(_attention_pallas(q, k, v, lengths, interpret=True))

    # unmasked softmax attention oracle
    scores = np.einsum("btd,bsd->bts", np.asarray(q), np.asarray(k)) / np.sqrt(d)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    ref = np.einsum("bts,bsd->btd", probs, np.asarray(v))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
