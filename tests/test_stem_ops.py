"""Exactness of the space-to-depth stem conv.

s2d_stem_conv3d must equal the plain lax conv it replaces (same kernel
tensor) to float-reassociation noise, for the shapes the model actually
sees (112^2 GRID crops, 80^2 LRS crops, 48^2 test fixtures) and its
gradients must match too — it is an exact rewrite, not an approximation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcagan.nn.common import s2d_stem_conv3d


def _plain_stem(video, kernel):
    return jax.lax.conv_general_dilated(
        video,
        kernel,
        (1, 2, 2),
        ((2, 2), (3, 3), (3, 3)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


class TestS2DStem:
    @pytest.mark.parametrize("hw", [112, 80, 48])
    def test_matches_plain_conv(self, hw):
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.standard_normal((2, 5, hw, hw, 1)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((5, 7, 7, 1, 8)) * 0.05, jnp.float32)
        ref = _plain_stem(v, k)
        got = s2d_stem_conv3d(v, k)
        assert got.shape == ref.shape == (2, 5, hw // 2, hw // 2, 8)
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_kernel_gradient_matches(self):
        rng = np.random.default_rng(1)
        v = jnp.asarray(rng.standard_normal((1, 4, 48, 48, 1)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((5, 7, 7, 1, 4)) * 0.05, jnp.float32)
        g_ref = jax.grad(lambda k: jnp.sum(jnp.sin(_plain_stem(v, k))))(k)
        g_got = jax.grad(lambda k: jnp.sum(jnp.sin(s2d_stem_conv3d(v, k))))(k)
        np.testing.assert_allclose(g_got, g_ref, atol=5e-4)

    def test_odd_size_fallback(self):
        rng = np.random.default_rng(2)
        v = jnp.asarray(rng.standard_normal((1, 3, 47, 47, 1)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((5, 7, 7, 1, 4)) * 0.05, jnp.float32)
        np.testing.assert_allclose(
            s2d_stem_conv3d(v, k), _plain_stem(v, k), atol=2e-5
        )
