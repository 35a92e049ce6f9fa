"""Fused conv-PReLU-conv-add-PReLU block: kernel parity + flax integration.

The Pallas kernel itself is pinned against the lax-conv oracle in
interpret mode (Mosaic lowering quirks need the real chip — probed by
tools/bench_fused_block.py — but the math is backend-independent);
the flax integration is pinned by running the SAME folded params through
ResNetTrunk(fold_bn) with and without ``fused``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vcagan.kernels.fused_block import (
    _fused_block_pallas,
    fused_block_xla,
    fused_basic_block,
)


def _mats(n=5, h=9, w=9, c=64, seed=0, dtype=jnp.float32):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.standard_normal((n, h, w, c)), dtype)
    w1 = jnp.asarray(r.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    w2 = jnp.asarray(r.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(r.standard_normal(c) * 0.1, jnp.float32)
    b2 = jnp.asarray(r.standard_normal(c) * 0.1, jnp.float32)
    a1 = jnp.asarray(np.abs(r.standard_normal(c)) * 0.25, jnp.float32)
    a2 = jnp.asarray(np.abs(r.standard_normal(c)) * 0.25, jnp.float32)
    return x, w1, b1, a1, w2, b2, a2


class TestKernelParity:
    def test_interpret_matches_xla_fp32(self):
        args = _mats()
        ref = fused_block_xla(*args)
        # nb=2 with N=5: exercises the pad-to-multiple path too
        out = _fused_block_pallas(*args, nb=2, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_interpret_matches_xla_bf16(self):
        args = _mats(dtype=jnp.bfloat16)
        ref = fused_block_xla(*args)
        out = _fused_block_pallas(*args, nb=4, interpret=True)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32),
            np.asarray(ref, np.float32),
            rtol=0.05,
            atol=0.05,
        )

    def test_dispatch_falls_back_off_tpu(self):
        args = _mats(n=3, h=5, w=5, c=16)
        ref = fused_block_xla(*args)
        out = fused_basic_block(*args)  # CPU backend -> XLA path
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


class TestTrunkIntegration:
    def _trunk_pair(self):
        from vcagan.nn.resnet import ResNetTrunk

        plain = ResNetTrunk(fold_bn=True, fused=False)
        fused = ResNetTrunk(fold_bn=True, fused=True)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((6, 28, 28, 64)), jnp.float32
        )
        params = plain.init(jax.random.PRNGKey(0), x, train=False)["params"]
        return plain, fused, params, x

    def test_same_param_tree(self):
        plain, fused, params, x = self._trunk_pair()
        p2 = fused.init(jax.random.PRNGKey(0), x, train=False)["params"]
        t1 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), params)
        t2 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p2)
        assert jax.tree_util.tree_structure(t1) == jax.tree_util.tree_structure(t2)
        assert t1 == t2

    def test_same_outputs_with_shared_params(self):
        plain, fused, params, x = self._trunk_pair()
        y1 = plain.apply({"params": params}, x, train=False)
        y2 = fused.apply({"params": params}, x, train=False)
        np.testing.assert_allclose(
            np.asarray(y1), np.asarray(y2), rtol=2e-5, atol=2e-5
        )
