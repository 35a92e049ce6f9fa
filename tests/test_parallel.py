"""Data/model-parallel sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from vcagan.parallel import batch_sharding, make_mesh, replicated, shard_batch


class TestMesh:
    def test_mesh_shapes(self):
        mesh = make_mesh(model_parallel=1)
        assert mesh.shape["data"] == 8
        assert mesh.shape["model"] == 1

        mesh2 = make_mesh(model_parallel=2)
        assert mesh2.shape["data"] == 4
        assert mesh2.shape["model"] == 2

    def test_batch_sharded_over_data(self):
        mesh = make_mesh(model_parallel=1)
        x = jnp.zeros((16, 4))
        xs = jax.device_put(x, batch_sharding(mesh))
        assert len(xs.sharding.device_set) == 8

    def test_psum_equivalence(self):
        """A sharded jitted mean-grad equals the single-device result —
        the DP gradient all-reduce XLA inserts is exact."""
        mesh = make_mesh(model_parallel=1)
        w = jnp.asarray(np.random.default_rng(0).standard_normal((4, 4)), jnp.float32)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((16, 4)), jnp.float32)

        def loss(w, x):
            return jnp.mean((x @ w) ** 2)

        g_single = jax.grad(loss)(w, x)

        xs = jax.device_put(x, batch_sharding(mesh))
        ws = jax.device_put(w, replicated(mesh))
        g_sharded = jax.jit(jax.grad(loss))(ws, xs)
        np.testing.assert_allclose(
            np.asarray(g_single), np.asarray(g_sharded), rtol=1e-5, atol=1e-6
        )


class TestDryrunMultichip:
    def test_dryrun_8_devices(self):
        """The driver-facing multichip dry run: full GAN train step, 4x2
        (data x model) mesh, one step, finite metrics."""
        import sys, pathlib

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
        import __graft_entry__ as graft

        graft.dryrun_multichip(8)
