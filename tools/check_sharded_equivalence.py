"""Diagnose sharded-vs-single-device train-step numeric deltas.

Runs the full GAN train step with SGD transforms (updated params are then
a LINEAR function of the grads: delta = lr * grad) in three layouts —
single device, dp8 (pure data parallel), dp4 x tp2 (model axis on) — and
prints per-side grad-delta statistics.  Separates the two hypotheses for
any disagreement:

- dp8 differs from single: float reassociation through the depth of the
  second-order graph (BN batch stats + grad psums change reduction order),
- tp2 adds on top of dp: the model-axis sharding of the attention denses
  (custom_partitioning rule, kernels/masked_attention.py) is wrong.

Usage (CPU mesh):
  JAX_PLATFORMS=cpu python tools/check_sharded_equivalence.py [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from vcagan.runtime import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np
import optax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--image", type=int, default=48)
    args = p.parse_args()

    from vcagan.configs import TrainConfig
    from vcagan.parallel import make_mesh, shard_batch, shard_state
    from vcagan.train import (
        Batch,
        VCAGANModules,
        create_train_state,
        make_train_step,
    )

    modules = VCAGANModules.create()
    cfg = TrainConfig()
    state, _, _ = create_train_state(jax.random.PRNGKey(0), modules, cfg, 10)
    g_tx = optax.sgd(cfg.lr)
    d_tx = optax.sgd(cfg.lr)
    state = state.replace(
        g_opt_state=g_tx.init(state.g_params),
        d_opt_state=d_tx.init(state.d_params),
    )

    b, frames, image = args.batch, args.frames, args.image
    rng_np = np.random.default_rng(0)
    batch = Batch(
        video=jnp.asarray(
            rng_np.standard_normal((b, frames, image, image, 1)), jnp.float32
        ),
        mel=jnp.asarray(
            np.clip(rng_np.standard_normal((b, 80, 4 * frames)), -1, 1), jnp.float32
        ),
        spec=jnp.asarray(
            np.abs(rng_np.standard_normal((b, 321, 4 * frames))), jnp.float32
        ),
        vid_len=jnp.full((b,), frames, jnp.int32),
        mel_len=jnp.full((b,), 4 * frames, jnp.int32),
    )
    key = jax.random.PRNGKey(7)

    def run(mp):
        if mp == 0:
            step = make_train_step(modules, g_tx, d_tx, cfg, donate=False)
            return step(state, batch, key)
        mesh = make_mesh(model_parallel=mp)
        with mesh:
            st = shard_state(state, mesh)
            bt = shard_batch(batch, mesh)
            step = make_train_step(
                modules, g_tx, d_tx, cfg, donate=False, mesh=mesh
            )
            return step(st, bt, key)

    results = {name: run(mp) for name, mp in
               (("single", 0), ("dp8", 1), ("dp4tp2", 2))}

    def leaf_stats(ref_state, cand_state, side):
        ref = getattr(results["single"][0], side)
        paths = [
            "/".join(str(getattr(k, "key", k)) for k in kp)
            for kp, _ in jax.tree_util.tree_flatten_with_path(ref)[0]
        ]
        a = jax.tree.leaves(getattr(ref_state, side))
        c = jax.tree.leaves(getattr(cand_state, side))
        base = jax.tree.leaves(getattr(state, side))
        rows = []
        for path, x, y, b0 in zip(paths, a, c, base):
            dg = np.abs(np.asarray(x) - np.asarray(y)).max() / cfg.lr
            gm = np.abs(np.asarray(x) - np.asarray(b0)).max() / cfg.lr
            rows.append((float(dg), float(gm), path))
        return rows

    s_ref, m_ref = results["single"]
    for name in ("dp8", "dp4tp2"):
        s_c, m_c = results[name]
        mdelta = max(
            abs(float(m_c[k]) - float(m_ref[k])) / max(abs(float(m_ref[k])), 1e-6)
            for k in m_ref
        )
        print(f"\n=== {name}: max metric rel-delta {mdelta:.2e}")
        for side in ("g_params", "d_params"):
            rows = leaf_stats(s_ref, s_c, side)
            rows.sort(reverse=True)
            all_dg = np.asarray([r[0] for r in rows])
            gmax = max(r[1] for r in rows)
            print(
                f"  {side}: max|dgrad| {all_dg.max():.3e} "
                f"(grad scale {gmax:.2f}, rel {all_dg.max() / gmax:.2e}); "
                f"worst leaves:"
            )
            for dg, gm, path in rows[:6]:
                print(f"    {dg:.3e}  (leaf grad max {gm:.2e})  {path}")


if __name__ == "__main__":
    main()
