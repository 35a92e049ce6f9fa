"""Eval-time BN folding (vcagan/nn/fold.py): exact-algebra serving mode.

Folded modules (fold_bn=True) applied with fold_generator_side-transformed
params must reproduce the unfolded eval outputs to fp32 reassociation
tolerance, for every foldable module and for the composed serving path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcagan.configs import ModelConfig
from vcagan.nn import fold_conv_bn, fold_generator_side
from vcagan.train import VCAGANModules


@pytest.fixture(scope="module")
def inited():
    modules = VCAGANModules.create(ModelConfig())
    params, stats = modules.init_all(
        jax.random.PRNGKey(0), batch_size=2, video_frames=20, image_size=48
    )
    g_params = {k: params[k] for k in ("v_front", "gen", "post")}
    g_stats = {k: stats[k] for k in ("v_front", "gen", "post")}
    # perturb BN statistics away from init (mean 0 / var 1) so folding is
    # actually exercised, and give scales/biases non-trivial values
    def perturb(tree, seed):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        rng = np.random.default_rng(seed)
        out = []
        for leaf in leaves:
            noise = jnp.asarray(
                rng.uniform(0.5, 1.5, leaf.shape), leaf.dtype
            )
            out.append(leaf * noise + 0.05)
        return jax.tree_util.tree_unflatten(treedef, out)

    # all perturbed stats stay > 0.05, so every var remains positive
    g_stats = {k: perturb(v, i) for i, (k, v) in enumerate(g_stats.items())}
    return modules, g_params, g_stats


def test_fold_drops_paired_bns_only(inited):
    _, g_params, g_stats = inited
    fp, fs = fold_generator_side(g_params, g_stats)
    flat_p = jax.tree_util.tree_flatten_with_path(fp)[0]
    keys = {"/".join(str(k) for k in path) for path, _ in flat_p}
    # v_front: no bn left; convs gained biases
    assert not any("bn1" in k or "bn2" in k or "stem_bn" in k for k in keys)
    assert any("stem_conv" in k and "bias" in k for k in keys)
    # gen: pre-activation norms survive
    assert any("norm1" in k for k in keys)
    # post: bn_in folded, conv_in keeps (re-derived) bias
    assert not any("bn_in" in k for k in keys)
    # remaining stats: only the generator's pre-act norms
    assert fs["v_front"] == {} and fs["post"] == {}
    assert fs["gen"], "gen keeps its pre-activation BN stats"


def test_visual_front_folded_matches(inited):
    modules, g_params, g_stats = inited
    folded = VCAGANModules.create(ModelConfig(), fold_bn=True)
    fp, fs = fold_generator_side(g_params, g_stats)
    video = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 8, 48, 48, 1)), jnp.float32
    )
    ref_phon, ref_sent = jax.jit(
        lambda p, s, v: modules.v_front.apply(
            {"params": p, "batch_stats": s}, v, train=False
        )
    )(g_params["v_front"], g_stats["v_front"], video)
    phon, sent = jax.jit(
        lambda p, v: folded.v_front.apply({"params": p}, v, train=False)
    )(fp["v_front"], video)
    np.testing.assert_allclose(phon, ref_phon, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(sent, ref_sent, rtol=2e-4, atol=2e-4)


def test_postnet_folded_matches(inited):
    modules, g_params, g_stats = inited
    folded = VCAGANModules.create(ModelConfig(), fold_bn=True)
    fp, _ = fold_generator_side(g_params, g_stats)
    mel = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 80, 32)), jnp.float32
    )
    ref = jax.jit(
        lambda p, s, m: modules.post.apply(
            {"params": p, "batch_stats": s}, m, train=False
        )
    )(g_params["post"], g_stats["post"], mel)
    out = jax.jit(
        lambda p, m: folded.post.apply({"params": p}, m, train=False)
    )(fp["post"], mel)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_generator_folded_matches(inited):
    """gen has no foldable pairs; its folded apply still needs batch_stats
    and must be bit-identical (the transform must not touch it)."""
    modules, g_params, g_stats = inited
    fp, fs = fold_generator_side(g_params, g_stats)
    rng = np.random.default_rng(3)
    sent = jnp.asarray(rng.standard_normal((2, 8, 512)), jnp.float32)
    phon = jnp.asarray(rng.standard_normal((2, 8, 512)), jnp.float32)
    lengths = jnp.asarray([8, 5], jnp.int32)
    noise = jnp.asarray(rng.standard_normal((2, 20, 8, 128)), jnp.float32)

    def run(p, s):
        return modules.gen.apply(
            {"params": p, "batch_stats": s},
            sent, phon, lengths, train=False, noise=noise,
        )

    ref = jax.jit(run)(g_params["gen"], g_stats["gen"])
    out = jax.jit(run)(fp["gen"], fs["gen"])
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fold_is_idempotent_shape_safe(inited):
    """Folding a tree with no remaining pairs is a no-op."""
    _, g_params, g_stats = inited
    fp, fs = fold_conv_bn(g_params["v_front"], g_stats["v_front"])
    fp2, fs2 = fold_conv_bn(fp, fs)
    assert jax.tree_util.tree_structure(fp) == jax.tree_util.tree_structure(fp2)
    assert fs2 == {}


def test_train_mode_asserts(inited):
    folded = VCAGANModules.create(ModelConfig(), fold_bn=True)
    _, g_params, g_stats = inited
    fp, _ = fold_generator_side(g_params, g_stats)
    video = jnp.zeros((1, 4, 48, 48, 1))
    with pytest.raises(AssertionError):
        folded.v_front.apply(
            {"params": fp["v_front"]}, video, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
