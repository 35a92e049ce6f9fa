"""The adversarial train step and inference/eval step, as single jitted
programs.

Reproduces the reference GRID/LRS step semantics (train.py:155-237,
train_LRS.py:168-248) with the gradient topology made explicit:

- D phase: real/fake logits at 3 mel scales + sync InfoNCE + R1 gradient
  penalty (second-order AD, the ``create_graph=True`` of train.py:188-194).
  ``value_and_grad`` over (d_params, g_params) captures BOTH the D update
  and the v_front gradients that the reference deliberately leaks through
  the live ``phon`` in the sync term and accumulates into the G update
  (the ``retain_graph=True`` comment at train.py:210).
- D optimizer update.
- G phase with the UPDATED D params (matching torch's execution order):
  adversarial + gen-mode sync + L1 reconstruction at 3 scales + postnet L1.
  The leaked v_front sync grads are added before the G update.

Both phases re-trace the identical v_front/gen forward with identical RNG
keys, so XLA CSE merges them — the "two backwards through one graph"
structure costs one forward, as in torch.

All losses are computed in float32 regardless of module compute dtype.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from vcagan.configs import TrainConfig
from vcagan.dsp.audio import mel_denormalize
from vcagan.nn.losses import gan_loss, r1_penalty
from vcagan.train.models import VCAGANModules
from vcagan.train.state import GANTrainState


class Batch(NamedTuple):
    """One training batch (all padded to static shapes).

    video:   (B, W, 112, 112, 1) normalized grayscale frames
    mel:     (B, 80, 4W) normalized log-mel in [-1, 1]
    spec:    (B, 321, 4W) linear magnitudes (GRID) / normalized (LRS)
    vid_len: (B,) true video frame counts
    mel_len: (B,) true mel frame counts
    """

    video: jax.Array
    mel: jax.Array
    spec: jax.Array
    vid_len: jax.Array
    mel_len: jax.Array


def _mel_pyramid(mel: jax.Array):
    """(B, 80, T) -> quarter/half-scale bilinear pyramids
    (reference: train.py:170-171, torch bilinear align_corners=False)."""
    b, f, t = mel.shape
    mel1 = jax.image.resize(mel, (b, f // 4, t // 4), method="bilinear")
    mel2 = jax.image.resize(mel, (b, f // 2, t // 2), method="bilinear")
    return mel1, mel2


def _img(mel: jax.Array) -> jax.Array:
    """(B, F, T) -> (B, F, T, 1) channels-last image."""
    return mel[..., None]


def _l1(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def make_train_step(
    modules: VCAGANModules,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    config: TrainConfig | None = None,
    donate: bool = True,
    sync_leak: bool = True,
    mesh=None,
    remat: str = "none",
    compiler_options="auto",
    d_phase: str = "ref",
):
    """Build the jitted GAN train step.

    Returns ``step_fn(state, batch, rng) -> (state, metrics)``.

    ``sync_leak=False`` disables the reference's deliberate D-phase
    gradient leak into v_front (the ``retain_graph=True`` accumulation at
    reference train.py:210) — used by the differential regression test
    that pins the leak's effect on the G update.

    ``remat``: comma-separated selective-rematerialization sites, trading
    recompute FLOPs for HBM traffic (the fp32 step measures 87% HBM
    bandwidth utilization at 23% MFU — tools/mfu_report.py — so the trade
    has headroom).  ``"vfront"`` checkpoints the visual front (its stem /
    ResNet activations are the largest residuals); ``"stem"`` checkpoints
    only the conv/BN/PReLU/maxpool stem chain inside the visual front
    (nn.remat in nn/visual_front.py) so just the 4x-smaller pooled output
    stays live — far less recompute than ``"vfront"``; where both fit the
    TPU compiler's own auto-remat is slightly faster (168.9 vs 160.6
    clips/s at bf16 batch 96 on the round-4 compiler).  The single-chip
    record is bf16 batch 96 ``"r1"`` = 190.3 clips/s (round-5 compiler;
    the round-4 b112 ``"stem,r1"`` record regressed under it — see
    runs/r5_tpu_session.log and tools/bench_train.py); ``"r1"``
    checkpoints the discriminator forward inside the R1 gradient penalty
    (the second-order path).  ``"none"`` (default) stores everything.
    (A policy-based ``save_anything_except_these_names`` remat over the
    whole visual front was measured and REJECTED: forcing every OTHER
    intermediate saveable more than doubled peak HBM, 12.8G -> >31G at
    bf16 batch 64.)

    ``mesh``: when training sharded, pass the (data, model) Mesh so the
    generator-side outputs are pinned to batch-only sharding at the
    generator/discriminator boundary.  Without the pin, GSPMD propagates
    the attention kernels' model-axis sharding through g1-3/sent into the
    discriminators and resolves the conflict with their replicated params
    by involuntary full rematerialization in the D backward.  The pin
    makes the attention all-gather happen once, where it belongs.

    ``compiler_options``: ``"auto"`` (default) applies the measured TPU
    options (``_tpu_compiler_options``); ``None`` compiles with the raw
    compiler defaults (the sweep's uncontaminated baseline); a dict is
    passed through verbatim.

    ``d_phase``: D-phase program structure, math-identical either way
    (pinned by tests/test_train_step.py).  ``"ref"`` mirrors the
    reference's per-tensor stacks (6 discriminator forwards + 3 separate
    R1 grads, train.py:182-207).  ``"batched"`` restructures against the
    step's small-fusion latency tail: real and fake mels are concatenated
    into ONE 2B-batch forward per scale (half the discriminator kernel
    launches, same FLOPs, larger MXU tiles) and the 3 R1 penalties become
    a single joint grad over the (mel1, mel2, mel3) tuple (one backward
    traversal instead of 3).
    """
    cfg = config or TrainConfig()

    if mesh is not None and mesh.shape.get("model", 1) > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        _batch_only = NamedSharding(mesh, PartitionSpec("data"))

        def _pin(x):
            return jax.lax.with_sharding_constraint(x, _batch_only)

    else:

        def _pin(x):
            return x

    remat_sites = {tok.strip() for tok in remat.split(",") if tok.strip()}
    unknown = remat_sites - {"none", "vfront", "stem", "r1"}
    if unknown:
        raise ValueError(
            f"unknown remat site(s) {sorted(unknown)}; "
            "valid: none, vfront, stem, r1"
        )
    if {"vfront", "stem"} <= remat_sites:
        raise ValueError(
            "remat sites 'vfront' and 'stem' are mutually exclusive "
            "('vfront' already drops everything 'stem' drops)"
        )

    def _vf_apply(params, stats, video, dropout_key):
        return modules.v_front.apply(
            {"params": params, "batch_stats": stats},
            video,
            train=True,
            remat_stem="stem" in remat_sites,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )

    if "vfront" in remat_sites:
        _vf_apply = jax.checkpoint(_vf_apply)

    def forward_gen_side(g_params, batch_stats, batch: Batch, rngs):
        """v_front + generator forward (train mode) with stats updates."""
        (phon, sent), vf_upd = _vf_apply(
            g_params["v_front"],
            batch_stats["v_front"],
            batch.video,
            rngs["dropout"],
        )
        (g1, g2, g3), gen_upd = modules.gen.apply(
            {"params": g_params["gen"], "batch_stats": batch_stats["gen"]},
            sent,
            phon,
            batch.vid_len,
            train=True,
            mutable=["batch_stats"],
            rngs={"noise": rngs["noise"]},
        )
        new_stats = {
            "v_front": vf_upd["batch_stats"],
            "gen": gen_upd["batch_stats"],
        }
        phon, sent = _pin(phon), _pin(sent)
        g1, g2, g3 = _pin(g1), _pin(g2), _pin(g3)
        return phon, sent, (g1, g2, g3), new_stats

    def disc_logits(d_params, name, mel_img, sent_sg):
        module = getattr(modules, name)
        return module.apply({"params": d_params[name]}, mel_img, sent_sg)

    if d_phase not in ("ref", "batched"):
        raise ValueError(f"unknown d_phase {d_phase!r}; valid: ref, batched")

    def _gan_terms_ref(d_params, sent_sg, mels, gens):
        # NOTE trace order is load-bearing for the persistent compile cache:
        # real+R1 interleaved per scale, THEN the fake loop, exactly as the
        # pre-d_phase step traced — reordering ops (even math-identically)
        # changes the canonicalized StableHLO and misses every cached TPU
        # executable.
        real_terms = []
        r1_terms = []
        for name, mel_k in zip(("dis1", "dis2", "dis3"), mels):
            u, c = disc_logits(d_params, name, _img(mel_k), sent_sg)
            real_terms.append(gan_loss(u, real=True) + gan_loss(c, real=True))
            r1_logit_fn = lambda m, n=name: disc_logits(d_params, n, _img(m), sent_sg)[0]
            if "r1" in remat_sites:
                r1_logit_fn = jax.checkpoint(r1_logit_fn)
            r1_terms.append(r1_penalty(r1_logit_fn, mel_k))
        fake_terms = []
        for name, g_k in zip(("dis1", "dis2", "dis3"), gens):
            u, c = disc_logits(
                d_params, name, _img(jax.lax.stop_gradient(g_k)), sent_sg
            )
            fake_terms.append(gan_loss(u, real=False) + gan_loss(c, real=False))
        return real_terms, fake_terms, r1_terms

    def _gan_terms_batched(d_params, sent_sg, mels, gens):
        # one 2B forward per scale; convs/heads are per-sample so slicing
        # the logits back out is exact
        bsz = mels[0].shape[0]
        sent2 = jnp.concatenate([sent_sg, sent_sg], axis=0)
        real_terms, fake_terms = [], []
        for name, mel_k, g_k in zip(("dis1", "dis2", "dis3"), mels, gens):
            both = jnp.concatenate(
                [_img(mel_k), _img(jax.lax.stop_gradient(g_k))], axis=0
            )
            u, c = disc_logits(d_params, name, both, sent2)
            real_terms.append(
                gan_loss(u[:bsz], real=True) + gan_loss(c[:bsz], real=True)
            )
            fake_terms.append(
                gan_loss(u[bsz:], real=False) + gan_loss(c[bsz:], real=False)
            )
        return real_terms, fake_terms

    def _r1_terms_joint(d_params, sent_sg, mels):
        # single grad over the (mel1, mel2, mel3) tuple: the 3 penalty
        # backwards merge into one traversal
        def logit_sum(ms):
            total = 0.0
            for name, m in zip(("dis1", "dis2", "dis3"), ms):
                total = total + jnp.sum(
                    disc_logits(d_params, name, _img(m), sent_sg)[0]
                )
            return total

        if "r1" in remat_sites:
            logit_sum = jax.checkpoint(logit_sum)
        grads = jax.grad(logit_sum)(tuple(mels))
        terms = []
        for g in grads:
            flat = g.reshape(g.shape[0], -1)
            terms.append(jnp.mean(jnp.sum(flat * flat, axis=1)))
        return terms

    def d_loss_fn(d_params, g_params, batch_stats, batch: Batch, rngs):
        phon, sent, (g1, g2, g3), _ = forward_gen_side(
            g_params, batch_stats, batch, rngs
        )
        sent_sg = jax.lax.stop_gradient(sent)
        mel1, mel2 = _mel_pyramid(batch.mel)
        mel3 = batch.mel
        mels = (mel1, mel2, mel3)
        gens = (g1, g2, g3)

        if d_phase == "batched":
            real_terms, fake_terms = _gan_terms_batched(
                d_params, sent_sg, mels, gens
            )
            r1_terms = _r1_terms_joint(d_params, sent_sg, mels)
        else:
            real_terms, fake_terms, r1_terms = _gan_terms_ref(
                d_params, sent_sg, mels, gens
            )

        # Sync critic on REAL mel with LIVE phon: this is the only dis-phase
        # path into v_front (reference train.py:186,210).
        sync_vec, s_dis_upd = modules.s_dis.apply(
            {"params": d_params["s_dis"], "batch_stats": batch_stats["s_dis"]},
            phon,
            _img(mel3),
            gen=False,
            train=True,
            mutable=["batch_stats"],
        )
        sync_loss = jnp.mean(sync_vec)

        real_loss = sum(real_terms) / 3.0 + sum(r1_terms) / 3.0
        fake_loss = sum(fake_terms) / 3.0
        dis_loss = real_loss + fake_loss + cfg.sync_dis_weight * sync_loss
        aux = {
            "d_sync_loss": sync_loss,
            "s_dis_stats": s_dis_upd["batch_stats"],
            "r1": sum(r1_terms) / 3.0,
        }
        return dis_loss, aux

    def g_loss_fn(g_params, d_params, batch_stats, batch: Batch, rngs):
        phon, sent, (g1, g2, g3), gen_side_stats = forward_gen_side(
            g_params, batch_stats, batch, rngs
        )
        sent_sg = jax.lax.stop_gradient(sent)
        mel1, mel2 = _mel_pyramid(batch.mel)
        mel3 = batch.mel

        gs, post_upd = modules.post.apply(
            {"params": g_params["post"], "batch_stats": batch_stats["post"]},
            g3,
            train=True,
            mutable=["batch_stats"],
        )

        adv_terms = []
        for name, g_k in (("dis1", g1), ("dis2", g2), ("dis3", g3)):
            u, c = disc_logits(d_params, name, _img(g_k), sent_sg)
            adv_terms.append(gan_loss(u, real=True) + gan_loss(c, real=True))

        # The reference runs s_dis in BOTH phases per step, so its BN
        # running stats are updated twice: by the D-phase (real mel) and
        # again here by the generated mel (train.py:186,224).  train-mode
        # BN outputs never read running stats, so this only affects the
        # saved statistics, not gradients.
        g_sync_vec, s_dis_upd = modules.s_dis.apply(
            {"params": d_params["s_dis"], "batch_stats": batch_stats["s_dis"]},
            jax.lax.stop_gradient(phon),
            _img(g3),
            gen=True,
            train=True,
            mutable=["batch_stats"],
        )
        g_sync_loss = jnp.mean(g_sync_vec)

        g_loss = sum(adv_terms) / 3.0 + g_sync_loss

        if cfg.recon_on_denormalized:
            # GRID: L1 on denormalized log-mels (reference train.py:226-228)
            recon = (
                _l1(mel_denormalize(g1), mel_denormalize(mel1))
                + _l1(mel_denormalize(g2), mel_denormalize(mel2))
                + _l1(mel_denormalize(g3), mel_denormalize(mel3))
            ) / 3.0
        else:
            # LRS: L1 on normalized mels (reference train_LRS.py:233-235)
            recon = (_l1(g1, mel1) + _l1(g2, mel2) + _l1(g3, mel3)) / 3.0
        recon = recon + _l1(gs, batch.spec)

        gen_loss = g_loss + cfg.recon_weight * recon
        aux = {
            "g_loss": g_loss,
            "recon_loss": recon,
            "g_sync_loss": g_sync_loss,
            "gen_side_stats": gen_side_stats,
            "post_stats": post_upd["batch_stats"],
            "s_dis_stats": s_dis_upd["batch_stats"],
        }
        return gen_loss, aux

    def train_step(state: GANTrainState, batch: Batch, rng: jax.Array):
        k_dropout, k_noise = jax.random.split(jax.random.fold_in(rng, state.step))
        rngs = {"dropout": k_dropout, "noise": k_noise}

        # ---- D phase (grads wrt d_params AND the v_front sync leak) ----
        (dis_loss, d_aux), (d_grads, vf_sync_grads) = jax.value_and_grad(
            d_loss_fn, argnums=(0, 1), has_aux=True
        )(state.d_params, state.g_params, state.batch_stats, batch, rngs)

        d_updates, d_opt_state = d_tx.update(
            d_grads, state.d_opt_state, state.d_params
        )
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- G phase with the updated D (torch ordering); s_dis stats
        # continue from the D-phase update (reference runs s_dis twice) ----
        bs_after_d = dict(state.batch_stats)
        bs_after_d["s_dis"] = d_aux["s_dis_stats"]
        (gen_loss, g_aux), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params, d_params, bs_after_d, batch, rngs)

        if sync_leak:
            # Accumulate the leaked sync grads into the G update
            # (reference train.py:210 "accumulate v_front grad").
            g_grads = jax.tree.map(jnp.add, g_grads, vf_sync_grads)

        g_updates, g_opt_state = g_tx.update(
            g_grads, state.g_opt_state, state.g_params
        )
        g_params = optax.apply_updates(state.g_params, g_updates)

        batch_stats = dict(state.batch_stats)
        batch_stats.update(g_aux["gen_side_stats"])
        batch_stats["post"] = g_aux["post_stats"]
        batch_stats["s_dis"] = g_aux["s_dis_stats"]
        # discriminators are norm-free (reference ResBlk normalize=False);
        # keep their (empty) entries as-is.

        new_state = GANTrainState(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            batch_stats=batch_stats,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
        )
        metrics = {
            "dis_loss": dis_loss,
            "gen_loss": gen_loss,
            "g_loss": g_aux["g_loss"],
            "recon_loss": g_aux["recon_loss"],
            "g_sync_loss": g_aux["g_sync_loss"],
            "d_sync_loss": d_aux["d_sync_loss"],
            "r1": d_aux["r1"],
            # stability observability (the soak harness asserts on these;
            # the reference logs losses only, train.py:249-254)
            "g_grad_norm": optax.global_norm(g_grads),
            "d_grad_norm": optax.global_norm(d_grads),
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    if compiler_options == "auto":
        compiler_options = _tpu_compiler_options()
    return jax.jit(
        train_step,
        donate_argnums=donate_argnums,
        compiler_options=compiler_options,
    )


def _tpu_compiler_options():
    """Measured TPU compiler options for the train step (None off-TPU).

    A 64 MiB scoped-VMEM budget lets the fusion emitter build larger
    fusions against the step's small-fusion latency tail: +1.9% whole-step
    throughput at b64 bf16 remat=r1 in the round-3 sweep
    (tools/sweep_xla_flags.py: 142.3 -> 145.0 clips/s; 32 MiB regressed,
    128 MiB fails — that is the entire v5e VMEM), +2.4% at b32 in the
    round-5 probe (149.4 -> 153.0), and the round-5 record config carries
    it (b96 bf16 r1 = 190.3 clips/s).  Options must be set via PJRT
    ``compiler_options`` — client-side XLA_FLAGS never reach the
    server-side TPU compiler behind the tunnel.

    History: disabled during round 4 because the tunnel's compile helper
    SIGKILLed ANY fresh train-step compile carrying an option (a
    server-side regression).  Round 5 re-probed per the standing plan and
    the helper compiles option-ful again (three fresh compiles, 460-750 s)
    — re-enabled.  If the SIGKILL regression ever returns, pass
    ``compiler_options=None`` (bench_train: ``--compiler_opts none``) or
    make this return None again; cached option-ful executables still load
    either way.

    TPU-only: other backends reject unknown TPU options (and the CPU
    suite/dryrun cache keys must not change with this default).
    """
    if jax.default_backend() != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def make_eval_step(modules: VCAGANModules, flip_tta: bool = False):
    """Inference forward: video -> (g3 mel, postnet linear spec).

    With ``flip_tta`` the horizontal-flip test-time augmentation of the
    reference test driver is applied: g3 is the mean over the original and
    width-flipped clip (reference test.py:131-140).
    """

    def eval_step(
        g_params: Dict[str, Any],
        batch_stats: Dict[str, Any],
        video: jax.Array,
        vid_len: jax.Array,
        noise_rng: jax.Array,
        noise: jax.Array | None = None,
    ):
        """``noise`` (2, B, F, T, C), optional: explicit generator noise for
        the two TTA passes, overriding the rng draws — the system-parity
        harness injects the reference's pinned torch.randn draws here."""

        def forward(vid, key, n):
            phon, sent = modules.v_front.apply(
                {"params": g_params["v_front"], "batch_stats": batch_stats["v_front"]},
                vid,
                train=False,
            )
            g1, g2, g3 = modules.gen.apply(
                {"params": g_params["gen"], "batch_stats": batch_stats["gen"]},
                sent,
                phon,
                vid_len,
                train=False,
                rngs={"noise": key},
                noise=n,
            )
            return g3

        g3 = forward(video, noise_rng, None if noise is None else noise[0])
        if flip_tta:
            g3_flip = forward(
                video[:, :, :, ::-1, :],
                jax.random.fold_in(noise_rng, 1),
                None if noise is None else noise[1],
            )
            g3 = (g3 + g3_flip) / 2.0

        gs = modules.post.apply(
            {"params": g_params["post"], "batch_stats": batch_stats["post"]},
            g3,
            train=False,
        )
        return g3, gs

    return jax.jit(eval_step)
