"""Mixed-precision (bf16) forward sanity + LRS-config train step smoke."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcagan.configs import ModelConfig, TrainConfig
from vcagan.train import Batch, VCAGANModules, create_train_state, make_train_step
from vcagan.train.state import make_optimizer

B, W, HW = 2, 20, 48


def tiny_batch(seed=0):
    rng = np.random.default_rng(seed)
    return Batch(
        video=jnp.asarray(rng.standard_normal((B, W, HW, HW, 1)), jnp.float32),
        mel=jnp.asarray(np.clip(rng.standard_normal((B, 80, 4 * W)), -1, 1), jnp.float32),
        spec=jnp.asarray(np.abs(rng.standard_normal((B, 321, 4 * W))), jnp.float32),
        vid_len=jnp.full((B,), W, jnp.int32),
        mel_len=jnp.full((B,), 4 * W, jnp.int32),
    )


class TestBf16:
    def test_bf16_forward_close_to_fp32(self):
        video = jnp.asarray(
            np.random.default_rng(0).standard_normal((B, W, HW, HW, 1)), jnp.float32
        )
        outs = {}
        for bf16 in (False, True):
            modules = VCAGANModules.create(ModelConfig(use_bfloat16=bf16))
            params, stats = modules.init_all(jax.random.PRNGKey(0), 2, W, HW)
            phon, sent = modules.v_front.apply(
                {"params": params["v_front"], "batch_stats": stats["v_front"]},
                video,
                train=False,
            )
            outs[bf16] = np.asarray(phon, np.float32)
        # bf16 matmuls: expect coarse but correlated agreement
        a, b = outs[False].ravel(), outs[True].ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.99, corr

    def test_params_stay_fp32_under_bf16_compute(self):
        modules = VCAGANModules.create(ModelConfig(use_bfloat16=True))
        params, _ = modules.init_all(jax.random.PRNGKey(0), 2, W, HW)
        leaves = jax.tree.leaves(params)
        assert all(l.dtype == jnp.float32 for l in leaves)

    def test_bf16_serving_composed_path_quality(self):
        """The bf16 SERVING MODE (cli/test.py --bf16, bench.py): the full
        composed inference path — visual front -> generator -> postnet ->
        fp32 Griffin-Lim — run in bf16 compute must stay perceptually
        equivalent to the fp32 path on the SAME fp32 params and the SAME
        injected generator noise.  Pinned as mel correlation plus
        STOI(wav_fp32, wav_bf16): STOI of a signal against a copy is ~1.0,
        so a high score bounds the perceptual drift of the dtype switch.
        The STOI bound is loose (0.85) because the net is UNTRAINED: its
        noise-like spectrograms make Griffin-Lim's phase recovery chaotic,
        amplifying sub-1% magnitude differences (measured ~0.90 here); on
        trained speech content the same mel agreement scores far higher."""
        from vcagan.configs import AudioConfig
        from vcagan.dsp import MelPipeline
        from vcagan.eval.stoi_np import stoi_np

        pipe = MelPipeline(AudioConfig())
        rng = np.random.default_rng(3)
        video = jnp.asarray(rng.standard_normal((B, W, HW, HW, 1)), jnp.float32)
        vid_len = jnp.full((B,), W, jnp.int32)
        # one fp32 noise draw injected into BOTH paths so rng dtype
        # differences can't leak into the comparison
        noise = jnp.asarray(rng.standard_normal((B, 20, W, 128)), jnp.float32)

        params = stats = None
        mels, wavs, specs = {}, {}, {}
        for bf16 in (False, True):
            modules = VCAGANModules.create(ModelConfig(use_bfloat16=bf16))
            if params is None:
                params, stats = modules.init_all(jax.random.PRNGKey(0), B, W, HW)
            phon, sent = modules.v_front.apply(
                {"params": params["v_front"], "batch_stats": stats["v_front"]},
                video,
                train=False,
            )
            _, _, g3 = modules.gen.apply(
                {"params": params["gen"], "batch_stats": stats["gen"]},
                sent,
                phon,
                vid_len,
                train=False,
                noise=noise,
            )
            gs = modules.post.apply(
                {"params": params["post"], "batch_stats": stats["post"]},
                g3,
                train=False,
            )
            spec = jnp.swapaxes(gs, 1, 2).astype(jnp.float32)
            wavs[bf16] = np.asarray(pipe.inverse_spec(spec, jax.random.PRNGKey(5)))
            mels[bf16] = np.asarray(g3, np.float32)
            specs[bf16] = np.asarray(spec, np.float32)

        corr = np.corrcoef(mels[False].ravel(), mels[True].ravel())[0, 1]
        assert corr > 0.99, corr
        # deterministic magnitude-level pin: Griffin-Lim only consumes the
        # linear spec, so a small relative L2 here bounds the vocoder input
        rel = np.linalg.norm(specs[True] - specs[False]) / np.linalg.norm(
            specs[False]
        )
        assert rel < 0.05, rel
        for b in range(B):
            s = stoi_np(wavs[False][b], wavs[True][b], 16_000)
            assert s > 0.85, (b, s)


_SOAK_NPZ = next(
    (
        p
        for p in (
            os.path.join(os.path.dirname(__file__), "..", "data", "soak_serving_q8.npz"),
            os.path.join(os.path.dirname(__file__), "..", "data", "soak_serving_fp16.npz"),
            os.path.join(
                os.path.dirname(__file__), "..", "runs", "soak_bf16_b32", "serving_fp16.npz"
            ),
        )
        if os.path.exists(p)
    ),
    None,
)


class TestBf16TrainedWeights:
    @pytest.mark.skipif(
        _SOAK_NPZ is None,
        reason="no soaked serving weights; regenerate with "
        "`python tools/soak.py --steps 2000 --batch 32 --bf16` (~45 min TPU)",
    )
    def test_bf16_serving_quality_on_trained_weights(self):
        """The trained-weights version of the composed bf16 pin.  On the
        2k-step soak checkpoint, measured on the TPU over 32 synthetic GRID
        val clips (tools/eval_bf16_quality.py): mel corr 0.9999, spec
        rel-L2 0.92%, STOI(fp32,bf16) mean 0.949 / min 0.866, and the
        instrumental deltas vs ground truth are -0.0022 STOI / -0.0021
        ESTOI — the dtype switch is quality-neutral at the metric that
        matters.  This test re-runs one batch of that comparison."""
        from vcagan.configs import ModelConfig, grid_config
        from vcagan.data.device_pipeline import make_device_pipeline
        from vcagan.data.grid import make_grid_dataset
        from vcagan.dsp import MelPipeline
        from vcagan.eval.stoi_np import stoi_np
        from vcagan.io.serving_npz import load_serving_npz

        bsz = 4
        cfg = grid_config(
            **{"train.batch_size": bsz, "data.window_size": 40}
        )
        ds = make_grid_dataset(
            cfg.data, cfg.audio, "val", synthetic_fallback=True, seed=0, workers=1
        )
        process_eval = make_device_pipeline(cfg.audio, cfg.data, augment=False)
        pipe = MelPipeline(cfg.audio)

        tmpl = VCAGANModules.create(ModelConfig())
        t_params, t_stats = tmpl.init_all(jax.random.PRNGKey(0), 2, 20, 48)
        g_params, g_stats = load_serving_npz(_SOAK_NPZ, t_params, t_stats)

        raw = next(iter(ds.epoch(bsz, shuffle=False, drop_last=True)))
        batch = process_eval(raw, jax.random.PRNGKey(1))
        w = batch.video.shape[1]
        noise = jnp.asarray(
            np.random.default_rng(0).standard_normal((bsz, 20, w, 128)),
            jnp.float32,
        )

        outs = {}
        for bf16 in (False, True):
            modules = VCAGANModules.create(ModelConfig(use_bfloat16=bf16))
            phon, sent = modules.v_front.apply(
                {"params": g_params["v_front"], "batch_stats": g_stats["v_front"]},
                batch.video, train=False,
            )
            _, _, g3 = modules.gen.apply(
                {"params": g_params["gen"], "batch_stats": g_stats["gen"]},
                sent, phon, batch.vid_len, train=False, noise=noise,
            )
            gs = modules.post.apply(
                {"params": g_params["post"], "batch_stats": g_stats["post"]},
                g3, train=False,
            )
            spec = jnp.swapaxes(gs, 1, 2).astype(jnp.float32)
            wav = np.asarray(pipe.inverse_spec(spec, jax.random.PRNGKey(2)))
            outs[bf16] = (np.asarray(g3, np.float32), np.asarray(spec), wav)

        (g32, s32, w32), (g16, s16, w16) = outs[False], outs[True]
        corr = np.corrcoef(g32.ravel(), g16.ravel())[0, 1]
        assert corr > 0.999, corr
        rel = np.linalg.norm(s16 - s32) / np.linalg.norm(s32)
        # TPU MXU (bf16 inputs, fp32 accumulation) measures 0.92%; CPU
        # XLA's bf16 emulation rounds accumulators too and lands ~3.9%
        assert rel < 0.06, rel
        wav_gt = np.asarray(raw["wav"])[:, : w32.shape[1]]
        stoi_3216, d_gt = [], []
        for b in range(bsz):
            L = min(w32.shape[1], wav_gt.shape[1])
            stoi_3216.append(stoi_np(w32[b][:L], w16[b][:L], 16_000))
            d_gt.append(
                stoi_np(wav_gt[b][:L], w16[b][:L], 16_000)
                - stoi_np(wav_gt[b][:L], w32[b][:L], 16_000)
            )
        assert np.mean(stoi_3216) > 0.9, stoi_3216
        assert abs(float(np.mean(d_gt))) < 0.01, d_gt


@pytest.mark.slow
class TestLRSTrainConfig:
    def test_one_step_with_lrs_losses(self):
        """LRS deltas: sync D weight 0.5, recon on normalized mels, plain
        Adam (reference train_LRS.py:97-98,218,233-237)."""
        modules = VCAGANModules.create()
        cfg = TrainConfig(
            amsgrad=False,
            sync_dis_weight=0.5,
            recon_on_denormalized=False,
            lr_milestones=(100, 150),
        )
        g_tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.amsgrad,
                              cfg.lr_milestones, cfg.lr_gamma, 10)
        d_tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.amsgrad,
                              cfg.lr_milestones, cfg.lr_gamma, 10)
        state, _, _ = create_train_state(jax.random.PRNGKey(0), modules, cfg, 10)
        step = make_train_step(modules, g_tx, d_tx, cfg, donate=False)
        s1, metrics = step(state, tiny_batch(), jax.random.PRNGKey(5))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, v)
        assert int(s1.step) == 1
