"""End-to-end training/validation orchestration.

The runtime equivalent of the reference drivers' epoch loops
(reference: train.py:124-328, train_LRS.py:140-320): host loader feeds the
on-device input pipeline, the jitted GAN step advances state, validation
vocodes with Griffin-Lim and scores STOI/ESTOI on-device, checkpoints keep
the metric-named + Best_* convention.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vcagan.configs import VCAGANConfig
from vcagan.data.device_pipeline import make_device_pipeline
from vcagan.data.grid import make_grid_dataset
from vcagan.dsp import MelPipeline
from vcagan.eval import stoi_estoi_batch
from vcagan.io import CheckpointManager, MetricWriter
from vcagan.parallel import make_mesh, shard_batch, shard_state
from vcagan.train.models import VCAGANModules
from vcagan.train.state import create_train_state
from vcagan.train.step import make_eval_step, make_train_step
from vcagan.train.state import make_optimizer


class Trainer:
    def __init__(
        self,
        config: VCAGANConfig,
        log_dir: str = "./runs",
        use_mesh: bool = True,
        synthetic_fallback: bool = True,
    ):
        self.config = config
        self.modules = VCAGANModules.create(config.model)
        self.pipeline = MelPipeline(config.audio)
        self.writer = MetricWriter(log_dir)
        self.ckpt = CheckpointManager(config.train.checkpoint_dir)
        self.synthetic_fallback = synthetic_fallback
        self.is_lrs = config.data.dataset in ("LRS2", "LRS3")

        self.train_ds = self._make_dataset("train", seed=config.train.seed)
        self.steps_per_epoch = max(
            len(self.train_ds) // config.train.batch_size, 1
        )

        tc = config.train
        self.g_tx = make_optimizer(
            tc.lr, tc.weight_decay, tc.amsgrad, tc.lr_milestones, tc.lr_gamma,
            self.steps_per_epoch,
        )
        self.d_tx = make_optimizer(
            tc.lr, tc.weight_decay, tc.amsgrad, tc.lr_milestones, tc.lr_gamma,
            self.steps_per_epoch,
        )
        self.state, _, _ = create_train_state(
            jax.random.PRNGKey(tc.seed), self.modules, tc, self.steps_per_epoch
        )

        self.mesh = None
        if use_mesh:
            # data-axis size must divide the batch: use the largest
            # compatible device subset (DataParallel semantics never
            # constrained the reference's batch either).
            import math

            mp = config.mesh.model_parallel
            avail = len(jax.devices())
            data_n = math.gcd(config.train.batch_size, max(avail // mp, 1))
            self.mesh = make_mesh(
                model_parallel=mp, devices=jax.devices()[: data_n * mp]
            )
            self.state = shard_state(self.state, self.mesh)

        if self.is_lrs:
            from vcagan.data.lrs import make_lrs_device_pipeline

            self.process_train = make_lrs_device_pipeline(
                config.audio,
                augment=config.data.augmentations,
                host_crop=config.data.host_crop,
            )
            self.process_eval = make_lrs_device_pipeline(
                config.audio, augment=False, host_crop=config.data.host_crop
            )
        else:
            self.process_train = make_device_pipeline(
                config.audio, config.data, augment=config.data.augmentations
            )
            self.process_eval = make_device_pipeline(
                config.audio, config.data, augment=False
            )
        self._step_kwargs = dict(
            remat=getattr(tc, "remat", "none"),
            d_phase=getattr(tc, "d_phase", "ref"),
        )
        self._step_options_fallback = False
        self.train_step = make_train_step(
            self.modules, self.g_tx, self.d_tx, tc, donate=True, mesh=self.mesh,
            **self._step_kwargs,
        )
        self.eval_step = make_eval_step(self.modules)
        self.rng = jax.random.PRNGKey(tc.seed)
        # validation dataset cache: the reference rebuilds a MultiDataset
        # per validate() call (train.py:337-353); rebuilding here would leak
        # a decode thread pool per call, so it is built once and reused
        self._val_ds = None

    # --------------------------------------------------------------- datasets

    def _make_dataset(self, mode: str, seed: int = 0):
        cfg = self.config
        # decode worker pool: full count for training, 2 for validation
        # (reference train.py:139-146 / 337-353)
        workers = cfg.train.workers if mode == "train" else min(cfg.train.workers, 2)
        if self.is_lrs:
            from vcagan.data.lrs import LRSClipSource, LRSDataset, SyntheticLRSSource

            source = None
            try:
                source = LRSClipSource(cfg.data, mode)
                if len(source) == 0:
                    source = None
            except (FileNotFoundError, OSError):
                source = None
            if source is None:
                if not self.synthetic_fallback:
                    raise FileNotFoundError(
                        f"{cfg.data.dataset} corpus/splits not found"
                    )
                source = SyntheticLRSSource(num_clips=8)
            return LRSDataset(source, cfg.audio, cfg.data, mode, seed, workers)
        return make_grid_dataset(
            cfg.data, cfg.audio, mode,
            synthetic_fallback=self.synthetic_fallback, seed=seed, workers=workers,
        )

    # ------------------------------------------------------------------ train

    def fit(
        self,
        epochs: Optional[int] = None,
        start_epoch: int = 0,
        max_steps: Optional[int] = None,
        log_every: int = 1,
        media_every: int = 0,
        profile_steps: Optional[tuple] = None,
        profile_dir: str = "./runs/profile",
    ):
        """Train.  ``eval_step > 0`` validates/checkpoints every N steps
        (GRID recipe, reference train.py:280); ``eval_step == 0`` validates
        per epoch (LRS recipe, reference train_LRS.py:275-311).

        ``profile_steps=(start, stop)`` captures a jax.profiler trace of
        those global steps into ``profile_dir``.
        """
        tc = self.config.train
        epochs = epochs if epochs is not None else tc.epochs
        step = int(self.state.step)
        step_t0 = time.time()
        from vcagan.data.prefetch import ParallelEpoch

        # Multi-host (DCN) input feeding: each process decodes only its
        # slice of the global batch and assembles global arrays; the seeded
        # shuffle order is host-identical, so slices partition each batch.
        proc_slice = None
        if jax.process_count() > 1:
            from vcagan.parallel.multihost import local_batch_slice

            proc_slice = local_batch_slice(tc.batch_size)

        # Deferred metric readback: the per-step ``float(v)`` calls are a
        # blocking device->host sync (per-scalar RTT on a tunnel-attached
        # chip), so step N's metrics are logged only AFTER step N+1 has
        # been dispatched — the readback then overlaps device execution
        # instead of serializing with it.
        pending = None  # (step, metrics) awaiting readback

        def flush():
            nonlocal pending, step_t0
            if pending is None:
                return
            pstep, pmetrics = pending
            pending = None
            if pstep % log_every == 0:
                # one stacked D2H instead of a per-scalar round trip (the
                # tunnel RTT is ~25 ms; a dozen float() calls would cost
                # more than the device step itself)
                keys = list(pmetrics)
                vals = np.asarray(jnp.stack([pmetrics[k] for k in keys]))
                host = dict(zip(keys, (float(v) for v in vals)))
                # wall time since the previous logged step (loop pace, not
                # device latency — steps overlap under async dispatch)
                host["step_seconds"] = time.time() - step_t0
                step_t0 = time.time()
                self.writer.scalars({f"train/{k}": v for k, v in host.items()}, pstep)

        # Process-based collate (DataConfig.collate_process): decode+collate
        # behind a fork(), shared-memory handoff, upload stays here.  The
        # multi-host slice path keeps the thread producer — there
        # ``globalize`` owns the transfer and slices are small.
        if self.config.data.collate_process and proc_slice is None:
            from vcagan.data.prefetch import ProcessEpoch

            def make_epoch():
                return ProcessEpoch(
                    self.train_ds, tc.batch_size, depth=2, to_device=True
                )

        else:

            def make_epoch():
                return ParallelEpoch(
                    self.train_ds, tc.batch_size, depth=2,
                    process_slice=proc_slice, to_device=proc_slice is None,
                )

        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            for raw in make_epoch():
                if profile_steps and step == profile_steps[0]:
                    jax.profiler.start_trace(profile_dir)
                self.rng, k_pipe, k_step = jax.random.split(self.rng, 3)
                if proc_slice is not None:
                    raw = self._globalize_raw(raw)
                batch = self.process_train(raw, k_pipe)
                if self.mesh is not None and proc_slice is None:
                    batch = shard_batch(batch, self.mesh)
                self.state, metrics = self._call_train_step(batch, k_step)
                step += 1
                flush()  # read back step-1's metrics while this step runs
                pending = (step, metrics)
                if profile_steps and step == profile_steps[1]:
                    jax.tree.map(
                        lambda x: x.block_until_ready(), metrics
                    )
                    jax.profiler.stop_trace()
                if media_every and step % media_every == 0:
                    self._log_train_media(batch, step)
                if tc.eval_step and step % tc.eval_step == 0:
                    flush()
                    logs = self.validate(fast=True)
                    self.ckpt.save(self.state, epoch, *logs[1:])
                if max_steps is not None and step >= max_steps:
                    flush()
                    return step
            flush()
            if not tc.eval_step:  # per-epoch validation (LRS recipe)
                logs = self.validate(fast=True)
                self.ckpt.save(self.state, epoch, *logs[1:])
            self.writer.scalars(
                {"train/epoch_seconds": time.time() - t0}, step
            )
        return step

    def rebuild_train_step(self, **overrides):
        """Rebuild the jitted step with changed kwargs (e.g. a remat recipe
        the config didn't carry); the compile-fallback below keeps working."""
        self._step_kwargs.update(overrides)
        self.train_step = make_train_step(
            self.modules, self.g_tx, self.d_tx, self.config.train,
            donate=True, mesh=self.mesh, **self._step_kwargs,
        )

    def _call_train_step(self, batch, k_step):
        """One jitted step, degrading to an option-less compile on tunnel
        compile-helper failure.

        The default step carries the measured TPU compiler options
        (step._tpu_compiler_options, +2% at the bench shapes), but the
        tunnel's remote compile helper INTERMITTENTLY SIGKILLs option-ful
        fresh compiles (observed round 4 persistently, round 5 on 1 of 4:
        runs/r5_tpu_session.log vs the 01:35 soak failure).  A +2% option
        must not cost a training run, so the first helper failure rebuilds
        the step with raw compiler defaults — usually a persistent-cache
        hit — and retries.  Compile failures raise before execution, so
        donated buffers are still intact.
        """
        try:
            return self.train_step(self.state, batch, k_step)
        except jax.errors.JaxRuntimeError as e:
            if self._step_options_fallback or "remote_compile" not in str(e):
                raise
            print(
                "train-step compile failed through the tunnel helper "
                f"({str(e).splitlines()[0][:120]}); retrying with "
                "compiler_options=None",
                flush=True,
            )
            self._step_options_fallback = True
            self.rebuild_train_step(compiler_options=None)
            return self.train_step(self.state, batch, k_step)

    def _globalize_raw(self, raw: dict) -> dict:
        """Per-host raw batch slice -> global arrays on the mesh's data
        axis (vcagan.parallel.multihost.globalize)."""
        from vcagan.parallel import batch_sharding
        from vcagan.parallel.multihost import globalize

        sh = batch_sharding(self.mesh)
        out = {}
        for k, v in raw.items():
            if k == "wav":
                # metric ground truth; the train pipeline never reads it
                # and globalize() is an eager H2D transfer per step
                continue
            v = np.asarray(v)
            out[k] = globalize(v, sh) if v.ndim > 0 else v
        return out

    def _log_train_media(self, batch, step: int) -> None:
        """Spectrogram images + Griffin-Lim audio from the current batch
        (reference logs these every 100 steps, train.py:239-278)."""
        self.rng, k_noise, k_gl = jax.random.split(self.rng, 3)
        g3, gs = self.eval_step(
            self.state.g_params,
            self.state.batch_stats,
            batch.video,
            batch.vid_len,
            k_noise,
        )
        self.writer.spectrogram("train_mel/g3", np.asarray(g3[0]), step)
        self.writer.spectrogram("train_mel/gt", np.asarray(batch.mel[0]), step)
        self.writer.spectrogram("train_spec/gen", np.asarray(gs[0]), step)
        if self.is_lrs:
            from vcagan.data.lrs import lrs_denormalize_spec

            spec = lrs_denormalize_spec(jnp.swapaxes(gs[:1], 1, 2))
        else:
            spec = jnp.swapaxes(gs[:1], 1, 2)
        wav = self.pipeline.inverse_spec(spec, k_gl)
        self.writer.audio("train_aud/pred_spec", np.asarray(wav[0]), step)

    # --------------------------------------------------------------- validate

    def validate(self, fast: bool = False, max_batches: Optional[int] = None):
        """Returns (recon_l1, stoi, estoi, pesq) of the POSTNET path.

        Mirrors reference validate (train.py:331-468): forward, Griffin-Lim
        BOTH paths — inverse_mel(g3) and inverse_spec(gs) — STOI/ESTOI/PESQ
        for each (the mel-path numbers go to the metric stream as
        val/*_mel), waveform + spectrogram figures for the first batch;
        fast mode = 5 batches; returns the postnet-path tuple
        (train.py:468).
        """
        cfg = self.config
        if self._val_ds is None:
            self._val_ds = self._make_dataset("val", seed=0)
        val_ds = self._val_ds
        limit = 5 if fast else (max_batches or len(val_ds))
        bs = max(cfg.train.batch_size, 1)

        from vcagan.eval.pesq_nb import pesq_batch

        losses, stois, estois, pesqs = [], [], [], []
        stois_mel, estois_mel, pesqs_mel = [], [], []
        # the val dataset is cached across calls (worker pool reuse), so
        # reset its shuffle rng each pass: every fast validation scores
        # the IDENTICAL subset, keeping Best_* checkpoint comparisons and
        # metric curves subset-noise-free (the rebuild-per-call semantics
        # this cache replaced)
        val_ds.rng = np.random.default_rng(0)
        for i, raw in enumerate(val_ds.epoch(bs, shuffle=fast, drop_last=False)):
            if i >= limit:
                break
            nv = int(raw.get("n_valid", bs))
            self.rng, k_pipe, k_noise, k_gl = jax.random.split(self.rng, 4)
            batch = self.process_eval(raw, k_pipe)
            g3, gs = self.eval_step(
                self.state.g_params,
                self.state.batch_stats,
                batch.video,
                batch.vid_len,
                k_noise,
            )
            losses.append(float(jnp.mean(jnp.abs(g3 - batch.mel)[:nv])))
            # GRID: vocode only the valid mel frames, sliced at the first
            # sample's length like the reference's g3[:, :, :, :mel_len[0]]
            # (train.py:389-391) — constant for fixed-length GRID val clips
            # (no retrace), load-bearing for short clips.
            # LRS: variable mel_len[0] per bucketed batch would retrace the
            # Griffin-Lim scan per distinct length, so the vocode stays at
            # the static bucket shape with per-sample frames >= mel_len
            # zeroed (the shape-static equivalent the LRS test CLI uses,
            # cli/test_lrs.py) — each clip is scored at its own length
            # rather than truncated at clip 0's like the reference quirk.
            if self.is_lrs:
                from vcagan.data.lrs import lrs_denormalize_spec

                mel_len = jnp.asarray(raw["mel_len"])
                spec = lrs_denormalize_spec(jnp.swapaxes(gs, 1, 2))
                frame_ok = jnp.arange(spec.shape[1])[None, :] < mel_len[:, None]
                spec = jnp.where(frame_ok[:, :, None], spec, 0.0)
                mel_in = jnp.where(
                    frame_ok[:, :, None], jnp.swapaxes(g3, 1, 2), -1.0
                )  # -1.0 = the normalized-mel silence floor
            else:
                ml0 = (
                    int(np.asarray(raw["mel_len"])[0])
                    if "mel_len" in raw
                    else gs.shape[2]
                )
                # raw postnet output, unclamped, like reference train.py:390
                spec = jnp.swapaxes(gs, 1, 2)[:, :ml0]
                mel_in = jnp.swapaxes(g3, 1, 2)[:, :ml0]
            wav_pred = self.pipeline.inverse_spec(spec, k_gl)
            # mel path: inverse_mel(g3) (reference train.py:389)
            wav_mel = self.pipeline.inverse_mel(mel_in, k_gl)
            wav_gt = jnp.asarray(raw["wav"])[:, : wav_pred.shape[1]]
            wav_mel_t = wav_mel[:, : wav_gt.shape[1]]
            lens = None
            if self.is_lrs:
                # score each padded variable-length clip at its own length
                # (exclusive pystoi framing at the TRUE length, zeros past
                # it) — same convention as cli/test_lrs.py
                n_wav = np.minimum(
                    np.asarray(raw["mel_len"]) * self.config.audio.hop_length,
                    wav_pred.shape[1],
                )
                ok = jnp.arange(wav_pred.shape[1])[None, :] < jnp.asarray(
                    n_wav
                )[:, None]
                wav_pred = jnp.where(ok, wav_pred, 0.0)
                wav_mel_t = jnp.where(ok, wav_mel_t, 0.0)
                wav_gt = jnp.where(ok, wav_gt, 0.0)
                lens = jnp.asarray(n_wav)
            s_b, e_b = stoi_estoi_batch(wav_gt, wav_pred, lengths=lens)
            stois.append(np.asarray(s_b)[:nv])
            estois.append(np.asarray(e_b)[:nv])
            pesqs.append(
                np.asarray(
                    pesq_batch(np.asarray(wav_gt), np.asarray(wav_pred), fs=16_000)
                )[:nv]
            )
            s_m, e_m = stoi_estoi_batch(wav_gt, wav_mel_t, lengths=lens)
            stois_mel.append(np.asarray(s_m)[:nv])
            estois_mel.append(np.asarray(e_m)[:nv])
            pesqs_mel.append(
                np.asarray(
                    pesq_batch(np.asarray(wav_gt), np.asarray(wav_mel_t), fs=16_000)
                )[:nv]
            )

            if i == 0:  # media for the first batch (reference train.py:406-448)
                step = int(self.state.step)
                self.writer.spectrogram("val_mel/g3", np.asarray(g3[0]), step)
                self.writer.spectrogram("val_mel/gt", np.asarray(batch.mel[0]), step)
                self.writer.spectrogram("val_spec/gen", np.asarray(gs[0]), step)
                self.writer.audio("val_aud/pred", np.asarray(wav_pred[0]), step)
                self.writer.audio("val_aud/pred_mel", np.asarray(wav_mel[0]), step)
                self.writer.audio("val_aud/gt", np.asarray(wav_gt[0]), step)
                self.writer.waveform("val_wav/gt", np.asarray(wav_gt[0]), step)
                self.writer.waveform("val_wav/pred_mel", np.asarray(wav_mel[0]), step)
                self.writer.waveform("val_wav/pred_spec", np.asarray(wav_pred[0]), step)

        if not losses:
            return 0.0, 0.0, 0.0, 0.0
        pesq_all = np.concatenate(pesqs)
        pesq_mean = float(np.nanmean(pesq_all)) if np.isfinite(pesq_all).any() else 0.0
        logs = (
            float(np.mean(losses)),
            float(np.nanmean(np.concatenate(stois))),
            float(np.nanmean(np.concatenate(estois))),
            pesq_mean,
        )
        # mel-path metrics go to the stream (reference logs both paths
        # incl. val/mel_pesq, train.py:453-460, but returns/checkpoints on
        # the postnet path)
        pesq_mel_all = np.concatenate(pesqs_mel)
        pesq_mel_mean = (
            float(np.nanmean(pesq_mel_all)) if np.isfinite(pesq_mel_all).any() else 0.0
        )
        self.writer.scalars(
            {
                "val/stoi": logs[1],
                "val/estoi": logs[2],
                "val/pesq": logs[3],
                "val/stoi_mel": float(np.nanmean(np.concatenate(stois_mel))),
                "val/estoi_mel": float(np.nanmean(np.concatenate(estois_mel))),
                "val/pesq_mel": pesq_mel_mean,
            },
            int(self.state.step),
        )
        return logs
