"""SYSTEM-level parity: the reference's composed inference path, run in
torch in place, vs this framework's composed path — same clips, same
converted weights, same generator noise, same Griffin-Lim phase init —
compared at the FINAL metric: STOI / ESTOI of the vocoded waveform against
ground-truth audio, within 0.5% relative (the north-star quality bar).

Every component is already pinned module-for-module at 2e-4
(test_torch_parity.py) and the synthesis DSP waveform-for-waveform
(test_inverse_dsp_parity.py); this harness closes the remaining epistemic
gap — COMPOSITION errors (vocode-chain scale, normalization hand-offs, TTA
averaging, metric plumbing) that module tests cannot see.

Torch side = the literal reference test path (test.py:131-148): v_front ->
gen (fresh noise per pass) -> flip-TTA mean of g3 -> post ->
``inverse_spec(gs[:, :, :, :mel_len[0]])`` (seeded Griffin-Lim 60) ->
per-sample STOI/ESTOI.  The validate-path mel leg (train.py:389:
``inverse_mel(g3[...])``) is covered too.

JAX side = the production entry points: ``make_eval_step(flip_tta=True)``
+ ``MelPipeline.inverse_spec`` / ``inverse_mel`` with the same noise and
phase injected through their explicit seams, scored by the same oracle
(``stoi_np``).
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)

sys.path.insert(0, REFERENCE)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

torch = pytest.importorskip("torch")

from test_inverse_dsp_parity import _install_shims  # noqa: E402

_install_shims()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.convert_torch_ckpt import (  # noqa: E402
    convert_decoder,
    convert_postnet,
    convert_visual_front,
)
from vcagan.configs import AudioConfig  # noqa: E402
from vcagan.dsp import MelPipeline  # noqa: E402
from vcagan.eval.stoi_np import estoi_np, stoi_np  # noqa: E402
from vcagan.train.models import VCAGANModules  # noqa: E402
from vcagan.train.step import make_eval_step  # noqa: E402

B, T = 2, 20  # video frames; mel frames = 4T = 80; wav = 160*(4T-1)
ML0 = 4 * T
RELTOL = 0.005  # the 0.5% north-star bar


def _speechish(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    x = np.zeros_like(t)
    for f0 in (140.0, 420.0, 980.0, 2100.0):
        am = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(2, 5) * t)
        x += am * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 6)) / f0 ** 0.25
    return (0.7 * x / np.abs(x).max()).astype(np.float32)


def _seeded_angles(shape_torch, seed):
    np.random.seed(seed)
    return np.angle(np.exp(2j * np.pi * np.random.rand(*shape_torch))).astype(
        np.float32
    )


@pytest.fixture(scope="module")
def system():
    """Both composed paths, run once: returns per-sample waveforms and the
    shared ground truth."""
    torch.manual_seed(0)
    real_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU-only image
    with torch.no_grad():
        from src.data.vid_aud_grid import MultiDataset, TacotronSTFT
        from src.models import generator as ref_gen_mod
        from src.models.visual_front import Visual_front

        v_front = Visual_front(in_channels=1).eval()
        gen = ref_gen_mod.Decoder().eval()
        post = ref_gen_mod.Postnet().eval()

        vf_vars = convert_visual_front(v_front.state_dict())
        gen_vars = convert_decoder(gen.state_dict())
        post_vars = convert_postnet(post.state_dict())

        rng = np.random.default_rng(5)
        video = rng.standard_normal((B, 1, T, 112, 112)).astype(np.float32) * 0.5
        vid_len = np.asarray([T, T - 3])
        noise = rng.standard_normal((2, B, 128, 20, T)).astype(np.float32)
        gt_wav = np.stack(
            [_speechish(160 * (ML0 - 1), 100 + b) for b in range(B)]
        )

        # ---- torch composed path (reference test.py:131-148) ----
        draws = iter([torch.from_numpy(noise[0]), torch.from_numpy(noise[1])])
        real_randn = torch.randn
        ref_gen_mod.torch.randn = lambda *s: next(draws)
        try:
            vid_t = torch.from_numpy(video)
            vl_t = torch.from_numpy(vid_len)
            phon, sent = v_front(vid_t)
            g3 = gen(sent, phon, vl_t)[2]
            phon_f, sent_f = v_front(vid_t.flip(4))
            g3_f = gen(sent_f, phon_f, vl_t)[2]
        finally:
            ref_gen_mod.torch.randn = real_randn
        g3_t = (g3 + g3_f) / 2.0
        gs_t = post(g3_t)  # (B, 1, 321, 4T)

        ds = MultiDataset.__new__(MultiDataset)
        stft = TacotronSTFT(640, 160, 640, 80, 16000, 55.0, 7500.0)

        spec_angles = _seeded_angles((B, 321, ML0), seed=42)
        np.random.seed(42)
        wav_spec_t = ds.inverse_spec(gs_t[:, :, :, :ML0], stft)
        mel_angles = _seeded_angles((B, 321, ML0), seed=43)
        np.random.seed(43)
        wav_mel_t = ds.inverse_mel(g3_t[:, :, :, :ML0], stft)
    torch.Tensor.cuda = real_cuda

    # ---- JAX composed path (production entry points) ----
    modules = VCAGANModules.create()
    g_params = {
        "v_front": vf_vars["params"],
        "gen": gen_vars["params"],
        "post": post_vars["params"],
    }
    batch_stats = {
        "v_front": vf_vars.get("batch_stats", {}),
        "gen": gen_vars.get("batch_stats", {}),
        "post": post_vars.get("batch_stats", {}),
    }
    eval_fn = make_eval_step(modules, flip_tta=True)
    g3_j, gs_j = eval_fn(
        g_params,
        batch_stats,
        jnp.asarray(video.transpose(0, 2, 3, 4, 1)),  # B,T,H,W,C
        jnp.asarray(vid_len),
        jax.random.PRNGKey(0),  # unused with explicit noise
        noise=jnp.asarray(noise.transpose(0, 1, 3, 4, 2)),  # 2,B,F,T,C
    )
    pipe = MelPipeline(AudioConfig())
    wav_spec_j = np.asarray(
        pipe.inverse_spec(
            jnp.swapaxes(gs_j, 1, 2)[:, :ML0],
            jax.random.PRNGKey(0),
            init_phase=jnp.asarray(spec_angles.transpose(0, 2, 1)),
        )
    )
    wav_mel_j = np.asarray(
        pipe.inverse_mel(
            jnp.swapaxes(g3_j, 1, 2)[:, :ML0],
            jax.random.PRNGKey(0),
            init_phase=jnp.asarray(mel_angles.transpose(0, 2, 1)),
        )
    )
    return dict(
        gs_t=gs_t.numpy(),
        gs_j=np.asarray(gs_j),
        g3_t=g3_t.numpy(),
        g3_j=np.asarray(g3_j),
        wav_spec_t=np.asarray(wav_spec_t),
        wav_spec_j=wav_spec_j,
        wav_mel_t=np.asarray(wav_mel_t),
        wav_mel_j=wav_mel_j,
        gt_wav=gt_wav,
    )


def _scores(gt, wavs):
    out = []
    for b in range(wavs.shape[0]):
        ref = gt[b][: wavs.shape[1]]
        out.append(
            (stoi_np(ref, wavs[b], 16000), estoi_np(ref, wavs[b], 16000))
        )
    return np.asarray(out)  # (B, 2)


class TestComposedForward:
    def test_postnet_spec_parity(self, system):
        """Flip-TTA composed forward (two v_front+gen passes, g3 mean,
        postnet) stays at module-level tolerance through the composition."""
        np.testing.assert_allclose(
            system["gs_j"], system["gs_t"][:, 0], atol=5e-4, rtol=5e-4
        )
        np.testing.assert_allclose(
            system["g3_j"], system["g3_t"][:, 0], atol=5e-4, rtol=5e-4
        )

    def test_vocoded_waveform_parity(self, system):
        np.testing.assert_allclose(
            system["wav_spec_j"], system["wav_spec_t"], atol=2e-3, rtol=1e-2
        )
        np.testing.assert_allclose(
            system["wav_mel_j"], system["wav_mel_t"], atol=2e-3, rtol=1e-2
        )


def _assert_metric_parity(name, v_torch, v_jax):
    """0.5% relative — with a 5e-4 absolute floor for metrics that sit near
    zero (random weights give near-zero ESTOI, where a pure ratio is
    meaningless).  The floor is 5x tighter than 0.5% of any trained-model
    score (STOI/ESTOI of trained VCA-GAN live in [0.2, 0.75], so the
    relative bound there is >= 1e-3) and sized to the composed waveform
    tolerance (2e-3 absolute) that near-zero ESTOI is sensitive to at the
    ~1e-4 level."""
    delta = abs(v_jax - v_torch)
    bound = max(RELTOL * abs(v_torch), 5e-4)
    print(
        f"{name}: torch={v_torch:.6f} jax={v_jax:.6f} "
        f"delta={delta:.2e} bound={bound:.2e}"
    )
    assert delta <= bound


class TestFinalMetrics:
    """THE number: |STOI_jax - STOI_torch| / STOI_torch <= 0.5%."""

    def test_postnet_path_stoi_estoi(self, system):
        s_t = _scores(system["gt_wav"], system["wav_spec_t"])
        s_j = _scores(system["gt_wav"], system["wav_spec_j"])
        _assert_metric_parity("postnet STOI", s_t.mean(0)[0], s_j.mean(0)[0])
        _assert_metric_parity("postnet ESTOI", s_t.mean(0)[1], s_j.mean(0)[1])

    def test_mel_path_stoi_estoi(self, system):
        s_t = _scores(system["gt_wav"], system["wav_mel_t"])
        s_j = _scores(system["gt_wav"], system["wav_mel_j"])
        _assert_metric_parity("mel STOI", s_t.mean(0)[0], s_j.mean(0)[0])
        _assert_metric_parity("mel ESTOI", s_t.mean(0)[1], s_j.mean(0)[1])

    def test_scores_are_sane(self, system):
        s = _scores(system["gt_wav"], system["wav_spec_t"])
        assert np.isfinite(s).all()


class TestLRSComposed:
    """The LRS composed test path (test_LRS.py:146-165): flip-TTA forward,
    then PER-SAMPLE ``inverse_spec(gs[b, :, :, :mel_len[b]])`` through the
    LRS denormalize chain (log-affine -> exp -> x14) — vs this framework's
    shape-static equivalent (cli/test_lrs.py): batched Griffin-Lim over the
    zero-masked padded spec with per-sample phases injected, trimmed to the
    reference lengths.  The masked-batched vocode is NOT bit-equal to the
    per-sample exact-length one (window overlap couples ~3 boundary
    frames); this test proves the FINAL metric still agrees within the
    0.5% bar."""

    VID_LEN = (20, 15)
    MEL_LEN = (80, 58)

    @pytest.fixture(scope="class")
    def lrs(self):
        torch.manual_seed(1)
        real_cuda = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        with torch.no_grad():
            from src.data.vid_aud_lrs2 import MultiDataset, TacotronSTFT
            from src.models import generator as ref_gen_mod
            from src.models.visual_front import Visual_front

            v_front = Visual_front(in_channels=1).eval()
            gen = ref_gen_mod.Decoder().eval()
            post = ref_gen_mod.Postnet().eval()
            vf_vars = convert_visual_front(v_front.state_dict())
            gen_vars = convert_decoder(gen.state_dict())
            post_vars = convert_postnet(post.state_dict())

            rng = np.random.default_rng(9)
            t_max = max(self.VID_LEN)
            video = rng.standard_normal((B, 1, t_max, 112, 112)).astype(
                np.float32
            ) * 0.5
            # zero frames past each clip's true length, like padded batches
            for b, l in enumerate(self.VID_LEN):
                video[b, :, l:] = 0.0
            vid_len = np.asarray(self.VID_LEN)
            mel_len = np.asarray(self.MEL_LEN)
            noise = rng.standard_normal((2, B, 128, 20, t_max)).astype(np.float32)
            gt_wav = np.stack(
                [_speechish(160 * (4 * t_max - 1), 200 + b) for b in range(B)]
            )

            draws = iter([torch.from_numpy(noise[0]), torch.from_numpy(noise[1])])
            real_randn = torch.randn
            ref_gen_mod.torch.randn = lambda *s: next(draws)
            try:
                vid_t = torch.from_numpy(video)
                vl_t = torch.from_numpy(vid_len)
                phon, sent = v_front(vid_t)
                g3 = gen(sent, phon, vl_t)[2]
                phon_f, sent_f = v_front(vid_t.flip(4))
                g3_f = gen(sent_f, phon_f, vl_t)[2]
            finally:
                ref_gen_mod.torch.randn = real_randn
            g3_t = (g3 + g3_f) / 2.0
            gs_t = post(g3_t)  # (B, 1, 321, 4*t_max)

            ds = MultiDataset.__new__(MultiDataset)
            stft = TacotronSTFT(640, 160, 640, 80, 16000, 55.0, 7600.0)

            # reference: per-sample exact-length Griffin-Lim with its own
            # seeded phase draw (test_LRS.py:160-161)
            wavs_t, angles = [], []
            for b in range(B):
                lb = int(mel_len[b])
                ang = _seeded_angles((1, 321, lb), seed=50 + b)
                angles.append(ang)
                np.random.seed(50 + b)
                wavs_t.append(ds.inverse_spec(gs_t[b, :, :, :lb], stft)[0])
        torch.Tensor.cuda = real_cuda

        # ---- JAX: the CLI's shape-static masked-batched equivalent ----
        from vcagan.data.lrs import lrs_denormalize_spec

        modules = VCAGANModules.create()
        g_params = {
            "v_front": vf_vars["params"],
            "gen": gen_vars["params"],
            "post": post_vars["params"],
        }
        batch_stats = {
            "v_front": vf_vars.get("batch_stats", {}),
            "gen": gen_vars.get("batch_stats", {}),
            "post": post_vars.get("batch_stats", {}),
        }
        eval_fn = make_eval_step(modules, flip_tta=True)
        g3_j, gs_j = eval_fn(
            g_params,
            batch_stats,
            jnp.asarray(video.transpose(0, 2, 3, 4, 1)),
            jnp.asarray(vid_len),
            jax.random.PRNGKey(0),
            noise=jnp.asarray(noise.transpose(0, 1, 3, 4, 2)),
        )
        spec = lrs_denormalize_spec(jnp.swapaxes(gs_j, 1, 2))  # (B, 4T, 321)
        frame_ok = np.arange(spec.shape[1])[None, :] < mel_len[:, None]
        spec = jnp.where(jnp.asarray(frame_ok)[:, :, None], spec, 0.0)
        # per-sample reference phases packed into the padded batch; the
        # masked (zero-magnitude) region's phase is irrelevant
        phase = np.zeros((B, spec.shape[1], 321), np.float32)
        for b in range(B):
            phase[b, : mel_len[b]] = angles[b][0].T
        pipe = MelPipeline(AudioConfig(f_max=7600.0))
        wav_j = np.asarray(
            pipe.inverse_spec(
                spec, jax.random.PRNGKey(0), init_phase=jnp.asarray(phase)
            )
        )
        return dict(
            gs_t=gs_t.numpy(), gs_j=np.asarray(gs_j),
            wavs_t=wavs_t, wav_j=wav_j, gt_wav=gt_wav, mel_len=mel_len,
        )

    def test_forward_parity(self, lrs):
        np.testing.assert_allclose(
            lrs["gs_j"], lrs["gs_t"][:, 0], atol=5e-4, rtol=5e-4
        )

    def test_final_metrics_within_bar(self, lrs):
        """Reference scores stoi(wav_tr[:min_len], wav_spec) per sample
        (test_LRS.py:162-164); ours trimmed to the same lengths."""
        for b in range(B):
            wav_t = np.asarray(lrs["wavs_t"][b])
            n = len(wav_t)
            wav_j = lrs["wav_j"][b, :n]
            ref = lrs["gt_wav"][b][:n]
            _assert_metric_parity(
                f"LRS clip{b} STOI", stoi_np(ref, wav_t, 16000),
                stoi_np(ref, wav_j, 16000),
            )
            _assert_metric_parity(
                f"LRS clip{b} ESTOI", estoi_np(ref, wav_t, 16000),
                estoi_np(ref, wav_j, 16000),
            )
