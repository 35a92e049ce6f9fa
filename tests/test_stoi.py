"""STOI/ESTOI: JAX batched implementation vs the numpy oracle + sanity."""

import jax.numpy as jnp
import numpy as np
import pytest

from vcagan.eval import estoi_np, stoi_batch, stoi_np


def speechlike(n, seed, sr=16000):
    """Modulated multi-harmonic signal with pauses (exercises the silent-
    frame removal)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    f0 = 120 + 40 * rng.random()
    env = np.clip(np.sin(2 * np.pi * 2.5 * t) + 0.3, 0, None)
    env[: n // 8] = 0.0  # leading silence
    sig = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in range(1, 6))
    return (env * sig * 0.2).astype(np.float32)


class TestOracleSanity:
    def test_identity_is_one(self):
        x = speechlike(32000, 0)
        assert stoi_np(x, x) > 0.99
        assert estoi_np(x, x) > 0.99

    def test_noise_is_low(self):
        x = speechlike(32000, 0)
        noise = np.random.default_rng(1).standard_normal(len(x)).astype(np.float32)
        assert stoi_np(x, noise) < 0.35
        assert estoi_np(x, noise) < 0.25

    def test_monotonic_in_snr(self):
        x = speechlike(32000, 2)
        rng = np.random.default_rng(3)
        noise = rng.standard_normal(len(x)).astype(np.float32) * x.std()
        scores = [stoi_np(x, x + g * noise) for g in (0.1, 0.5, 2.0)]
        assert scores[0] > scores[1] > scores[2], scores


class TestJaxParity:
    @pytest.mark.parametrize("extended", [False, True])
    def test_matches_oracle(self, extended):
        xs = np.stack([speechlike(24000, s) for s in range(3)])
        rng = np.random.default_rng(9)
        ys = xs + 0.3 * rng.standard_normal(xs.shape).astype(np.float32) * xs.std()

        got = np.asarray(
            stoi_batch(jnp.asarray(xs), jnp.asarray(ys), extended=extended)
        )
        want = np.asarray(
            [
                (estoi_np if extended else stoi_np)(xs[i], ys[i], fs=16000)
                for i in range(3)
            ]
        )
        # f32 device vs f64 oracle: agreement far inside the 0.5%-parity bar
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_resampler_matches_scipy_polyphase(self):
        """The on-device dilated-conv resampler == scipy resample_poly with
        pystoi's Octave window, sample for sample."""
        from vcagan.eval.stoi import _resample_16k_to_10k
        from vcagan.eval.stoi_np import resample_oct

        x = np.stack([speechlike(12800, s) for s in range(2)])
        got = np.asarray(_resample_16k_to_10k(jnp.asarray(x)))
        want = np.stack([resample_oct(x[i].astype(np.float64), 5, 8) for i in range(2)])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want.astype(np.float32), atol=2e-5)

    def test_too_short_returns_1e5(self):
        """pystoi returns 1e-5 (not NaN) below 30 band frames; both paths."""
        x = speechlike(3000, 4)
        assert stoi_np(x, x, fs=16000) == pytest.approx(1e-5)
        got = np.asarray(stoi_batch(jnp.asarray(x[None]), jnp.asarray(x[None])))
        assert got[0] == pytest.approx(1e-5)

    def test_golden_values(self):
        """Frozen oracle outputs for fixed synthetic pairs: any silent
        algorithm drift (band matrix, resampler, framing, silence removal)
        trips this even if oracle and JAX port drift together."""
        xs = np.stack([speechlike(24000, s) for s in range(3)])
        rng = np.random.default_rng(9)
        ys = xs + 0.3 * rng.standard_normal(xs.shape).astype(np.float32) * xs.std()
        golden_stoi = [0.564947, 0.567525, 0.553476]
        golden_estoi = [0.088189, 0.110158, 0.127170]
        for i in range(3):
            assert stoi_np(xs[i], ys[i], fs=16000) == pytest.approx(
                golden_stoi[i], abs=1e-5
            )
            assert estoi_np(xs[i], ys[i], fs=16000) == pytest.approx(
                golden_estoi[i], abs=1e-5
            )

    def test_batched_identity(self):
        xs = np.stack([speechlike(16000, s) for s in range(2)])
        got = np.asarray(stoi_batch(jnp.asarray(xs), jnp.asarray(xs)))
        assert (got > 0.98).all()

    @pytest.mark.parametrize("extended", [False, True])
    def test_lengths_match_trimmed_oracle(self, extended):
        """Variable-length batch: zero-padded signals + ``lengths`` must
        score exactly like the oracle on the TRIMMED signals — including
        the boundary frame at true_len-256 that pystoi's exclusive framing
        drops (the LRS eval-driver deviation the lengths arg eliminates)."""
        max_len = 24000
        # full-length, frame-aligned, and non-aligned true lengths
        true_lens = np.array([24000, 16640, 12345])
        xs = np.zeros((3, max_len), np.float32)
        ys = np.zeros((3, max_len), np.float32)
        rng = np.random.default_rng(11)
        for i, l in enumerate(true_lens):
            x = speechlike(int(l), i + 20)
            xs[i, :l] = x
            ys[i, :l] = x + 0.3 * rng.standard_normal(int(l)).astype(
                np.float32
            ) * x.std()

        got = np.asarray(
            stoi_batch(
                jnp.asarray(xs),
                jnp.asarray(ys),
                extended=extended,
                lengths=jnp.asarray(true_lens),
            )
        )
        oracle = estoi_np if extended else stoi_np
        want = np.asarray(
            [
                oracle(xs[i, : true_lens[i]], ys[i, : true_lens[i]], fs=16000)
                for i in range(3)
            ]
        )
        np.testing.assert_allclose(got, want, atol=1e-3)


class TestCombinedProgram:
    def test_stoi_estoi_batch_matches_separate(self):
        """stoi_estoi_batch fuses the shared front end into one program
        (one dispatch, one readback — the LRS-scale eval spends ~40% of
        its wall in separate STOI+ESTOI calls); it must return exactly
        what the two stoi_batch programs return."""
        import jax.numpy as jnp

        from vcagan.eval.stoi import stoi_batch, stoi_estoi_batch

        rng = np.random.default_rng(0)
        clean = jnp.asarray(rng.standard_normal((3, 24000)), jnp.float32)
        deg = clean + 0.3 * jnp.asarray(
            rng.standard_normal((3, 24000)), jnp.float32
        )
        lens = jnp.asarray([24000, 18000, 9000])
        for lengths in (None, lens):
            s, e = stoi_estoi_batch(clean, deg, lengths=lengths)
            s_ref = stoi_batch(clean, deg, lengths=lengths)
            e_ref = stoi_batch(clean, deg, extended=True, lengths=lengths)
            np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)
            np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref), rtol=1e-6)
