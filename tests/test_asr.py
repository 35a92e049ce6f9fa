"""ASR evaluation stack: decode/WER logic, model shapes, end-to-end eval."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcagan.eval.asr_models import GridASR, LRWClassifier
from vcagan.eval.text import (
    collapse_prediction,
    greedy_decode_batch,
    levenshtein,
    tokens_to_text,
    wer_cer,
)


class TestText:
    def test_levenshtein(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein(["a", "b"], ["a", "c", "b"]) == 1
        assert levenshtein("", "abc") == 3

    def test_collapse(self):
        # repeated chars collapse, blanks removed, spaces squeezed
        assert collapse_prediction("HH__EE LL__LLOO") == "HE LLO"
        assert collapse_prediction("A   B") == "A B"

    def test_wer_cer_perfect(self):
        w, c = wer_cer("PLACE BLUE AT A ZERO NOW", "PLACE BLUE AT A ZERO NOW")
        assert w == 0.0 and c == 0.0

    def test_wer_counts_words(self):
        w, _ = wer_cer("PLACE BLUE AT", "PLACE RED AT")
        assert abs(w - 1 / 3) < 1e-9

    def test_greedy_decode_batch(self):
        # build logits that spell "AB" with blanks/repeats: _AA_B
        vocab = 28
        idx = [0, 2, 2, 0, 3]  # '_','A','A','_','B'
        logits = np.full((1, len(idx), vocab), -10.0, np.float32)
        for t, i in enumerate(idx):
            logits[0, t, i] = 10.0
        wer, cer, pairs = greedy_decode_batch(jnp.asarray(logits), ["AB"])
        assert pairs[0][1] == "AB"
        assert wer == 0.0 and cer == 0.0


class TestASRModels:
    def test_grid_asr_shapes(self):
        model = GridASR()
        mel = jnp.zeros((2, 80, 300, 1))
        variables = model.init({"params": jax.random.PRNGKey(0)}, mel, train=False)
        logits = model.apply(variables, mel, train=False)
        assert logits.shape == (2, 75, 28)

    def test_lrw_classifier_shapes(self):
        model = LRWClassifier(num_classes=500)
        mel = jnp.zeros((2, 80, 116, 1))
        variables = model.init({"params": jax.random.PRNGKey(0)}, mel, train=False)
        logits = model.apply(variables, mel, train=False)
        assert logits.shape == (2, 500)


class TestEndToEndEval:
    def test_grid_eval_on_generated_fixtures(self, tmp_path):
        """Full asr_grid.evaluate path on synthetic npz + align files."""
        from vcagan.eval.asr_grid import evaluate

        # generated mel artifacts
        data_dir = tmp_path / "spec_mel" / "s1"
        data_dir.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for name in ("bbaf2n", "bgwi8a"):
            mel = np.clip(rng.standard_normal((1, 80, 280)), -1, 1).astype(np.float32)
            np.savez(data_dir / f"{name}.npz", mel=mel, spec=mel)

        # ground-truth aligns
        gt = tmp_path / "gt" / "s1" / "align"
        gt.mkdir(parents=True)
        for name in ("bbaf2n", "bgwi8a"):
            with open(gt / f"{name}.align", "w") as f:
                f.write("0 100 SIL\n100 200 place\n200 300 blue\n300 400 SIL\n")

        model = GridASR()
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 80, 300, 1)), train=False
        )
        wer, cer = evaluate(
            str(tmp_path / "spec_mel"), str(tmp_path / "gt"), variables,
            batch_size=2,
        )
        # untrained model: garbage output, but valid finite rates
        assert np.isfinite(wer) and np.isfinite(cer)
        assert wer > 0

    def test_lrw_eval_on_generated_fixtures(self, tmp_path):
        from vcagan.eval.asr_lrw import evaluate

        data_dir = tmp_path / "ABOUT" / "test"
        data_dir.mkdir(parents=True)
        rng = np.random.default_rng(1)
        mel = np.clip(rng.standard_normal((1, 80, 116)), -1, 1).astype(np.float32)
        np.savez(data_dir / "ABOUT_00001.npz", mel=mel)

        classes = ["ABOUT", "ABSOLUTELY", "ACCESS"]
        model = LRWClassifier(num_classes=3)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 80, 116, 1)), train=False
        )
        acc, wer = evaluate(str(tmp_path), classes, variables, batch_size=2)
        assert 0.0 <= acc <= 1.0
        assert abs(acc + wer - 1.0) < 1e-9
