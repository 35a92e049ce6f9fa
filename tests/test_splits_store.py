"""The L5 split/metadata store ships with the repo.

A fresh checkout must resolve real-corpus file lists with zero manual
copying (reference consumes these files at vid_aud_grid.py:40-92 and
vid_aud_lrs3.py:27-85).  These tests fabricate a corpus tree against the
VENDORED split lists in ``<repo>/data`` and check every subject mode
resolves through ``vcagan.data.splits`` / ``LRSClipSource``.
"""

import os
import shutil

import pytest

from vcagan.data.splits import grid_file_list, lrs_file_list

REPO_DATA = os.path.join(os.path.dirname(__file__), "..", "data")


def _read_lines(name, limit=None):
    with open(os.path.join(REPO_DATA, name)) as f:
        lines = [l.strip() for l in f if l.strip()]
    return lines[:limit] if limit else lines


class TestVendoredLists:
    def test_all_grid_lists_ship(self):
        for name in (
            "overlap_train.txt",
            "overlap_val.txt",
            "unseen_splits.txt",
            "train_4.txt",
            "val_4.txt",
            "test_4.txt",
        ):
            assert os.path.exists(os.path.join(REPO_DATA, name)), name

    def test_lrs3_lists_ship(self):
        for mode in ("train", "val", "test"):
            path = os.path.join(REPO_DATA, "LRS3", f"lrs3_unseen_{mode}.txt")
            assert os.path.exists(path), path

    def test_list_sizes_match_reference(self):
        # counts pinned from the reference data/ tree (SURVEY.md L5)
        assert len(_read_lines("overlap_train.txt")) == 24407
        assert len(_read_lines("overlap_val.txt")) == 8415
        assert len(_read_lines("unseen_splits.txt")) == 32870
        assert len(_read_lines("train_4.txt")) == 3586
        assert len(_read_lines(os.path.join("LRS3", "lrs3_unseen_test.txt"))) == 1308


class TestGridResolution:
    """grid_file_list against a fabricated corpus rooted at tmp_path."""

    def test_overlap_mapping(self, tmp_path):
        files = grid_file_list(str(tmp_path), "train", "overlap", REPO_DATA)
        first = _read_lines("overlap_train.txt", 1)[0]
        expect = os.path.join(
            str(tmp_path), first.replace("mpg_6000/", "") + ".mp4"
        )
        assert files[0] == expect
        assert len(files) == 24407

    def test_overlap_val_serves_test(self, tmp_path):
        val = grid_file_list(str(tmp_path), "val", "overlap", REPO_DATA)
        test = grid_file_list(str(tmp_path), "test", "overlap", REPO_DATA)
        assert val == test and len(val) == 8415

    def test_unseen_checks_existence(self, tmp_path):
        # fabricate the first three val-mode clips; only they may resolve
        made = []
        for line in _read_lines("unseen_splits.txt"):
            if not line.startswith("val/"):
                continue
            _, sub, fname = line.split("/")
            p = tmp_path / sub / "video" / f"{fname}.mp4"
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_bytes(b"x")
            made.append(str(p))
            if len(made) == 3:
                break
        files = grid_file_list(str(tmp_path), "val", "unseen", REPO_DATA)
        assert sorted(files) == sorted(made)

    def test_four_and_single_subject(self, tmp_path):
        all4 = grid_file_list(str(tmp_path), "train", "four", REPO_DATA)
        s1 = grid_file_list(str(tmp_path), "train", "s1", REPO_DATA)
        assert len(all4) == 3586
        assert 0 < len(s1) < len(all4)
        assert all("/s1/" in f or f.split(os.sep)[-3] == "s1" for f in s1)


class TestLRWClassList:
    """The LRW 500-word vocabulary ships with the repo (reference:
    ASR_model/LRW/data/class.txt, consumed by ASR_model/LRW/test.py) so the
    CLI default ``--class_list ./data/class.txt`` works on a fresh checkout."""

    def test_class_list_ships_with_500_words(self):
        from vcagan.eval.asr_lrw import load_class_list

        classes = load_class_list(os.path.join(REPO_DATA, "class.txt"))
        assert len(classes) == 500
        assert classes[0] == "ABOUT"
        assert classes[-1] == "YOUNG"
        assert len(set(classes)) == 500

    def test_cli_reaches_scoring_with_vendored_list(self, tmp_path, capsys):
        """asr_lrw CLI end to end: vendored vocabulary + synthetic npz dump
        -> a printed accuracy line (random weights, so only finiteness)."""
        import numpy as np

        from vcagan.cli.asr_lrw import main

        fix = tmp_path / "ABOUT" / "test"
        fix.mkdir(parents=True)
        rng = np.random.default_rng(0)
        mel = np.clip(rng.standard_normal((1, 80, 116)), -1, 1).astype(np.float32)
        np.savez(fix / "ABOUT_00001.npz", mel=mel)

        main(
            [
                "--data", str(tmp_path),
                "--class_list", os.path.join(REPO_DATA, "class.txt"),
                "--batch_size", "2",
            ]
        )
        out = capsys.readouterr().out
        assert "test_ACC:" in out


class TestLRS3Resolution:
    def test_crop_join(self, tmp_path):
        """LRS3 file lists join the vendored splits against crop tables."""
        from vcagan.configs import DataConfig
        from vcagan.data.lrs import LRSClipSource

        splits = tmp_path / "splits"
        (splits / "LRS3" / "LRS3_crop").mkdir(parents=True)
        for mode in ("train", "val", "test"):
            shutil.copy(
                os.path.join(REPO_DATA, "LRS3", f"lrs3_unseen_{mode}.txt"),
                splits / "LRS3" / f"lrs3_unseen_{mode}.txt",
            )
        # fabricate crop tables covering the first two test-mode entries
        entries = _read_lines(os.path.join("LRS3", "lrs3_unseen_test.txt"), 2)
        rows = []
        for e in entries:
            part, rel = e.split("/", 1)
            assert part == "test"
            rows.append(f"{rel}.mp4 100/120/" + "/".join(["100", "120"] * 3))
        (splits / "LRS3" / "LRS3_crop" / "preprocess_test.txt").write_text(
            "\n".join(rows)
        )
        for part in ("pretrain", "trainval"):
            (splits / "LRS3" / "LRS3_crop" / f"preprocess_{part}.txt").write_text("")

        cfg = DataConfig(dataset="LRS3", data_root=str(tmp_path / "corpus"))
        src = LRSClipSource(cfg, "test", str(splits))
        assert src.files == entries
        assert all(e in src.crops for e in entries)

    def test_lrs_file_list_partitions(self):
        entries = lrs_file_list("/corpus", "LRS3", "test", REPO_DATA)
        assert entries[0][0].startswith("test/")
