"""Tests: score containers/ensemble, statistics, visualization, submissions."""

import os

import numpy as np
import pandas as pd
import pytest

from transformer4sed_tpu.eval.postprocess import (
    ScoreContainer,
    load_score_tables,
    score_average,
    weighted_average_ensemble,
)
from transformer4sed_tpu.eval.scores import ClipScores
from transformer4sed_tpu.utils.statistics import ProbMeanValue, count_parameters
from transformer4sed_tpu.utils.submissions import resample_tree, validate_submission_scores

CLASSES = ("a", "b")


def make_clip(v, t=10):
    return ClipScores(np.full((t, 2), v, np.float32), np.arange(t + 1.0), CLASSES)


class TestScoreContainer:
    def test_reload_events(self):
        c1 = ScoreContainer(CLASSES, {"f1": make_clip(0.2)})
        c2 = ScoreContainer(CLASSES, {"f1": make_clip(0.8)})
        c1.reload_events(["a"], c2)
        np.testing.assert_allclose(c1.scores["f1"].scores[:, 0], 0.8)
        np.testing.assert_allclose(c1.scores["f1"].scores[:, 1], 0.2)

    def test_score_average(self):
        c1 = ScoreContainer(CLASSES, {"f1": make_clip(0.2)})
        c2 = ScoreContainer(CLASSES, {"f1": make_clip(0.6)})
        avg = score_average(["a", "b"], [c1, c2])
        np.testing.assert_allclose(avg.scores["f1"].scores, 0.4, atol=1e-6)
        # inputs untouched
        np.testing.assert_allclose(c1.scores["f1"].scores, 0.2)


class TestEnsemble:
    def test_weighted_average_with_interp(self):
        t1 = np.concatenate([np.arange(10)[:, None], np.arange(1, 11)[:, None],
                             np.full((10, 2), 0.2)], axis=1)
        t2 = np.concatenate([np.arange(5)[:, None] * 2, np.arange(1, 6)[:, None] * 2,
                             np.full((5, 2), 0.6)], axis=1)
        out = weighted_average_ensemble({"x.tsv": [t1, t2]}, weights=[0.5, 0.5])
        table = out["x.tsv"]
        assert table.shape == (10, 4)
        np.testing.assert_allclose(table[:, 2:], 0.4, atol=1e-6)
        # timestamps from the longest table
        np.testing.assert_allclose(table[:, 0], np.arange(10))

    def test_load_and_roundtrip(self, tmp_path):
        for model in ("m1", "m2"):
            os.makedirs(tmp_path / model)
            pd.DataFrame(
                {"onset": [0.0], "offset": [1.0], "a": [0.5], "b": [0.1]}
            ).to_csv(tmp_path / model / "clip.tsv", sep="\t", index=False)
        tables = load_score_tables([str(tmp_path / "m1"), str(tmp_path / "m2")])
        assert set(tables) == {"clip.tsv"}
        assert len(tables["clip.tsv"]) == 2

    def test_load_rejects_mismatched_file_sets(self, tmp_path):
        """A typo'd model folder (different/empty TSV set) fails loudly
        (reference ensemble.py:14-19), never a silent partial ensemble."""
        os.makedirs(tmp_path / "m1")
        os.makedirs(tmp_path / "m2_typo")
        pd.DataFrame(
            {"onset": [0.0], "offset": [1.0], "a": [0.5]}
        ).to_csv(tmp_path / "m1" / "clip.tsv", sep="\t", index=False)
        with pytest.raises(ValueError, match="different TSV set"):
            load_score_tables([str(tmp_path / "m1"), str(tmp_path / "m2_typo")])


class TestStatistics:
    def test_count_parameters(self):
        params = {"a": np.zeros((3, 4)), "b": {"c": np.zeros(5)}}
        assert count_parameters(params) == 17
        labels = {"a": "frozen", "b": {"c": "head"}}
        assert count_parameters(params, labels) == 5

    def test_prob_mean_value(self):
        pm = ProbMeanValue(n_bins=10, class_num=2)
        preds = np.array([[[0.9, 0.9], [0.1, 0.1]]])  # [1, 2, 2]
        labels = np.array([[[1.0, 1.0], [0.0, 0.0]]])
        weak_preds = np.array([[0.8, 0.2]])
        weak_labels = np.array([[1.0, 0.0]])
        pm.update_buffer(preds, labels, weak_preds, weak_labels)
        mp = pm.compute_mean_prob()
        assert mp.strong_pos_mean[0] == pytest.approx(0.9)
        assert mp.strong_neg_mean[1] == pytest.approx(0.1)
        assert mp.weak_pos_mean[0] == pytest.approx(0.8)
        # histogram counts land in the right bins
        assert pm.hist["strong_pos"][0][9] == 2  # two 0.9s (both time steps of class 0)


class TestSubmissions:
    def test_validator_accepts_good(self, tmp_path):
        from transformer4sed_tpu.utils.submissions import DESED_CLASSES

        df = pd.DataFrame({"onset": [0.0], "offset": [1.0], **{c: [0.5] for c in DESED_CLASSES}})
        df.to_csv(tmp_path / "clip.tsv", sep="\t", index=False)
        assert validate_submission_scores(str(tmp_path)) == []

    def test_validator_flags_problems(self, tmp_path):
        df = pd.DataFrame({"onset": [1.0], "offset": [0.5], "a": [1.5]})
        df.to_csv(tmp_path / "bad.tsv", sep="\t", index=False)
        problems = validate_submission_scores(str(tmp_path), expected_classes=("a",))
        assert any("offset < onset" in p for p in problems)
        assert any("outside" in p for p in problems)

    def test_resample_tree(self, tmp_path):
        from scipy.io import wavfile

        src = tmp_path / "in" / "sub"
        os.makedirs(src)
        wavfile.write(str(src / "x.wav"), 16000, (np.random.RandomState(0).randn(16000) * 1000).astype(np.int16))
        n = resample_tree(str(tmp_path / "in"), str(tmp_path / "out"), 8000, verbose=False)
        assert n == 1
        sr, wav = wavfile.read(str(tmp_path / "out" / "sub" / "x.wav"))
        assert sr == 8000 and abs(len(wav) - 8000) < 10


class TestVisualization:
    def test_plots_save(self, tmp_path):
        from transformer4sed_tpu.utils import visualization as viz

        viz.plot_waveform(np.random.randn(1000), 16000, path=str(tmp_path / "w.png"))
        viz.plot_spectrogram(np.random.rand(64, 100), path=str(tmp_path / "s.png"))
        viz.plot_events([(0.5, 1.5, "a")], ["a", "b"], 10.0, path=str(tmp_path / "e.png"))
        viz.plot_prediction_grid(
            np.random.rand(2, 100), ["a", "b"], 10.0,
            ground_truth=[(1.0, 2.0, "a")], path=str(tmp_path / "p.png"),
        )
        viz.plot_psd_roc(np.linspace(0, 100, 10), np.linspace(0, 1, 10), 0.5, str(tmp_path / "r.png"))
        for f in ("w.png", "s.png", "e.png", "p.png", "r.png"):
            assert (tmp_path / f).exists()
