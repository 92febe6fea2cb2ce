"""cSEBB post-processing: change-point boxes, merging, PSDS integration."""

import numpy as np

from transformer4sed_tpu.eval.scores import ClipScores
from transformer4sed_tpu.eval.sebbs import (
    CSEBBParams,
    apply_csebbs,
    csebbs_1d,
    csebbs_clip,
    sebbs_to_events,
    tune_csebbs,
)


def _clip(scores, dur=10.0, classes=("a",)):
    scores = np.asarray(scores, dtype=np.float64)
    if scores.ndim == 1:
        scores = scores[:, None]
    t = scores.shape[0]
    ts = np.linspace(0.0, dur, t + 1)
    return ClipScores(scores, ts, classes)


class TestCSEBB1D:
    def test_clean_box_recovered(self):
        s = np.zeros(100)
        s[30:60] = 0.9
        boxes = csebbs_1d(s, frames_per_second=10.0, params=CSEBBParams())
        # one high-confidence box near [30, 60), background elsewhere
        high = [b for b in boxes if b[2] > 0.5]
        assert len(high) == 1
        a, b, v = high[0]
        assert abs(a - 30) <= 3 and abs(b - 60) <= 3
        assert 0.8 <= v <= 0.95

    def test_noisy_box_confidence_is_mean(self):
        rng = np.random.RandomState(0)
        s = np.clip(0.05 + 0.02 * rng.randn(200), 0, 1)
        s[80:140] = np.clip(0.8 + 0.05 * rng.randn(60), 0, 1)
        boxes = csebbs_1d(s, 20.0, CSEBBParams())
        high = max(boxes, key=lambda b: b[2])
        a, b, v = high
        assert abs(a - 80) <= 5 and abs(b - 140) <= 5
        assert abs(v - s[a:b].mean()) < 1e-9

    def test_similar_segments_merge(self):
        s = np.concatenate([np.full(50, 0.70), np.full(50, 0.72)])
        boxes = csebbs_1d(s, 10.0, CSEBBParams(merge_threshold_abs=0.15))
        assert len(boxes) == 1
        assert abs(boxes[0][2] - 0.71) < 1e-9

    def test_distinct_segments_survive(self):
        s = np.concatenate([np.full(50, 0.1), np.full(50, 0.9)])
        boxes = csebbs_1d(
            s, 10.0, CSEBBParams(merge_threshold_abs=0.05, merge_threshold_rel=0.1)
        )
        assert len(boxes) == 2

    def test_empty_and_constant(self):
        assert csebbs_1d(np.zeros(0), 10.0, CSEBBParams()) == []
        boxes = csebbs_1d(np.full(64, 0.3), 10.0, CSEBBParams())
        assert len(boxes) == 1
        assert boxes[0][:2] == (0, 64)


class TestClipAndEvents:
    def test_piecewise_constant_output(self):
        rng = np.random.RandomState(1)
        s = np.clip(0.1 + 0.05 * rng.randn(156, 3), 0, 1)
        s[40:90, 1] += 0.7
        clip = _clip(s, classes=("a", "b", "c"))
        out = csebbs_clip(clip)
        assert out.scores.shape == clip.scores.shape
        assert np.array_equal(out.timestamps, clip.timestamps)
        # piecewise constant: few unique values per class
        for c in range(3):
            assert len(np.unique(out.scores[:, c])) <= 10

    def test_events_at_threshold(self):
        s = np.zeros(100)
        s[20:50] = 0.9
        s[70:80] = 0.4
        clip = _clip(s)
        ev = sebbs_to_events(clip, threshold=0.5)
        assert len(ev) == 1
        label, on, off, conf = ev[0]
        assert label == "a" and conf > 0.8
        assert abs(on - 2.0) < 0.4 and abs(off - 5.0) < 0.4
        ev2 = sebbs_to_events(clip, threshold=0.3)
        assert len(ev2) == 2

    def test_per_class_params(self):
        s = np.concatenate([np.full(50, 0.70), np.full(50, 0.72)])
        clip = _clip(np.stack([s, s], axis=1), classes=("merge", "keep"))
        params = {
            "merge": CSEBBParams(merge_threshold_abs=0.15),
            "keep": CSEBBParams(merge_threshold_abs=1e-6, merge_threshold_rel=1e-6),
        }
        out = csebbs_clip(clip, params)
        assert len(np.unique(out.scores[:, 0])) == 1
        assert len(np.unique(out.scores[:, 1])) == 2


class TestPSDSIntegration:
    def _dataset(self, n=8):
        rng = np.random.RandomState(7)
        scores, gt, durations = {}, {}, {}
        for i in range(n):
            s = np.clip(0.15 + 0.1 * rng.randn(156), 0, 1)
            a, b = 40 + rng.randint(-5, 5), 110 + rng.randint(-5, 5)
            s[a:b] = np.clip(0.75 + 0.1 * rng.randn(b - a), 0, 1)
            cid = f"clip{i}"
            scores[cid] = _clip(s)
            ts = scores[cid].timestamps
            gt[cid] = [(float(ts[a]), float(ts[b]), "a")]
            durations[cid] = 10.0
        return scores, gt, durations

    def test_sebb_improves_noisy_psds(self):
        from transformer4sed_tpu.eval.psds import compute_psds_from_scores

        scores, gt, durations = self._dataset()
        kw = dict(dtc_threshold=0.7, gtc_threshold=0.7, alpha_st=0.0)
        raw, _ = compute_psds_from_scores(scores, gt, durations, **kw)
        post, _ = compute_psds_from_scores(apply_csebbs(scores), gt, durations, **kw)
        assert post >= raw

    def test_tune_returns_params(self):
        scores, gt, durations = self._dataset(4)
        params, best = tune_csebbs(
            scores, gt, durations,
            step_filter_lengths=(0.48,),
            merge_thresholds_abs=(0.15,),
            merge_thresholds_rel=(1.5, 3.0),
            per_class=True,
        )
        assert "a" in params
        assert best > 0


class TestFilterKindValidation:
    def test_unknown_kind_raises(self):
        import jax.numpy as jnp
        import pytest

        from transformer4sed_tpu.core.filters import apply_class_filter

        with pytest.raises(ValueError, match="unknown filter kind"):
            apply_class_filter(jnp.zeros((2, 10, 3)), 5, kind="bogus")


class TestPartitionProperty:
    def test_boxes_tile_the_clip(self):
        # cSEBB output must partition [0, T) for any input
        rng = np.random.RandomState(3)
        for trial in range(20):
            t = rng.randint(2, 300)
            s = np.clip(rng.randn(t) * 0.3 + 0.3, 0, 1)
            boxes = csebbs_1d(s, 10.0, CSEBBParams(
                step_filter_length=float(rng.choice([0.16, 0.48, 1.0])),
                merge_threshold_abs=float(rng.uniform(0, 0.3)),
                merge_threshold_rel=float(rng.uniform(1.0, 3.0)),
            ))
            assert boxes[0][0] == 0 and boxes[-1][1] == t
            for (a1, b1, _), (a2, b2, _) in zip(boxes, boxes[1:]):
                assert b1 == a2, "boxes must be contiguous"
            for a, b, v in boxes:
                assert b > a and 0.0 <= v <= 1.0


class TestRelativeMergeRegression:
    def test_rel_qualifying_pair_merges_despite_distant_min_pair(self):
        # regression: the most-similar pair (0.01 vs 0.2) fails both
        # criteria, but (0.5, 0.75) qualifies relatively (ratio 1.5) and
        # must still merge — the loop may not stop at the first failure.
        from transformer4sed_tpu.eval.sebbs import _merge_segments

        bounds = np.array([0, 10, 20, 30, 40])
        scores = [0.01, 0.2, 0.5, 0.75]
        out_bounds, out_scores = _merge_segments(bounds, scores, abs_thr=0.15, rel_thr=1.5)
        assert len(out_scores) == 3
        assert abs(out_scores[-1] - 0.625) < 1e-9  # length-weighted mean
        assert list(out_bounds) == [0, 10, 20, 40]
