"""Eval layer tests: decoding, score containers, PSDS, F1 metrics."""

import numpy as np
import jax.numpy as jnp
import pytest

from transformer4sed_tpu.core.codec import LabelCodec
from transformer4sed_tpu.eval import (
    ClipScores,
    batched_decode_preds,
    compute_psds_from_scores,
    decode_pred_batch,
    event_based_f1,
    intersection_macro_f1,
    segment_based_f1,
    segment_scores_overlap_add,
)
from transformer4sed_tpu.eval.psds import compute_psd_roc
from transformer4sed_tpu.eval.scores import get_segment_scores, merge_overlapping_events

CLASSES = ("cat", "dog")


def make_codec():
    return LabelCodec(labels=CLASSES, audio_len=10.0, frame_len=1024, frame_hop=320, sr=32000)


def perfect_scores(codec, events_per_clip):
    """Scores = 1 inside GT events, 0 elsewhere."""
    out = {}
    for clip_id, events in events_per_clip.items():
        grid = codec.encode_strong(events_to_codec(events))
        ts = codec.frame_to_time(np.arange(codec.n_frames + 1))
        out[clip_id] = ClipScores(grid * 0.9 + 0.05, ts, CLASSES)
    return out


def events_to_codec(events):
    return [(label, on, off) for on, off, label in events]


GT = {
    "clip1": [(1.0, 3.0, "cat"), (5.0, 7.0, "dog")],
    "clip2": [(0.0, 2.0, "dog")],
}
DURATIONS = {"clip1": 10.0, "clip2": 10.0}


class TestClipScores:
    def test_container_shape_check(self):
        with pytest.raises(AssertionError):
            ClipScores(np.zeros((10, 2)), np.arange(10), CLASSES)  # ts must be T+1

    def test_segment_scores_weighted_mean(self):
        # constant score -> every segment equals the constant
        ts = np.arange(0, 10.5, 0.5)
        clip = ClipScores(np.full((20, 2), 0.3), ts, CLASSES)
        seg = get_segment_scores(clip, clip_length=10.0, segment_length=1.0)
        np.testing.assert_allclose(seg.scores, 0.3, atol=1e-9)
        assert seg.scores.shape == (10, 2)

    def test_overlap_add(self):
        ts = np.arange(0.0, 10.1, 1.0)
        mk = lambda v: ClipScores(np.full((10, 2), v), ts, CLASSES)
        frame_scores = {"fileA-0-1000": mk(0.2), "fileA-500-1500": mk(0.4)}
        out = segment_scores_overlap_add(frame_scores, {"fileA": 15.0}, CLASSES)
        arr = out["fileA"].scores
        assert arr.shape == (15, 2)
        np.testing.assert_allclose(arr[:5], 0.2)
        np.testing.assert_allclose(arr[5:10], 0.3)  # overlap mean
        np.testing.assert_allclose(arr[10:15], 0.4)

    def test_merge_overlapping(self):
        gt = {"c": [(0.0, 2.0, "cat"), (1.0, 3.0, "cat"), (5.0, 6.0, "cat"), (0.0, 1.0, "dog")]}
        merged = merge_overlapping_events(gt)
        cats = sorted(e for e in merged["c"] if e[2] == "cat")
        assert cats == [[0.0, 3.0, "cat"], [5.0, 6.0, "cat"]]

    def test_merge_maestro_ground_truth(self):
        """Clip ids <file>-<onset_cs>-<offset_cs>: events shift by
        onset//100 seconds and per-class overlaps merge across clips
        (reference decoder.py:106-116)."""
        from transformer4sed_tpu.eval.scores import merge_maestro_ground_truth

        clip_gt = {
            "fileA-0-1000": [(0.0, 4.0, "car")],
            "fileA-500-1500": [(0.0, 2.0, "car"), (1.0, 2.0, "birds_singing")],
            "fileB-1000-2000": [(0.5, 1.0, "car")],
        }
        merged = merge_maestro_ground_truth(clip_gt)
        # fileA car: (0,4) + (5+0, 5+2) -> adjacent at 4<5 stays split?
        # no: 5.0 > 4.0 so two events; birds at (6,7)
        assert sorted(e for e in merged["fileA"] if e[2] == "car") == [
            [0.0, 4.0, "car"],
            [5.0, 7.0, "car"],
        ]
        assert [e for e in merged["fileA"] if e[2] == "birds_singing"] == [
            [6.0, 7.0, "birds_singing"]
        ]
        assert merged["fileB"] == [[10.5, 11.0, "car"]]

    def test_maestro_classes_asset(self):
        import json, os

        path = os.path.join(os.path.dirname(__file__), "..", "meta", "maestro", "classes.json")
        with open(path) as f:
            tables = json.load(f)
        assert len(tables["classes_labels_maestro_real"]) == 17
        assert len(tables["classes_labels_maestro_synth"]) == 6
        assert len(tables["classes_labels_desed"]) == 10
        assert set(tables["classes_labels_maestro_real_eval"]) <= set(
            tables["classes_labels_maestro_real"]
        )
        assert tables["maestro_desed_alias"]["dog_bark"] == "Dog"


class TestDecode:
    def test_batched_decode(self):
        codec = make_codec()
        strong = np.zeros((2, 2, codec.n_frames), dtype=np.float32)
        strong[0, 0, 100:300] = 0.9
        raw, post = batched_decode_preds(strong, ["a.wav", "b.wav"], codec, filter=7)
        assert set(raw) == {"a", "b"}
        assert raw["a"].scores.shape == (codec.n_frames, 2)
        # median filter preserves the long block
        assert post["a"].scores[150, 0] > 0.8

    def test_weak_mask_soft(self):
        codec = make_codec()
        strong = np.full((1, 2, codec.n_frames), 0.8, dtype=np.float32)
        weak = np.array([[1.0, 0.0]], dtype=np.float32)
        raw, _ = batched_decode_preds(
            strong, ["x.wav"], codec, filter=None, weak_preds=weak, need_weak_mask=True
        )
        np.testing.assert_allclose(raw["x"].scores[:, 0], 0.8, atol=1e-6)
        np.testing.assert_allclose(raw["x"].scores[:, 1], 0.0, atol=1e-6)

    def test_decode_pred_batch_thresholds(self):
        codec = make_codec()
        strong = np.zeros((1, 2, codec.n_frames), dtype=np.float32)
        strong[0, 0, 100:400] = 0.9
        weak = np.array([[0.95, 0.95]], dtype=np.float32)
        preds = decode_pred_batch(strong, weak, ["x.wav"], codec, thresholds=[0.5], median_filter=7)
        rows = preds[0.5]
        assert len(rows) == 1
        fname, label, onset, offset = rows[0]
        assert fname == "x.wav" and label == "cat"
        assert abs(onset - 1.0) < 0.1 and abs(offset - 4.0) < 0.1


class TestPSDS:
    def test_perfect_predictions_full_psds(self):
        codec = make_codec()
        scores = perfect_scores(codec, GT)
        value, single = compute_psds_from_scores(
            scores, GT, DURATIONS, dtc_threshold=0.7, gtc_threshold=0.7, alpha_st=0.0
        )
        assert value > 0.99
        assert all(v > 0.99 for v in single.values())

    def test_empty_predictions_zero(self):
        codec = make_codec()
        ts = codec.frame_to_time(np.arange(codec.n_frames + 1))
        scores = {k: ClipScores(np.zeros((codec.n_frames, 2)), ts, CLASSES) for k in GT}
        value, _ = compute_psds_from_scores(scores, GT, DURATIONS)
        assert value < 0.01

    def test_alpha_st_penalises_imbalance(self):
        codec = make_codec()
        # perfect on cat, nothing on dog
        scores = {}
        for clip_id, events in GT.items():
            grid = codec.encode_strong(events_to_codec([e for e in events if e[2] == "cat"]))
            ts = codec.frame_to_time(np.arange(codec.n_frames + 1))
            scores[clip_id] = ClipScores(grid * 0.9 + 0.05, ts, CLASSES)
        v0, _ = compute_psds_from_scores(scores, GT, DURATIONS, dtc_threshold=0.7, gtc_threshold=0.7, alpha_st=0.0)
        v1, _ = compute_psds_from_scores(scores, GT, DURATIONS, dtc_threshold=0.7, gtc_threshold=0.7, alpha_st=1.0)
        assert v0 == pytest.approx(0.5, abs=0.02)  # cat=1, dog=0, mean
        assert v1 < 0.02  # mu - sigma = 0.5 - 0.5

    def test_false_positives_reduce_low_efpr_psds(self):
        codec = make_codec()
        scores = perfect_scores(codec, GT)
        # add a spurious cat detection in clip2
        noisy = dict(scores)
        arr = scores["clip2"].scores.copy()
        arr[200:220, 0] = 0.95
        noisy["clip2"] = ClipScores(arr, scores["clip2"].timestamps, CLASSES)
        v_clean, _ = compute_psds_from_scores(
            noisy, GT, DURATIONS, dtc_threshold=0.7, gtc_threshold=0.7, max_efpr=100.0
        )
        # at max_efpr=100 e/h a couple of FPs over 20 s of audio dominate:
        # efpr = 1 FP / (20/3600 h) = 180 e/h > 100 -> cat curve zero until
        # threshold passes 0.95
        assert v_clean < 1.0

    def test_cross_trigger_counted(self):
        codec = make_codec()
        # predictions: dog events everywhere cat GT is (cross triggers)
        scores = {}
        for clip_id, events in GT.items():
            swapped = [("dog" if l == "cat" else "cat", on, off) for on, off, l in events]
            grid = codec.encode_strong(swapped)
            ts = codec.frame_to_time(np.arange(codec.n_frames + 1))
            scores[clip_id] = ClipScores(grid * 0.9 + 0.05, ts, CLASSES)
        v_no_ct, _ = compute_psds_from_scores(
            scores, GT, DURATIONS, dtc_threshold=0.1, gtc_threshold=0.1, alpha_ct=0.0
        )
        v_ct, _ = compute_psds_from_scores(
            scores, GT, DURATIONS, dtc_threshold=0.1, gtc_threshold=0.1,
            cttc_threshold=0.3, alpha_ct=0.5,
        )
        assert v_ct <= v_no_ct


class TestF1:
    PRED = {
        "clip1": [(1.05, 3.02, "cat"), (5.5, 7.5, "dog")],
        "clip2": [(0.0, 2.0, "dog"), (4.0, 5.0, "cat")],
    }

    def test_event_based(self):
        gt = {k: [(on, off, l) for on, off, l in v] for k, v in GT.items()}
        out = event_based_f1(self.PRED, gt, CLASSES, t_collar=0.2)
        # cat: 1 TP ("clip1"), 1 FP -> P=0.5, R=1 -> F1=2/3
        assert out["class_wise_f1"]["cat"] == pytest.approx(2 / 3)
        # dog: clip1 pred offset by 0.5 -> no match; clip2 exact -> 1 TP 1 FP 1 FN
        assert out["class_wise_f1"]["dog"] == pytest.approx(0.5)

    def test_segment_based(self):
        out = segment_based_f1(self.PRED, GT, CLASSES, DURATIONS, segment_length=1.0)
        assert 0 < out["macro_f1"] <= 1

    def test_intersection_macro_f1(self):
        rows = {
            0.5: [
                ("clip1.wav", "cat", 1.0, 3.0),
                ("clip1.wav", "dog", 5.0, 7.0),
                ("clip2.wav", "dog", 0.0, 2.0),
            ]
        }
        val = intersection_macro_f1(rows, GT, CLASSES)
        assert val == pytest.approx(1.0)

    def test_intersection_macro_f1_drops_absent_classes(self):
        """Classes with no ground-truth events are excluded from the macro
        mean (psds_eval nan-mean semantics), not counted as F1=0."""
        rows = {
            0.5: [
                ("clip1.wav", "cat", 1.0, 3.0),
                ("clip1.wav", "dog", 5.0, 7.0),
                ("clip2.wav", "dog", 0.0, 2.0),
            ]
        }
        val = intersection_macro_f1(rows, GT, tuple(CLASSES) + ("ghost",))
        assert val == pytest.approx(1.0)
