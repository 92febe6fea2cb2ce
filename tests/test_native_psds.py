"""Native (C++) PSDS sweep: parity with the NumPy reference path."""

import numpy as np
import pytest

from transformer4sed_tpu.eval.scores import ClipScores


def _synthetic(n_clips=24, C=3, T=40, seed=0):
    rng = np.random.RandomState(seed)
    classes = [f"c{i}" for i in range(C)]
    scores, gt, durs = {}, {}, {}
    for i in range(n_clips):
        name = f"clip{i}"
        # quantize to a 1e-3 grid: keeps the python sweep's `> v - 1e-9`
        # convention identical to the exact sweep's `>= v`
        arr = np.round(rng.rand(T, C) * 0.6, 3).astype(np.float32)
        events = []
        for _ in range(rng.randint(0, 3)):
            c = rng.randint(C)
            on = rng.randint(0, T - 8)
            ln = rng.randint(4, 10)
            arr[on : on + ln, c] = np.round(0.7 + 0.3 * rng.rand(), 3)
            events.append((on / T * 10.0, min(on + ln, T) / T * 10.0, classes[c]))
        scores[name] = ClipScores(arr, np.linspace(0, 10, T + 1), classes)
        gt[name] = events
        durs[name] = 10.0
    return scores, gt, durs


class TestNativePSDS:
    def test_builds(self):
        from transformer4sed_tpu.native import load_psds_core

        lib = load_psds_core()
        if lib is None:
            pytest.skip("no C++ toolchain available")
        assert hasattr(lib, "psds_class_sweep")

    @pytest.mark.parametrize("alpha_ct", [0.0, 0.5])
    def test_matches_python_sweep(self, monkeypatch, alpha_ct):
        import transformer4sed_tpu.eval.psds as P

        if P._native_sweeper.__module__ and __import__(
            "transformer4sed_tpu.native", fromlist=["load_psds_core"]
        ).load_psds_core() is None:
            pytest.skip("no C++ toolchain available")

        scores, gt, durs = _synthetic()
        # python sweep at EVERY unique value == native exact sweep
        kwargs = dict(
            dtc_threshold=0.5, gtc_threshold=0.5, cttc_threshold=0.3,
            alpha_ct=alpha_ct, alpha_st=1.0, max_efpr=100.0,
            max_thresholds=10**6,
        )
        native = P.compute_psd_roc(scores, gt, durs, **kwargs)

        monkeypatch.setattr(P, "_native_sweeper", lambda *a, **k: None)
        python = P.compute_psd_roc(scores, gt, durs, **kwargs)

        assert native.value == pytest.approx(python.value, abs=1e-9)
        for c in python.single_class_psds:
            assert native.single_class_psds[c] == pytest.approx(
                python.single_class_psds[c], abs=1e-9
            )
        np.testing.assert_allclose(native.etpr, python.etpr, atol=1e-9)

    def test_quantile_sweep_kernel_matches_python_counts(self):
        """The quantile-sweep C entry point stays count-exact vs the
        Python operating-point evaluator at arbitrary thresholds."""
        import transformer4sed_tpu.eval.psds as P

        if __import__(
            "transformer4sed_tpu.native", fromlist=["load_psds_core"]
        ).load_psds_core() is None:
            pytest.skip("no C++ toolchain available")
        scores, gt, durs = _synthetic(seed=3)
        classes = ["c0", "c1", "c2"]
        gtc = {}
        for clip_id, events in gt.items():
            d = {}
            for on, off, label in events:
                d.setdefault(label, []).append((on, off))
            gtc[clip_id] = {k: np.asarray(v) for k, v in d.items()}
        native = P._native_sweeper(scores, gtc, classes)
        thrs = np.asarray([0.05, 0.2, 0.45, 0.71], np.float64)
        tp_n, fp_n, ct_n = native(1, thrs, 0.5, 0.5, 0.3, True)
        for ti, thr in enumerate(thrs):
            detections = {
                cid: {"c1": P._intervals_from_binary(clip.scores[:, 1] > thr, clip.timestamps)}
                for cid, clip in scores.items()
            }
            tp, fp, ct = P.evaluate_operating_point(detections, gtc, classes, 0.5, 0.5, 0.3)
            assert tp_n[ti] == tp["c1"] and fp_n[ti] == fp["c1"]
            assert list(ct_n[ti]) == [ct["c1"][c] for c in classes]


class TestNaNGuard:
    def test_non_finite_scores_raise(self):
        """NaN scores must raise a clear error instead of driving the
        native exact sweep's merge loop out of bounds (NaN != NaN never
        advanced the cursor -> unbounded writes -> segfault)."""
        from transformer4sed_tpu.eval import psds as P

        scores, gt, durs = _synthetic(n_clips=2)
        first = next(iter(scores))
        bad = scores[first].scores.copy()
        bad[5, 1] = np.nan
        scores[first] = ClipScores(bad, scores[first].timestamps, scores[first].event_classes)
        with pytest.raises(ValueError, match="non-finite"):
            P.compute_psds_from_scores(
                scores, gt, durs, dtc_threshold=0.7, gtc_threshold=0.7,
                alpha_ct=0.0, alpha_st=1.0,
            )
