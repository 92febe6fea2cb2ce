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
        # arbitrary float scores — the python sweep and the native exact
        # sweep share >= threshold semantics, so no quantization is needed
        arr = (rng.rand(T, C) * 0.6).astype(np.float32)
        events = []
        for _ in range(rng.randint(0, 3)):
            c = rng.randint(C)
            on = rng.randint(0, T - 8)
            ln = rng.randint(4, 10)
            arr[on : on + ln, c] = 0.7 + 0.3 * rng.rand()
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
                cid: {"c1": P._intervals_from_binary(clip.scores[:, 1] >= thr, clip.timestamps)}
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


class TestAnalyticPSDS:
    """PSDS pinned to hand-computed ground truth (not just C++ == NumPy).

    One 3600-s clip, 10-s frames, classes a/b. Ground truth:
    a: [0,10) and [20,30); b: [40,940) (900 s). Scores:
    a = 0.9 on [0,10), 0.5 on [20,30), 0.5 on [40,940) (a false positive
    that cross-triggers b); b = 0.9 on [40,940). dtc=gtc=0.7, cttc=0.3,
    max_efpr=100, total duration exactly 1 h.

    Class-a sweep at its unique score values {0, 0.5, 0.9} (>= semantics):
      v=0.9 -> TP=1 (E1 only)           -> (eFPR 0, TPR 0.5)
      v=0.5 -> TP=2, FP=1 (+CT of b)    -> (1 [or 1+0.5*4=3 with alpha_ct], 1)
      v=0   -> one clip-long FP         -> TPR 0
    Class b is perfect at v=0.9 -> ROC 1 everywhere, PSDS_b = 1.
    Hand-derived areas:
      alpha_ct=0,   alpha_st=0: PSDS_a=0.995,  PSDS=0.9975
      alpha_ct=0.5, alpha_st=0: PSDS_a=0.985,  PSDS=0.9925
      alpha_ct=0.5, alpha_st=1:               PSDS=0.985
    """

    def _fixture(self):
        T = 360
        stamps = np.linspace(0.0, 3600.0, T + 1)
        arr = np.zeros((T, 2), np.float32)
        arr[0, 0] = 0.9          # a: [0,10)
        arr[2, 0] = 0.5          # a: [20,30)
        arr[4:94, 0] = 0.5       # a FP region [40,940)
        arr[4:94, 1] = 0.9       # b: [40,940)
        scores = {"clip0": ClipScores(arr, stamps, ["a", "b"])}
        gt = {"clip0": [(0.0, 10.0, "a"), (20.0, 30.0, "a"), (40.0, 940.0, "b")]}
        durs = {"clip0": 3600.0}
        return scores, gt, durs

    CASES = [
        # (alpha_ct, alpha_st, expected_psds, expected_single_a, expected_single_b)
        (0.0, 0.0, 0.9975, 0.995, 1.0),
        (0.5, 0.0, 0.9925, 0.985, 1.0),
        (0.5, 1.0, 0.985, 0.985, 1.0),
    ]

    @pytest.mark.parametrize("use_native", [True, False])
    @pytest.mark.parametrize("alpha_ct,alpha_st,exp,exp_a,exp_b", CASES)
    def test_absolute_values(self, monkeypatch, use_native, alpha_ct, alpha_st, exp, exp_a, exp_b):
        import transformer4sed_tpu.eval.psds as P

        if use_native:
            from transformer4sed_tpu.native import load_psds_core

            if load_psds_core() is None:
                pytest.skip("no C++ toolchain available")
        else:
            monkeypatch.setattr(P, "_native_sweeper", lambda *a, **k: None)

        scores, gt, durs = self._fixture()
        res = P.compute_psd_roc(
            scores, gt, durs,
            dtc_threshold=0.7, gtc_threshold=0.7, cttc_threshold=0.3,
            alpha_ct=alpha_ct, alpha_st=alpha_st, max_efpr=100.0,
            max_thresholds=10**6,
        )
        assert res.value == pytest.approx(exp, abs=1e-9)
        assert res.single_class_psds["a"] == pytest.approx(exp_a, abs=1e-9)
        assert res.single_class_psds["b"] == pytest.approx(exp_b, abs=1e-9)
