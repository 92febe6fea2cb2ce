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
        kwargs = dict(
            dtc_threshold=0.5, gtc_threshold=0.5, cttc_threshold=0.3,
            alpha_ct=alpha_ct, alpha_st=1.0, max_efpr=100.0, max_thresholds=60,
        )
        native = P.compute_psd_roc(scores, gt, durs, **kwargs)

        monkeypatch.setattr(P, "_native_sweeper", lambda *a, **k: None)
        python = P.compute_psd_roc(scores, gt, durs, **kwargs)

        assert native.value == pytest.approx(python.value, abs=1e-12)
        for c in python.single_class_psds:
            assert native.single_class_psds[c] == pytest.approx(
                python.single_class_psds[c], abs=1e-12
            )
        np.testing.assert_allclose(native.etpr, python.etpr, atol=1e-12)
