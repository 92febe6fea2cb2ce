"""Three-way PSDS property test: brute-force definitional scorer vs the
NumPy sweep vs the C++ exact sweep, on randomized event layouts
(VERDICT r2 item 6). Any shared-assumption bug between the NumPy and
C++ paths (same author, same design) surfaces against the brute oracle.

Spec choices all three implement (documented in eval/psds.py; the
upstream sed_scores_eval is not in this image to arbitrate):
cross-trigger counts use the single-detection >= cttc rule; the
cross-trigger rate averages over other classes WITH ground truth; the
class set for mu/sigma is classes with >= 1 ground-truth event.
"""

import numpy as np
import pytest

from tests.psds_brute import brute_psds
from transformer4sed_tpu.eval.scores import ClipScores


def _random_layout(seed, n_clips=6, C=3, T=30, cross_heavy=False):
    """Quantized random scores + random (possibly overlapping) events.

    Quantization to a ~20-value grid keeps the brute sweep's
    every-unique-threshold loop tractable while still producing ties,
    plateaus and empty-detection thresholds.
    """
    rng = np.random.RandomState(seed)
    classes = [f"c{i}" for i in range(C)]
    scores, gt, durs = {}, {}, {}
    for i in range(n_clips):
        name = f"clip{i}"
        arr = np.round(rng.rand(T, C), 2).astype(np.float32)
        arr = np.round(arr * 20) / 20
        events = []
        n_ev = rng.randint(0, 4)
        for _ in range(n_ev):
            c = rng.randint(C)
            on = rng.randint(0, T - 6)
            ln = rng.randint(2, 10)
            off = min(on + ln, T)
            arr[on:off, c] = np.round((0.6 + 0.4 * rng.rand()) * 20) / 20
            events.append((on / T * 10.0, off / T * 10.0, classes[c]))
            if cross_heavy and rng.rand() < 0.7:
                # a co-located event of ANOTHER class: its frames fire on
                # the first class's scores -> DTC-failing detections that
                # cross-trigger it (exercises the alpha_ct path hard)
                c2 = (c + 1 + rng.randint(C - 1)) % C
                events.append((on / T * 10.0, off / T * 10.0, classes[c2]))
        scores[name] = ClipScores(arr, np.linspace(0, 10, T + 1), classes)
        gt[name] = events
        durs[name] = 10.0
    return scores, gt, durs


def _python_psds(scores, gt, durs, monkeypatch, **kw):
    import transformer4sed_tpu.eval.psds as P

    monkeypatch.setattr(P, "_native_sweeper", lambda *a, **k: None)
    return P.compute_psd_roc(scores, gt, durs, max_thresholds=10**6, **kw)


def _native_psds(scores, gt, durs, **kw):
    import transformer4sed_tpu.eval.psds as P
    from transformer4sed_tpu.native import load_psds_core

    if load_psds_core() is None:
        return None
    return P.compute_psd_roc(scores, gt, durs, max_thresholds=10**6, **kw)


# 100+ randomized layouts spread over parameter combinations; each case
# covers a distinct (seed, thresholds, alphas) tuple.
CASES = []
for seed in range(102):
    CASES.append(dict(
        seed=seed,
        cross_heavy=seed % 3 != 0,
        dtc=(0.1, 0.5, 0.7)[seed % 3],
        gtc=(0.7, 0.5, 0.1)[(seed // 3) % 3],
        cttc=(0.3, 0.1)[seed % 2],
        alpha_ct=(0.0, 0.5, 1.0)[seed % 3],
        alpha_st=(1.0, 0.0)[(seed // 2) % 2],
    ))


class TestThreeWayPSDS:
    @pytest.mark.parametrize("chunk", range(6))
    def test_brute_vs_numpy_vs_native(self, chunk, monkeypatch):
        import transformer4sed_tpu.eval.psds as P
        from transformer4sed_tpu.native import load_psds_core

        have_native = load_psds_core() is not None
        for case in CASES[chunk::6]:
            scores, gt, durs = _random_layout(
                case["seed"], cross_heavy=case["cross_heavy"])
            if not any(gt.values()):
                continue
            kw = dict(dtc_threshold=case["dtc"], gtc_threshold=case["gtc"],
                      cttc_threshold=case["cttc"], alpha_ct=case["alpha_ct"],
                      alpha_st=case["alpha_st"], max_efpr=100.0)
            b_value, b_single = brute_psds(scores, gt, durs, **kw)

            tag = f"case {case}"
            if have_native:
                native = P.compute_psd_roc(scores, gt, durs, max_thresholds=10**6, **kw)
                assert native.value == pytest.approx(b_value, abs=1e-9), f"native vs brute: {tag}"
                for c, v in b_single.items():
                    assert native.single_class_psds[c] == pytest.approx(v, abs=1e-9), (
                        f"native vs brute single[{c}]: {tag}")

            monkeypatch.setattr(P, "_native_sweeper", lambda *a, **k: None)
            python = P.compute_psd_roc(scores, gt, durs, max_thresholds=10**6, **kw)
            monkeypatch.undo()
            assert python.value == pytest.approx(b_value, abs=1e-9), f"numpy vs brute: {tag}"
            for c, v in b_single.items():
                assert python.single_class_psds[c] == pytest.approx(v, abs=1e-9), (
                    f"numpy vs brute single[{c}]: {tag}")
