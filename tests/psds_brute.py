"""Brute-force PSDS scorer, written straight from the metric definitions.

An ADVERSARIAL third implementation (VERDICT r2 item 6): shares no code
with ``transformer4sed_tpu/eval/psds.py`` or ``native/psds_core.cpp``
(both of which share one author and one design — a shared-assumption
bug would pass their mutual cross-checks). Everything here is plain
Python loops over (clip, threshold, event) tuples, derived from the
intersection-based PSDS definitions (Bilen et al., 2020,
arXiv:1910.08440; psds_eval semantics):

  * a detection passes DTC when the total duration of its intersections
    with same-class ground truth is >= dtc * its own duration;
  * a ground-truth event is a TP when the union of DTC-valid detections
    covers >= gtc of its duration;
  * a DTC-failing (FP) detection cross-triggers a ground-truth event of
    another class when it alone covers >= cttc of that event;
  * eFPR_c = FP_c / dataset-hours
           + alpha_ct * mean_{c' != c, dur(c')>0} CT(c,c') / gt-hours(c');
  * the PSD-ROC is the right-continuous staircase "best TPR at
    eFPR <= e"; effective TPR = max(mu - alpha_st * sigma, 0) over
    classes with ground truth; PSDS = AUC(eTPR, [0, max_efpr]) / max_efpr.

Deliberately slow and simple — correctness oracle only.
"""

from __future__ import annotations

import numpy as np


def _events_from_frames(col, timestamps, thr):
    """Active frames (score >= thr) merged into [(onset, offset)] seconds."""
    events = []
    start = None
    for i, v in enumerate(col):
        if v >= thr and start is None:
            start = i
        elif v < thr and start is not None:
            events.append((timestamps[start], timestamps[i]))
            start = None
    if start is not None:
        events.append((timestamps[start], timestamps[len(col)]))
    return events


def _overlap(a, b):
    return max(0.0, min(a[1], b[1]) - max(a[0], b[0]))


def _union_coverage(intervals, target):
    """Length of ``target`` covered by the union of ``intervals`` —
    integrate over sorted boundary points (different algorithm from the
    production merge loop on purpose)."""
    pts = {target[0], target[1]}
    for a, b in intervals:
        pts.add(min(max(a, target[0]), target[1]))
        pts.add(min(max(b, target[0]), target[1]))
    pts = sorted(pts)
    covered = 0.0
    for lo, hi in zip(pts[:-1], pts[1:]):
        mid = 0.5 * (lo + hi)
        if any(a <= mid < b for a, b in intervals):
            covered += hi - lo
    return covered


def brute_psds(scores, ground_truth, durations, dtc_threshold, gtc_threshold,
               cttc_threshold, alpha_ct, alpha_st, max_efpr):
    """Returns (psds_value, {class: single_class_psds})."""
    classes = list(next(iter(scores.values())).event_classes)
    total_hours = sum(durations[k] for k in scores) / 3600.0

    gt = {clip: {} for clip in scores}
    n_events = {c: 0 for c in classes}
    gt_hours = {c: 0.0 for c in classes}
    for clip, events in ground_truth.items():
        for on, off, label in events:
            gt.setdefault(clip, {}).setdefault(label, []).append((on, off))
            n_events[label] += 1
            gt_hours[label] += (off - on) / 3600.0

    live = [c for c in classes if n_events[c] > 0]

    def operating_points(c):
        ci = classes.index(c)
        thresholds = sorted({float(v) for clip in scores.values()
                             for v in clip.scores[:, ci]})
        pts = []
        for thr in thresholds:
            tp = 0
            fp = 0
            ct = {c2: 0 for c2 in classes}
            for clip_id, clip in scores.items():
                dets = _events_from_frames(clip.scores[:, ci], clip.timestamps, thr)
                gts_c = gt.get(clip_id, {}).get(c, [])
                valid, invalid = [], []
                for det in dets:
                    inter = sum(_overlap(det, g) for g in gts_c)
                    if inter >= dtc_threshold * (det[1] - det[0]) - 1e-15:
                        valid.append(det)
                    else:
                        invalid.append(det)
                fp += len(invalid)
                for g in gts_c:
                    if _union_coverage(valid, g) >= gtc_threshold * (g[1] - g[0]) - 1e-15:
                        tp += 1
                for c2, gts2 in gt.get(clip_id, {}).items():
                    if c2 == c:
                        continue
                    for g2 in gts2:
                        if any(_overlap(det, g2) >= cttc_threshold * (g2[1] - g2[0]) - 1e-15
                               for det in invalid):
                            ct[c2] += 1
            efpr = fp / total_hours
            if alpha_ct > 0:
                rates = [ct[c2] / gt_hours[c2] for c2 in classes
                         if c2 != c and gt_hours[c2] > 0]
                efpr += alpha_ct * (sum(rates) / len(rates) if rates else 0.0)
            tpr = tp / n_events[c]
            pts.append((efpr, tpr))
        return pts

    per_class = {c: operating_points(c) for c in live}

    grid = sorted({0.0, max_efpr} | {e for pts in per_class.values()
                                     for e, _ in pts if e <= max_efpr})

    def tpr_at(pts, e):
        best = 0.0
        for ef, tp in pts:
            if ef <= e + 1e-15:
                best = max(best, tp)
        return best

    curves = {c: [tpr_at(per_class[c], e) for e in grid] for c in live}

    def stair_auc(ys):
        auc = 0.0
        for i in range(len(grid) - 1):
            auc += (grid[i + 1] - grid[i]) * ys[i]
        auc += (max_efpr - grid[-1]) * ys[-1]
        return auc

    mat = np.asarray([curves[c] for c in live])
    etpr = np.maximum(mat.mean(axis=0) - alpha_st * mat.std(axis=0), 0.0)
    value = stair_auc(list(etpr)) / max_efpr
    single = {c: stair_auc(curves[c]) / max_efpr for c in live}
    return value, single
