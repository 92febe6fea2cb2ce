from transformer4sed_tpu.eval.scores import ClipScores, segment_scores_overlap_add
from transformer4sed_tpu.eval.decode import batched_decode_preds, decode_pred_batch
from transformer4sed_tpu.eval.psds import compute_psds_from_scores, PSDSResult
from transformer4sed_tpu.eval.sed_f1 import event_based_f1, segment_based_f1, intersection_macro_f1
from transformer4sed_tpu.eval.sebbs import CSEBBParams, apply_csebbs, sebbs_to_events, tune_csebbs

__all__ = [
    "ClipScores",
    "segment_scores_overlap_add",
    "batched_decode_preds",
    "decode_pred_batch",
    "compute_psds_from_scores",
    "PSDSResult",
    "event_based_f1",
    "segment_based_f1",
    "intersection_macro_f1",
    "CSEBBParams",
    "apply_csebbs",
    "sebbs_to_events",
    "tune_csebbs",
]
