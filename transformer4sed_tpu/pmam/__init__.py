from transformer4sed_tpu.pmam.gmm import GaussianMixture, KMeans, PCA
from transformer4sed_tpu.pmam.features import extract_frame_features, sample_features
from transformer4sed_tpu.pmam.pseudo_labels import frame_probs_to_tsv, generate_pseudo_labels
from transformer4sed_tpu.pmam.train import (
    PMAMConfig,
    make_pmam_step,
    prototype_predictions,
)

__all__ = [
    "GaussianMixture",
    "KMeans",
    "PCA",
    "extract_frame_features",
    "sample_features",
    "frame_probs_to_tsv",
    "generate_pseudo_labels",
    "PMAMConfig",
    "make_pmam_step",
    "prototype_predictions",
]
