from .fid import (
    compute_statistics,
    frechet_distance,
    fid_from_feature_batches,
    inception_score,
    load_adm_npz,
    precision_recall,
)
from .inception import InceptionV3, import_fid_inception_weights, load_fid_inception
from .audio_eval import clap_eval_directory, clap_scores, read_wav

__all__ = [
    "compute_statistics", "frechet_distance", "fid_from_feature_batches",
    "inception_score", "precision_recall", "load_adm_npz",
    "InceptionV3", "import_fid_inception_weights", "load_fid_inception",
    "clap_eval_directory", "clap_scores", "read_wav",
]
