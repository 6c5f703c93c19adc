from .fid import (
    compute_statistics,
    frechet_distance,
    fid_from_feature_batches,
    inception_score,
    load_adm_npz,
    precision_recall,
)
from .inception import InceptionV3, import_fid_inception_weights, load_fid_inception

__all__ = [
    "compute_statistics", "frechet_distance", "fid_from_feature_batches",
    "inception_score", "precision_recall", "load_adm_npz",
    "InceptionV3", "import_fid_inception_weights", "load_fid_inception",
]
