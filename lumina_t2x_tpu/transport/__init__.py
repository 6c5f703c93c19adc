"""Transport factory, mirroring the reference's string-driven API
(`lumina_next_t2i/transport/__init__.py:1-66`)."""

from .cfg import cfg_interval_wrapper, cfg_wrapper
from .path import GVPPath, LinearPath, VPPath, expand_t_like_x
from .solvers import make_time_grid, odeint_adaptive, odeint_fixed, sdeint, time_shift
from .transport import ModelType, PathType, Sampler, Transport, WeightType, sample_t

__all__ = [
    "create_transport", "Transport", "Sampler", "ModelType", "PathType", "WeightType",
    "LinearPath", "GVPPath", "VPPath", "expand_t_like_x", "sample_t",
    "odeint_fixed", "odeint_adaptive", "sdeint", "make_time_grid", "time_shift",
    "cfg_wrapper", "cfg_interval_wrapper",
]


def create_transport(
    path_type="Linear",
    prediction="velocity",
    loss_weight=None,
    train_eps=None,
    sample_eps=None,
    snr_type="uniform",
):
    """Build a Transport with the reference's defaulting rules
    (`transport/__init__.py:1-66`): VP -> (1e-5, 1e-3); GVP/Linear
    non-velocity -> (1e-3, 1e-3); velocity -> 0."""
    if prediction == "noise":
        model_type = ModelType.NOISE
    elif prediction == "score":
        model_type = ModelType.SCORE
    else:
        model_type = ModelType.VELOCITY

    if loss_weight == "velocity":
        loss_type = WeightType.VELOCITY
    elif loss_weight == "likelihood":
        loss_type = WeightType.LIKELIHOOD
    else:
        loss_type = WeightType.NONE

    path_choice = {"Linear": PathType.LINEAR, "GVP": PathType.GVP, "VP": PathType.VP}
    path_type = path_choice[path_type]

    if path_type == PathType.VP:
        train_eps = 1e-5 if train_eps is None else train_eps
        sample_eps = 1e-3 if sample_eps is None else sample_eps
    elif path_type in (PathType.GVP, PathType.LINEAR) and model_type != ModelType.VELOCITY:
        train_eps = 1e-3 if train_eps is None else train_eps
        sample_eps = 1e-3 if sample_eps is None else sample_eps
    else:  # velocity & [GVP, LINEAR] is stable everywhere
        train_eps = 0
        sample_eps = 0

    return Transport(
        model_type=model_type,
        path_type=path_type,
        loss_type=loss_type,
        train_eps=train_eps,
        sample_eps=sample_eps,
        snr_type=snr_type,
    )
