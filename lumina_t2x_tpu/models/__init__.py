"""Model registry.

String-keyed constructor lookup mirroring the reference's
`models.__dict__[args.model]` pattern (`lumina_next_t2i/train.py:322`).
"""

from .flag_dit import (
    FlagDiT,
    FlagDiT_5B_patch2,
    FlagDiT_ImageNet_600M_patch2,
    FlagDiT_ImageNet_3B_patch2,
    FlagDiT_ImageNet_7B_patch2,
)
from .next_dit import (
    NextDiT,
    NextDiT_2B_GQA_patch2,
    NextDiT_2B_patch2,
    NextDiT_600M_patch2,
    NextDiT_Tiny_patch2,
)
from .compositional import (
    NextDiTCompositional,
    NextDiT_2B_patch2_Compositional,
)
from .flag_dit_1d import FlagDiT1D
from .mmdit import MMDiT, MMDiT_SD3_Medium
from .moe import (
    NextDiTMoE,
    NextDiT_MoE_600M_patch2_Both,
    NextDiT_MoE_600M_patch2_Spatial,
    NextDiT_MoE_600M_patch2_Time,
)
from .next_dit_imagenet import (
    NextDiTImageNet,
    NextDiT_ImageNet_Tiny_patch2,
    NextDiT_ImageNet_Small_patch2,
    NextDiT_ImageNet_600M_patch2,
    NextDiT_ImageNet_2B_patch2,
    NextDiT_ImageNet_3B_patch2,
    NextDiT_ImageNet_7B_patch2,
)

MODELS = {
    # text-to-image
    "NextDiT_2B_patch2": NextDiT_2B_patch2,
    "NextDiT_2B_GQA_patch2": NextDiT_2B_GQA_patch2,
    "NextDiT_600M_patch2": NextDiT_600M_patch2,
    "NextDiT_Tiny_patch2": NextDiT_Tiny_patch2,  # debug/smoke only
    "DiT_Llama_5B_patch2": FlagDiT_5B_patch2,
    # class-conditional ImageNet
    "NextDiT_ImageNet_Tiny_patch2": NextDiT_ImageNet_Tiny_patch2,  # debug/smoke only
    "NextDiT_ImageNet_Small_patch2": NextDiT_ImageNet_Small_patch2,  # quality demo
    "NextDiT_ImageNet_600M_patch2": NextDiT_ImageNet_600M_patch2,
    "NextDiT_ImageNet_2B_patch2": NextDiT_ImageNet_2B_patch2,
    "NextDiT_ImageNet_3B_patch2": NextDiT_ImageNet_3B_patch2,
    "NextDiT_ImageNet_7B_patch2": NextDiT_ImageNet_7B_patch2,
    "FlagDiT_ImageNet_600M_patch2": FlagDiT_ImageNet_600M_patch2,
    "FlagDiT_ImageNet_3B_patch2": FlagDiT_ImageNet_3B_patch2,
    "FlagDiT_ImageNet_7B_patch2": FlagDiT_ImageNet_7B_patch2,
    # MoE (Next-DiT-MoE family)
    "NextDiT_MoE_600M_patch2_Time": NextDiT_MoE_600M_patch2_Time,
    "NextDiT_MoE_600M_patch2_Spatial": NextDiT_MoE_600M_patch2_Spatial,
    "NextDiT_MoE_600M_patch2_Both": NextDiT_MoE_600M_patch2_Both,
    # region-controlled compositional generation
    "NextDiT_2B_patch2_Compositional": NextDiT_2B_patch2_Compositional,
    # 1-D temporal denoisers (audio/music)
    "FlagDiT1D_audio": lambda **kw: FlagDiT1D(
        **{**dict(in_channels=20, context_dim=1024), **kw}
    ),
    "FlagDiT1D_music": lambda **kw: FlagDiT1D(
        **{**dict(in_channels=20, context_dim=1024), **kw}
    ),
    # SD3 (mini pipeline backbone)
    "MMDiT_SD3_Medium": MMDiT_SD3_Medium,
}


def get_model(name: str, **kwargs):
    try:
        return MODELS[name](**kwargs)
    except KeyError:
        raise KeyError(f"Unknown model {name!r}; available: {sorted(MODELS)}")


__all__ = ["MODELS", "get_model", "NextDiT", "NextDiTImageNet", "FlagDiT"]
