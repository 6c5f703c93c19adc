"""InceptionV3 pool3 feature extractor for FID/IS (flax, inference-only).

The reference's quality gate is the ADM evaluator's FID/sFID/IS/P/R over
InceptionV3 pool3 features (`Next-DiT-ImageNet/README.md:19-22`). This is
the standard FID network: torchvision's inception_v3 layout with the
pytorch-fid patches (avg pools with count_include_pad=False in the A/C/E
blocks; Mixed_7c's branch_pool is a MAX pool), truncated at the 2048-d
global-average pool3 features. `import_fid_inception_weights` consumes a
torchvision/pytorch-fid state dict (``pt_inception-2015-12-05`` /
``inception_v3_google`` naming), so real FID is one weight-mount away; the
BatchNorms run in inference mode from imported running statistics.

Implementation is NHWC internally (TPU conv layout); the public API takes
NCHW images in [0, 1] and applies the model's own 2x-1 input scaling
(pytorch-fid ``normalize_input=True``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _avg_pool_3x3(x, count_include_pad: bool):
    """3x3 stride-1 pad-1 average pool over NHWC."""
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                   [(0, 0), (1, 1), (1, 1), (0, 0)])
    if count_include_pad:
        return summed / 9.0
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                   [(0, 0), (1, 1), (1, 1), (0, 0)])
    return summed / counts


def _max_pool(x, window: int, stride: int, pad: int = 0):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, window, window, 1),
                                 (1, stride, stride, 1),
                                 [(0, 0), (pad, pad), (pad, pad), (0, 0)])


class BasicConv2d(nn.Module):
    """Conv(bias=False) + inference BatchNorm(eps=1e-3) + ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        ph, pw = self.padding
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=[(ph, ph), (pw, pw)], use_bias=False,
                    name="conv")(x)
        c = self.features
        scale = self.param("bn_scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("bn_mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("bn_var", nn.initializers.ones, (c,), jnp.float32)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3(x, count_include_pad=False)  # pytorch-fid patch
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3(x, count_include_pad=False)  # pytorch-fid patch
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # Mixed_7b uses avg branch_pool (count_include_pad=False); Mixed_7c uses
    # MAX pool — the pytorch-fid FIDInceptionE_1 / E_2 distinction.
    pool_mode: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_mode == "max":
            bp = _max_pool(x, 3, 1, pad=1)
        else:
            bp = _avg_pool_3x3(x, count_include_pad=False)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """FID InceptionV3 truncated at pool3 (2048-d global average)."""

    normalize_input: bool = True

    @nn.compact
    def __call__(self, images):
        """images: (B, 3, H, W) float in [0, 1] (resize to 299 beforehand;
        any H, W >= 75 works). Returns (B, 2048) pool3 features."""
        x = jnp.transpose(images, (0, 2, 3, 1)).astype(jnp.float32)
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool_mode="avg", name="Mixed_7b")(x)
        x = InceptionE(pool_mode="max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # (B, 2048)


# -- torch state-dict import -------------------------------------------------


def _basic_conv(sd, pre):
    return {
        "conv": {"kernel": sd[f"{pre}.conv.weight"].transpose(2, 3, 1, 0)},
        "bn_scale": sd[f"{pre}.bn.weight"],
        "bn_bias": sd[f"{pre}.bn.bias"],
        "bn_mean": sd[f"{pre}.bn.running_mean"],
        "bn_var": sd[f"{pre}.bn.running_var"],
    }


_BLOCK_BRANCHES = {
    "A": ("branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
          "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"),
    "B": ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"),
    "C": ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
          "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
          "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"),
    "D": ("branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
          "branch7x7x3_3", "branch7x7x3_4"),
    "E": ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
          "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
          "branch3x3dbl_3b", "branch_pool"),
}

_LAYOUT = [
    ("Conv2d_1a_3x3", None), ("Conv2d_2a_3x3", None), ("Conv2d_2b_3x3", None),
    ("Conv2d_3b_1x1", None), ("Conv2d_4a_3x3", None),
    ("Mixed_5b", "A"), ("Mixed_5c", "A"), ("Mixed_5d", "A"),
    ("Mixed_6a", "B"),
    ("Mixed_6b", "C"), ("Mixed_6c", "C"), ("Mixed_6d", "C"), ("Mixed_6e", "C"),
    ("Mixed_7a", "D"),
    ("Mixed_7b", "E"), ("Mixed_7c", "E"),
]


def import_fid_inception_weights(sd):
    """torchvision/pytorch-fid InceptionV3 state dict -> our param tree.
    The fc/AuxLogits heads (unused for pool3 features) are ignored."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {}
    for name, kind in _LAYOUT:
        if kind is None:
            params[name] = _basic_conv(sd, name)
        else:
            params[name] = {br: _basic_conv(sd, f"{name}.{br}")
                            for br in _BLOCK_BRANCHES[kind]}
    return params


def load_fid_inception(ckpt_path: str):
    """Build the extractor from a downloaded pt_inception/torchvision
    checkpoint; returns (model, variables)."""
    from ..core.checkpoint import load_torch_state_dict

    model = InceptionV3()
    params = import_fid_inception_weights(load_torch_state_dict(ckpt_path))
    return model, {"params": params}
