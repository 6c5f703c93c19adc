"""Image preprocessing: aspect-ratio bucketing and crops.

Behavior parity with `lumina_next_t2i/imgproc.py:1-58`. The crop-size list is
doubly important on TPU: it is the *static shape bucket set* — one compiled
program per bucket (SURVEY.md §7) — so `generate_crop_size_list` defines the
compilation universe, not just the crop choices.
"""

from __future__ import annotations

import random
from typing import List, Tuple

import numpy as np
from PIL import Image


def center_crop_arr(pil_image, image_size: int):
    """ADM center crop (`imgproc.py:7-21`)."""
    while min(*pil_image.size) >= 2 * image_size:
        pil_image = pil_image.resize(tuple(x // 2 for x in pil_image.size), resample=Image.BOX)
    scale = image_size / min(*pil_image.size)
    pil_image = pil_image.resize(tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC)
    arr = np.array(pil_image)
    crop_y = (arr.shape[0] - image_size) // 2
    crop_x = (arr.shape[1] - image_size) // 2
    return Image.fromarray(arr[crop_y : crop_y + image_size, crop_x : crop_x + image_size])


def center_crop(pil_image, crop_size: Tuple[int, int]):
    """Random-position crop after scale-to-cover (`imgproc.py:24-35`)."""
    while pil_image.size[0] >= 2 * crop_size[0] and pil_image.size[1] >= 2 * crop_size[1]:
        pil_image = pil_image.resize(tuple(x // 2 for x in pil_image.size), resample=Image.BOX)
    scale = max(crop_size[0] / pil_image.size[0], crop_size[1] / pil_image.size[1])
    pil_image = pil_image.resize(tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC)
    crop_left = random.randint(0, pil_image.size[0] - crop_size[0])
    crop_upper = random.randint(0, pil_image.size[1] - crop_size[1])
    return pil_image.crop(
        box=(crop_left, crop_upper, crop_left + crop_size[0], crop_upper + crop_size[1])
    )


def var_center_crop(pil_image, crop_size_list: List[Tuple[int, int]], random_top_k: int = 4):
    """Pick among the top-k closest-aspect buckets at random (`imgproc.py:38-44`)."""
    w, h = pil_image.size
    rem_percent = [min(cw / w, ch / h) / max(cw / w, ch / h) for cw, ch in crop_size_list]
    crop_size = random.choice(
        sorted(((x, y) for x, y in zip(rem_percent, crop_size_list)), reverse=True)[:random_top_k]
    )[1]
    return center_crop(pil_image, crop_size)


def match_bucket(width: int, height: int, crop_size_list: List[Tuple[int, int]]) -> Tuple[int, int]:
    """Deterministic best bucket for (width, height) — used at batching time
    so every item in a batch shares one static shape."""
    rem = [
        (min(cw / width, ch / height) / max(cw / width, ch / height), (cw, ch))
        for cw, ch in crop_size_list
    ]
    return max(rem)[1]


def generate_crop_size_list(num_patches: int, patch_size: int, max_ratio: float = 4.0):
    """All (w, h) with w/p * h/p <= num_patches and aspect <= max_ratio
    (`imgproc.py:47-58`)."""
    assert max_ratio >= 1.0
    crop_size_list = []
    wp, hp = num_patches, 1
    while wp > 0:
        if max(wp, hp) / min(wp, hp) <= max_ratio:
            crop_size_list.append((wp * patch_size, hp * patch_size))
        if (hp + 1) * wp <= num_patches:
            hp += 1
        else:
            wp -= 1
    return crop_size_list


def to_latent_input(pil_image) -> np.ndarray:
    """PIL -> CHW float32 in [-1, 1] (the reference's transform stack)."""
    arr = np.asarray(pil_image.convert("RGB"), np.float32) / 255.0
    arr = (arr - 0.5) / 0.5
    return arr.transpose(2, 0, 1)
