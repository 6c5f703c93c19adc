"""Image preprocessing: aspect-ratio bucketing and crops.

Behavior parity with `lumina_next_t2i/imgproc.py:1-58` (same crop geometry,
same RNG-draw order, same bucket set). The crop-size list is doubly important
on TPU: it is the *static shape bucket set* — one compiled program per bucket
(SURVEY.md §7) — so `generate_crop_size_list` defines the compilation
universe, not just the crop choices.
"""

from __future__ import annotations

import random
from typing import List, Tuple

from PIL import Image


def _shrink_by_halves(img, min_w: int, min_h: int):
    """Repeated 2x box downsampling while another halving still keeps both
    dimensions at/above (min_w, min_h) — the antialiasing pre-pass of the ADM
    preprocessing (box filter is exact for 2x)."""
    w, h = img.size
    while w // 2 >= min_w and h // 2 >= min_h:
        w, h = w // 2, h // 2
        img = img.resize((w, h), resample=Image.BOX)
    return img


def center_crop_arr(pil_image, image_size: int):
    """ADM square center crop (`imgproc.py:7-21`): halve to near target,
    bicubic-scale the short side to `image_size`, crop the middle."""
    img = _shrink_by_halves(pil_image, image_size, image_size)
    w, h = img.size
    s = image_size / min(w, h)
    img = img.resize((round(w * s), round(h * s)), resample=Image.BICUBIC)
    w, h = img.size
    left, top = (w - image_size) // 2, (h - image_size) // 2
    return img.crop((left, top, left + image_size, top + image_size))


def center_crop(pil_image, crop_size: Tuple[int, int]):
    """Scale-to-cover then crop at a uniformly random position
    (`imgproc.py:24-35` — despite the name the position is random; the
    randomness is the reference's crop augmentation)."""
    cw, ch = crop_size
    img = _shrink_by_halves(pil_image, cw, ch)
    w, h = img.size
    s = max(cw / w, ch / h)
    img = img.resize((round(w * s), round(h * s)), resample=Image.BICUBIC)
    w, h = img.size
    left = random.randint(0, w - cw)
    top = random.randint(0, h - ch)
    return img.crop((left, top, left + cw, top + ch))


def _aspect_fit(img_w: int, img_h: int, bucket: Tuple[int, int]) -> float:
    """How well `bucket`'s aspect matches the image: the fraction of the
    image kept after scale-to-cover + crop, in (0, 1], 1 = exact aspect."""
    sw, sh = bucket[0] / img_w, bucket[1] / img_h
    return min(sw, sh) / max(sw, sh)


def var_center_crop(pil_image, crop_size_list: List[Tuple[int, int]], random_top_k: int = 4):
    """Crop to one of the `random_top_k` best-aspect buckets, chosen at
    random (`imgproc.py:38-44`) — trades a little aspect fidelity for shape
    diversity across epochs. Equal-fit buckets rank by larger (w, h), the
    reference's tuple-sort tie-break."""
    w, h = pil_image.size
    ranked = sorted(crop_size_list, key=lambda c: (_aspect_fit(w, h, c), c), reverse=True)
    return center_crop(pil_image, random.choice(ranked[:random_top_k]))


def match_bucket(width: int, height: int, crop_size_list: List[Tuple[int, int]]) -> Tuple[int, int]:
    """Deterministic best bucket for (width, height) — used at batching time
    so every item in a batch shares one static shape. Same tie-break as
    `var_center_crop` (larger bucket wins on equal fit)."""
    return max(crop_size_list, key=lambda c: (_aspect_fit(width, height, c), c))


def choose_bucket(width: int, height: int, crop_size_list: List[Tuple[int, int]],
                  *, seed: int, index: int, random_top_k: int = 4) -> Tuple[int, int]:
    """`var_center_crop`'s random top-k bucket draw, made DETERMINISTIC per
    dataset item: the draw is seeded by (seed, index) so every data-parallel
    rank computes the identical bucket for any global item from metadata
    alone — the cross-rank agreement `bucket_batched_global` requires —
    while keeping the reference's crop-diversity augmentation (the chosen
    bucket still varies across items and across seeds)."""
    ranked = sorted(crop_size_list, key=lambda c: (_aspect_fit(width, height, c), c),
                    reverse=True)
    return random.Random((seed << 32) ^ index).choice(ranked[:random_top_k])


def generate_crop_size_list(num_patches: int, patch_size: int, max_ratio: float = 4.0):
    """All pixel sizes (w, h) = (wp, hp) * patch_size on the staircase
    boundary of {wp * hp <= num_patches}, aspect capped at max_ratio
    (`imgproc.py:47-58`). Enumerated row-by-row: for each width wp
    (descending) the heights from just-past the previous column's tallest up
    to this column's tallest, floor(num_patches / wp) — which is exactly the
    boundary staircase."""
    assert max_ratio >= 1.0
    sizes: List[Tuple[int, int]] = []
    prev_tallest = 1
    for wp in range(num_patches, 0, -1):
        tallest = num_patches // wp
        for hp in range(prev_tallest, tallest + 1):
            if max(wp, hp) <= max_ratio * min(wp, hp):
                sizes.append((wp * patch_size, hp * patch_size))
        prev_tallest = tallest
    return sizes


def to_latent_input(pil_image):
    """PIL -> CHW float32 in [-1, 1] (the reference's transform stack)."""
    import numpy as np

    arr = np.asarray(pil_image.convert("RGB"), np.float32) / 255.0
    return ((arr - 0.5) / 0.5).transpose(2, 0, 1)
