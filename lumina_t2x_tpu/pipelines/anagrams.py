"""Visual anagrams: multi-view optical illusions and panoramas.

TPU-native re-design of `visual_anagrams/` (views library
`visual_anagrams/visual_anagrams/views/__init__.py:23-50`, generation
pipeline `visual_anagrams/generate.py:1-498`):

- **views** are invertible latent-space transforms (C, H, W) -> (C, H, W)
  implemented as pure jnp ops, so the entire multi-view denoise loop — view,
  denoise, inverse-view, average over views — compiles into one `lax.scan`
  program (the reference dispatches per-view CUDA work from python each
  step);
- **phase 1 (init)**: per step, each view's prompt denoises the viewed
  latent with a midpoint step; inverted noises are averaged
  (`generate.py:387-414`);
- **phase 2 (upscale)**: skip-residual guidance — the phase-1 result is
  upsampled, re-encoded (tiled VAE), and blended into the model input with a
  cosine-decay factor c(t) = 0.5 (1 + cos(pi t)); a noise-inversion step
  runs between the half-steps (`midpoint_solver_extra`,
  `generate.py:222-262`);
- **tiled VAE encode/decode** with overlap-averaged windows for 1024x4096
  panoramas (`generate.py:26-173`).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Views: invertible latent transforms (views/*.py)
# ---------------------------------------------------------------------------


class BaseView:
    """view / inverse_view pair (`views/view_base.py:1-36`)."""

    def view(self, x):
        raise NotImplementedError

    def inverse_view(self, x):
        raise NotImplementedError


class IdentityView(BaseView):
    def view(self, x):
        return x

    inverse_view = view


class FlipView(BaseView):
    def view(self, x):
        return jnp.flip(x, axis=-2)

    inverse_view = view


class Rotate180View(BaseView):
    def view(self, x):
        return jnp.rot90(x, k=2, axes=(-2, -1))

    inverse_view = view


class Rotate90CWView(BaseView):
    def view(self, x):
        return jnp.rot90(x, k=-1, axes=(-2, -1))

    def inverse_view(self, x):
        return jnp.rot90(x, k=1, axes=(-2, -1))


class Rotate90CCWView(BaseView):
    def view(self, x):
        return jnp.rot90(x, k=1, axes=(-2, -1))

    def inverse_view(self, x):
        return jnp.rot90(x, k=-1, axes=(-2, -1))


class NegateView(BaseView):
    def view(self, x):
        return -x

    inverse_view = view


class SkewView(BaseView):
    """Circular row shifts proportional to the row index."""

    def __init__(self, skew_factor: float = 1.5):
        self.skew_factor = skew_factor

    def _roll(self, x, sign):
        h = x.shape[-2]
        rows = []
        for r in range(h):
            shift = int(sign * self.skew_factor * r)
            rows.append(jnp.roll(x[..., r, :], shift, axis=-1))
        return jnp.stack(rows, axis=-2)

    def view(self, x):
        return self._roll(x, 1)

    def inverse_view(self, x):
        return self._roll(x, -1)


class PatchPermuteView(BaseView):
    """Seeded permutation of square patches (`views/view_patch_permute.py`)."""

    def __init__(self, num_patches: int = 8, seed: int = 0):
        self.num_patches = num_patches
        self.seed = seed

    def _perm(self, n):
        return np.random.RandomState(self.seed).permutation(n)

    def view(self, x):
        c, h, w = x.shape[-3:]
        p = self.num_patches
        ph, pw = h // p, w // p
        patches = x.reshape(*x.shape[:-3], c, p, ph, p, pw)
        patches = jnp.moveaxis(patches, (-4, -2), (-2, -1))  # (..., c, ph, pw, p, p)
        flat = patches.reshape(*patches.shape[:-2], p * p)
        perm = jnp.asarray(self._perm(p * p))
        flat = flat[..., perm]
        patches = flat.reshape(*patches.shape[:-2], p, p)
        patches = jnp.moveaxis(patches, (-2, -1), (-4, -2))
        return patches.reshape(*x.shape)

    def inverse_view(self, x):
        c, h, w = x.shape[-3:]
        p = self.num_patches
        ph, pw = h // p, w // p
        patches = x.reshape(*x.shape[:-3], c, p, ph, p, pw)
        patches = jnp.moveaxis(patches, (-4, -2), (-2, -1))
        flat = patches.reshape(*patches.shape[:-2], p * p)
        perm = self._perm(p * p)
        inv = np.argsort(perm)
        flat = flat[..., jnp.asarray(inv)]
        patches = flat.reshape(*patches.shape[:-2], p, p)
        patches = jnp.moveaxis(patches, (-2, -1), (-4, -2))
        return patches.reshape(*x.shape)


class PixelPermuteView(PatchPermuteView):
    def __init__(self, num_patches: int = 32, seed: int = 0):
        super().__init__(num_patches, seed)


class InnerCircleView(BaseView):
    """Rotate the inner disk by 180 degrees (self-inverse variant of
    `views/permutations.py:9-110`)."""

    def view(self, x):
        h, w = x.shape[-2:]
        yy, xx = np.mgrid[0:h, 0:w]
        cy, cx = (h - 1) / 2, (w - 1) / 2
        r = min(h, w) * 0.45
        mask = ((yy - cy) ** 2 + (xx - cx) ** 2) < r**2
        rotated = jnp.rot90(x, k=2, axes=(-2, -1))
        return jnp.where(jnp.asarray(mask), rotated, x)

    inverse_view = view


class SquareHingeView(BaseView):
    """Rotate each quadrant by 180 degrees in place (hinge flip)."""

    def view(self, x):
        h, w = x.shape[-2:]
        hh, hw = h // 2, w // 2
        q = lambda a: jnp.rot90(a, k=2, axes=(-2, -1))
        top = jnp.concatenate([q(x[..., :hh, :hw]), q(x[..., :hh, hw:])], axis=-1)
        bot = jnp.concatenate([q(x[..., hh:, :hw]), q(x[..., hh:, hw:])], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    inverse_view = view


def gaussian_blur(x, sigma: float, kernel_size: int):
    """Separable 2-D gaussian blur over (..., H, W), reflect padding.
    kernel_size must be odd: an even kernel with symmetric (half, half)
    padding makes the 'valid' convolution emit n+1 samples — a shape
    mismatch that would only surface deep inside jit."""
    if kernel_size % 2 == 0:
        raise ValueError(f"gaussian_blur kernel_size must be odd, got {kernel_size}")
    half = kernel_size // 2
    t = np.arange(kernel_size) - half
    k = np.exp(-(t**2) / (2.0 * sigma**2))
    k = jnp.asarray(k / k.sum(), jnp.float32)

    def conv1d(a, axis):
        a = jnp.moveaxis(a, axis, -1)
        pad = [(0, 0)] * (a.ndim - 1) + [(half, half)]
        ap = jnp.pad(a, pad, mode="reflect")
        flat = ap.reshape(-1, ap.shape[-1])
        out = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(flat)
        return jnp.moveaxis(out.reshape(*a.shape[:-1], -1), -1, axis)

    return conv1d(conv1d(x.astype(jnp.float32), -2), -1).astype(x.dtype)


def _scaled_blur(noise, sigma, kernel_size):
    """Stage-aware kernel scaling (`view_hybrid.py:52-59`)."""
    h = noise.shape[-2]
    factor = max(h // 64, 1)
    k = kernel_size * factor + ((factor + 1) % 2)
    return gaussian_blur(noise, sigma * factor, k)


class GrayscaleView(BaseView):
    """Factorized diffusion: view = identity; inverse projects the first 3
    channels onto their mean (`view_color.py:39-49`)."""

    def view(self, x):
        return x

    def inverse_view(self, x):
        gray = jnp.mean(x[:3], axis=0, keepdims=True)
        return x.at[:3].set(jnp.broadcast_to(gray, x[:3].shape))


class ColorView(BaseView):
    """Inverse keeps the color residual (`view_color.py:59-65`)."""

    def view(self, x):
        return x

    def inverse_view(self, x):
        gray = jnp.mean(x[:3], axis=0, keepdims=True)
        return x.at[:3].set(x[:3] - gray)


class HybridLowPassView(BaseView):
    """Inverse keeps the low-frequency band (`view_hybrid.py:40-66`)."""

    def __init__(self, sigma: float = 2.0, kernel_size: int = 33):
        self.sigma, self.kernel_size = sigma, kernel_size

    def view(self, x):
        return x

    def inverse_view(self, x):
        return x.at[:3].set(_scaled_blur(x[:3], self.sigma, self.kernel_size))


class HybridHighPassView(HybridLowPassView):
    def inverse_view(self, x):
        return x.at[:3].set(x[:3] - _scaled_blur(x[:3], self.sigma, self.kernel_size))


class TripleHybridLowPassView(BaseView):
    def __init__(self, sigma_1: float = 1.0, sigma_2: float = 4.0, kernel_size: int = 33):
        self.sigma_1, self.sigma_2, self.kernel_size = sigma_1, sigma_2, kernel_size

    def view(self, x):
        return x

    def _bands(self, x):
        lp = _scaled_blur(x[:3], self.sigma_2, self.kernel_size)
        mid_cut = _scaled_blur(x[:3], self.sigma_1, self.kernel_size)
        return lp, mid_cut - lp, x[:3] - mid_cut

    def inverse_view(self, x):
        lp, _, _ = self._bands(x)
        return x.at[:3].set(lp)


class TripleHybridMediumPassView(TripleHybridLowPassView):
    def inverse_view(self, x):
        _, mp, _ = self._bands(x)
        return x.at[:3].set(mp)


class TripleHybridHighPassView(TripleHybridLowPassView):
    def inverse_view(self, x):
        _, _, hp = self._bands(x)
        return x.at[:3].set(hp)


class JigsawView(BaseView):
    """Procedural jigsaw: seeded permutation + per-piece 180-degree rotations
    over a grid. (The reference's jigsaw uses shipped piece-mask assets,
    `views/assets/4x4/`; this variant is asset-free but equally invertible.)"""

    def __init__(self, grid: int = 4, seed: int = 0):
        self.grid = grid
        rng = np.random.RandomState(seed)
        self.perm = rng.permutation(grid * grid)
        self.rots = rng.randint(0, 2, grid * grid) * 2  # 0 or 180 degrees

    def _pieces(self, x):
        c, h, w = x.shape[-3:]
        g = self.grid
        return x.reshape(c, g, h // g, g, w // g).transpose(1, 3, 0, 2, 4).reshape(
            g * g, c, h // g, w // g
        )

    def _assemble(self, pieces, shape):
        c, h, w = shape
        g = self.grid
        return pieces.reshape(g, g, c, h // g, w // g).transpose(2, 0, 3, 1, 4).reshape(c, h, w)

    def view(self, x):
        pieces = self._pieces(x)
        rot = jnp.stack([
            jnp.rot90(pieces[i], k=int(self.rots[i] // 90), axes=(-2, -1))
            for i in range(len(self.perm))
        ])
        return self._assemble(rot[jnp.asarray(self.perm)], x.shape[-3:])

    def inverse_view(self, x):
        pieces = self._pieces(x)
        inv = np.argsort(self.perm)
        unperm = pieces[jnp.asarray(inv)]
        unrot = jnp.stack([
            jnp.rot90(unperm[i], k=-int(self.rots[i] // 90), axes=(-2, -1))
            for i in range(len(self.perm))
        ])
        return self._assemble(unrot, x.shape[-3:])


class ScaleView(BaseView):
    """view = identity; inverse scales the first 3 channels
    (`views/view_scale.py:1-11`)."""

    def __init__(self, scale: float = 0.5):
        self.scale = scale

    def view(self, x):
        return x

    def inverse_view(self, x):
        return x.at[:3].set(self.scale * x[:3])


class WhiteBalanceViewFailure(BaseView):
    """'Dress illusion' attempt: view scales all pixel values by a constant;
    inverse divides the first 3 channels (`views/view_white_balance.py:41-46`).
    Kept for parity — the reference labels it a known-failure view."""

    def __init__(self, factor: float = 1.5):
        self.factor = factor

    def view(self, x):
        # scale only the first 3 channels, mirroring inverse_view: the
        # reference operates on 3-channel pixels where "all" == ":3"; on a
        # 4-channel latent an asymmetric pair would integrate channel 3
        # along an inconsistent trajectory (view without inverse)
        return x.at[:3].set(self.factor * x[:3])

    def inverse_view(self, x):
        return x.at[:3].set(x[:3] / self.factor)


class BlurViewFailure(BaseView):
    """Blur by bilinear downsample-then-upsample (`views/view_blur.py:38-46`);
    the transform is not invertible so the inverse is pass-through
    (`view_blur.py:48-50`)."""

    def __init__(self, factor: int = 8):
        self.factor = int(factor)

    def view(self, x):
        h, w = x.shape[-2:]
        small_shape = (*x.shape[:-2], h // self.factor, w // self.factor)
        small = jax.image.resize(x.astype(jnp.float32), small_shape, "linear")
        return jax.image.resize(small, x.shape, "linear").astype(x.dtype)

    def inverse_view(self, x):
        return x


def _diagonal_blur(x, size: int):
    """Depthwise conv with the normalized identity (diagonal streak) kernel
    `eye(size)/size`, SAME padding `size//2` (`views/view_motion.py:40-46`)."""
    k = (jnp.eye(size, dtype=jnp.float32) / size)[None, None]  # (O=1, I=1, H, W)
    c = x.shape[-3]
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32)[None].reshape(-1, c, *x.shape[-2:]),
        jnp.tile(k, (c, 1, 1, 1)),
        window_strides=(1, 1),
        padding=[(size // 2, size // 2)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )
    return out.reshape(x.shape).astype(x.dtype)


class MotionBlurView(BaseView):
    """view = identity; inverse applies a diagonal motion-blur kernel to the
    first 3 channels, kernel size scaled by `h // 64` and forced odd
    (`views/view_motion.py:25-47`)."""

    def __init__(self, size: int = 7):
        self.size = int(size)

    def _kernel_size(self, h: int) -> int:
        factor = max(h // 64, 1)
        size = self.size * factor
        return size + ((factor + 1) % 2)

    def view(self, x):
        return x

    def inverse_view(self, x):
        size = self._kernel_size(x.shape[-2])
        return x.at[:3].set(_diagonal_blur(x[:3], size))

    def save_view(self, x):
        """Blur the whole image for saving (`view_motion.py:49-62`)."""
        size = self._kernel_size(x.shape[-2])
        return _diagonal_blur(x, size)


class MotionBlurResView(MotionBlurView):
    """Residual variant: inverse keeps `x - blur(x)`
    (`views/view_motion.py:67-89`)."""

    def inverse_view(self, x):
        size = self._kernel_size(x.shape[-2])
        return x.at[:3].set(x[:3] - _diagonal_blur(x[:3], size))


def _rotate_bilinear(x, angle_deg: float):
    """Counter-clockwise bilinear rotation about the image center with
    zero fill (torchvision `TF.rotate` semantics used at
    `views/view_inner_circle.py:120-122`)."""
    h, w = x.shape[-2:]
    theta = jnp.deg2rad(angle_deg)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h) - cy, jnp.arange(w) - cx, indexing="ij")
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # sample the source at the coordinates rotated the opposite way
    src_y = cos * yy + sin * xx + cy
    src_x = -sin * yy + cos * xx + cx
    flat = x.reshape(-1, h, w)
    out = jnp.stack([
        jax.scipy.ndimage.map_coordinates(
            flat[i].astype(jnp.float32), [src_y, src_x], order=1, mode="constant"
        )
        for i in range(flat.shape[0])
    ])
    return out.reshape(x.shape).astype(x.dtype)


class InnerCircleViewFailure(BaseView):
    """Bilinear (lossy) rotation of the inner disk of radius `3/8 * size` by
    `angle` degrees; inverse rotates by `-angle`
    (`views/view_inner_circle.py:61-145`). Kept for parity — the reference
    labels interpolated rotation a known-failure view."""

    def __init__(self, interpolation: str = "bilinear", angle: float = 135.0):
        if interpolation != "bilinear":
            raise NotImplementedError("only bilinear interpolation is supported")
        self.angle = angle

    def _masked_rotate(self, x, angle):
        size = x.shape[-1]
        r = int(size / 8 * 3)
        coords = jnp.arange(size) - size / 2.0
        yy, xx = jnp.meshgrid(coords, coords, indexing="ij")
        mask = (xx**2 + yy**2 < r**2).astype(x.dtype)
        return mask * _rotate_bilinear(x, angle) + (1 - mask) * x

    def view(self, x):
        return self._masked_rotate(x, self.angle)

    def inverse_view(self, x):
        return self._masked_rotate(x, -self.angle)


VIEW_MAP: Dict[str, Callable[[], BaseView]] = {
    "identity": IdentityView,
    "flip": FlipView,
    "rotate_cw": Rotate90CWView,
    "rotate_ccw": Rotate90CCWView,
    "rotate_180": Rotate180View,
    "negate": NegateView,
    "skew": SkewView,
    "patch_permute": PatchPermuteView,
    "pixel_permute": PixelPermuteView,
    "inner_circle": InnerCircleView,
    "square_hinge": SquareHingeView,
    "jigsaw": JigsawView,
    "grayscale": GrayscaleView,
    "color": ColorView,
    "low_pass": HybridLowPassView,
    "high_pass": HybridHighPassView,
    "triple_low_pass": TripleHybridLowPassView,
    "triple_medium_pass": TripleHybridMediumPassView,
    "triple_high_pass": TripleHybridHighPassView,
    "scale": ScaleView,
    "white_balance_failure": WhiteBalanceViewFailure,
    "blur_failure": BlurViewFailure,
    "inner_circle_failure": InnerCircleViewFailure,
    "motion": MotionBlurView,
    "motion_res": MotionBlurResView,
}


def get_anagrams_views(view_names: Sequence[str], view_args=None) -> List[BaseView]:
    """Name-keyed view factory (`views/__init__.py:52-70`)."""
    views = []
    view_args = view_args or [None] * len(view_names)
    for name, arg in zip(view_names, view_args):
        cls = VIEW_MAP.get(name)
        if cls is None:
            raise NotImplementedError(
                f"view {name!r} not available (asset-based views like jigsaw "
                f"require the reference's piece assets)"
            )
        views.append(cls(arg) if arg is not None else cls())
    return views


# ---------------------------------------------------------------------------
# Custom solvers (`generate.py:212-262`)
# ---------------------------------------------------------------------------


def midpoint_delta(func, t0, t1, y0):
    """dt * f(y + f(y,t0) dt/2, t_mid) — the displacement of one midpoint
    step (`midpoint_solver`, `generate.py:212-219`)."""
    b = y0.shape[0]
    dt = t1 - t0
    f0 = func(y0, jnp.full((b,), t0))
    y_mid = y0 + f0 * (0.5 * dt)
    return func(y_mid, jnp.full((b,), t0 + 0.5 * dt)) * dt


def midpoint_delta_extra(func, t0, t1, y0, guidance, noise, anchor, view_fn):
    """Skip-residual guided midpoint step (`midpoint_solver_extra`,
    `generate.py:222-262`): blend `(1-c) y + c guidance_t` with cosine-decay
    c(t), view the input, noise-invert between half-steps."""
    b = y0.shape[0]
    dt = t1 - t0
    half_dt = 0.5 * dt
    t_mid = t0 + half_dt

    c0 = 0.5 * (1.0 + jnp.cos(jnp.pi * t0))
    guidance_t = (t0 * guidance + (1.0 - t0) * noise) / anchor
    model_input = (1.0 - c0) * y0 + c0 * guidance_t
    viewed = view_fn.view(model_input[0])
    viewed = jnp.stack([viewed] * b)
    f0 = func(viewed, jnp.full((b,), t0))

    noise_pred = -f0 * half_dt
    inv = view_fn.inverse_view(noise_pred[0])
    y_mid = y0 - jnp.stack([inv] * b)

    c1 = 0.5 * (1.0 + jnp.cos(jnp.pi * t_mid))
    guidance_t = (t_mid * guidance + (1.0 - t_mid) * noise) / anchor
    model_input = (1.0 - c1) * y_mid + c1 * guidance_t
    viewed = view_fn.view(model_input[0])
    viewed = jnp.stack([viewed] * b)
    return func(viewed, jnp.full((b,), t_mid)) * dt


def anagram_init_phase(model_fns: Sequence[Callable], views: Sequence[BaseView],
                       z, timesteps):
    """Phase 1 (`generate.py:387-414`): per step, average the view-inverted
    noise predictions across (prompt, view) pairs. One lax.scan over steps."""
    t_pairs = jnp.stack([timesteps[:-1], timesteps[1:]], axis=1)

    def step(noisy_img, t_pair):
        t0, t1 = t_pair[0], t_pair[1]
        inverted = []
        for fn, view_fn in zip(model_fns, views):
            viewed = view_fn.view(noisy_img[0])
            viewed = jnp.stack([viewed] * noisy_img.shape[0])
            noise = -midpoint_delta(fn, t0, t1, viewed)
            inverted.append(view_fn.inverse_view(noise[0]))
        reduced = jnp.mean(jnp.stack(inverted), axis=0)
        return noisy_img - reduced[None], None

    out, _ = jax.lax.scan(step, z, t_pairs)
    return out


def anagram_upscale_phase(model_fns: Sequence[Callable], views: Sequence[BaseView],
                          z, guidance, timesteps):
    """Phase 2 (`generate.py:465-494`): skip-residual guided refinement."""
    anchor = jnp.ones_like(guidance)
    noise = z
    t_pairs = jnp.stack([timesteps[:-1], timesteps[1:]], axis=1)

    def step(noisy_img, t_pair):
        t0, t1 = t_pair[0], t_pair[1]
        inverted = []
        for fn, view_fn in zip(model_fns, views):
            d = -midpoint_delta_extra(fn, t0, t1, noisy_img, guidance, noise, anchor, view_fn)
            inverted.append(view_fn.inverse_view(d[0]))
        reduced = jnp.mean(jnp.stack(inverted), axis=0)
        return noisy_img - reduced[None], None

    out, _ = jax.lax.scan(step, z, t_pairs)
    return out


# ---------------------------------------------------------------------------
# Tiled VAE (`generate.py:26-173`)
# ---------------------------------------------------------------------------


def get_tile_views(height: int, width: int, window_size: int = 128, stride: int = 64):
    """MultiDiffusion-style window coordinates (`generate.py:26-57`)."""
    nh = int((height - window_size) / stride - 1e-6) + 2 if height > window_size else 1
    nw = int((width - window_size) / stride - 1e-6) + 2 if width > window_size else 1
    views = []
    for i in range(nh * nw):
        h_start = (i // nw) * stride
        h_end = h_start + window_size
        w_start = (i % nw) * stride
        w_end = w_start + window_size
        if h_end > height:
            h_start, h_end = height - window_size, height
        if w_end > width:
            w_start, w_end = width - window_size, width
        h_start, w_start = max(h_start, 0), max(w_start, 0)
        views.append((h_start, h_end, w_start, w_end))
    return views


def tiled_apply(fn: Callable, x, window: int, stride: int, scale: int, out_channels: int):
    """Apply `fn` over overlapping windows, average overlaps.

    `scale` < 1 means the output is smaller (encode, 1/8); > 1 larger
    (decode, 8x). Window coords are in input space.
    """
    b, c, h, w = x.shape
    views = get_tile_views(h, w, window, stride)

    def o(v):
        return int(v * scale)

    out = jnp.zeros((b, out_channels, o(h), o(w)), jnp.float32)
    count = jnp.zeros((1, 1, o(h), o(w)), jnp.float32)
    for (hs, he, ws, we) in views:
        patch = fn(x[:, :, hs:he, ws:we]).astype(jnp.float32)
        out = out.at[:, :, o(hs): o(he), o(ws): o(we)].add(patch)
        count = count.at[:, :, o(hs): o(he), o(ws): o(we)].add(1.0)
    return out / count


def tiled_encode(encode_fn: Callable, images, window: int = 1024, stride: int = 512):
    """images (B,3,H,W) -> latents (B,4,H/8,W/8) via overlapped windows
    (`generate.py:60-117`)."""
    return tiled_apply(encode_fn, images, window, stride, scale=1 / 8, out_channels=4)


def tiled_decode(decode_fn: Callable, latents, window: int = 128, stride: int = 64):
    """latents (B,4,h,w) -> images (B,3,8h,8w) (`generate.py:120-173`)."""
    return tiled_apply(decode_fn, latents, window, stride, scale=8, out_channels=3)
