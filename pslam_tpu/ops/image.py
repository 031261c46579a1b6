"""Image pyramid and blur ops.

Replaces ORBextractor::ComputePyramid (reference src/ORBextractor.cc:1107)
with a padded level *stack*: all levels live on one (L, H, W) canvas so the
whole frontend runs as a single static-shape batched program — the
TPU-idiomatic alternative to per-level OpenCV calls. Invalid canvas area is
masked, not branched over.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PYR_LEVELS = 8
PYR_SCALE = 1.2  # reference ORBextractor.scaleFactor (TUM1.yaml:49)


def level_shapes(h: int, w: int, levels: int = PYR_LEVELS, scale: float = PYR_SCALE):
    """Concrete (h_l, w_l) per level, matching cv::resize round()."""
    out = []
    for l in range(levels):
        s = 1.0 / scale**l
        out.append((int(round(h * s)), int(round(w * s))))
    return out


def build_pyramid(img, levels: int = PYR_LEVELS, scale: float = PYR_SCALE):
    """img (H, W) float32 -> (stack (L, H, W), level_scale (L,), valid (L, H, W)).

    Level l contains the bilinear-downsampled image in its top-left
    (h_l, w_l) corner; the rest of the canvas is zero and masked.
    """
    h, w = img.shape
    shapes = level_shapes(h, w, levels, scale)
    lvls = []
    masks = []
    cur = img
    for l, (hl, wl) in enumerate(shapes):
        if l == 0:
            lvl = img
        else:
            # Successive resize from the previous level (reference resizes
            # level l from level l-1, ORBextractor.cc:1107-1129).
            lvl = jax.image.resize(cur, (hl, wl), method="bilinear")
        cur = lvl
        pad = jnp.zeros((h, w), img.dtype).at[:hl, :wl].set(lvl)
        m = jnp.zeros((h, w), bool).at[:hl, :wl].set(True)
        lvls.append(pad)
        masks.append(m)
    stack = jnp.stack(lvls)
    valid = jnp.stack(masks)
    level_scale = jnp.asarray([scale**l for l in range(levels)], img.dtype)
    return stack, level_scale, valid


def _gaussian_kernel1d(ksize: int, sigma: float):
    x = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return jnp.asarray(k / k.sum(), jnp.float32)


@partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(stack, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur on a level stack (L, H, W) (or (H, W)).

    Matches the GaussianBlur(7, 7, 2, 2, BORDER_REFLECT_101) applied before
    descriptor sampling (ORBextractor.cc:1063-1066).
    """
    squeeze = stack.ndim == 2
    if squeeze:
        stack = stack[None]
    k = _gaussian_kernel1d(ksize, sigma)
    pad = ksize // 2
    x = jnp.pad(stack, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[:, None],
        k.reshape(1, 1, ksize, 1),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[:, None],
        k.reshape(1, 1, 1, ksize),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    return x[0] if squeeze else x


def sample_nearest(stack, lvl_idx, y, x):
    """Nearest-neighbour gather from a level stack.

    stack (L, H, W); lvl_idx/y/x broadcastable int/float arrays. Coordinates
    are clamped to the canvas.
    """
    h, w = stack.shape[-2:]
    yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
    return stack[lvl_idx, yi, xi]
