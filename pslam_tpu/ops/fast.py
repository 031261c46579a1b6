"""FAST-16 corner response, fully vectorized over a level stack.

Replaces the per-cell cv::FAST calls of ORBextractor::ComputeKeyPointsOctTree
(reference src/ORBextractor.cc:765-853). Instead of looping 35px cells with a
threshold fallback, we compute the segment-test mask and a contrast score for
*every* pixel of every level in one shot (16 shifted comparisons on the VPU),
at both the high and low thresholds; the caller then applies the
grid/fallback/top-k selection as masked reductions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3: 16 (dx, dy) offsets in cyclic (clockwise)
# order starting at 12 o'clock — the standard FAST-16 test geometry.
CIRCLE = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)
ARC_LEN = 9  # FAST-9/16 contiguous arc requirement (cv::FastFeatureDetector)


def _shift2d(img, dy: int, dx: int):
    """Shift (..., H, W) by (dy, dx) with zero fill (borders masked later)."""
    return jnp.roll(img, shift=(-dy, -dx), axis=(-2, -1))


def _has_arc9(mask16):
    """(16, ...) bool ring mask -> True where a contiguous arc of >= 9
    circle pixels is set. Packs the ring into an int32 bitmask and uses
    log-step shift-ANDs (runs>=2 -> >=4 -> >=8 -> >=9): ~10 int ops instead
    of the naive 16 rotations x 8 ANDs."""
    w = jnp.asarray(
        np.asarray([1 << s for s in range(16)], np.int32), jnp.int32
    ).reshape((16,) + (1,) * (mask16.ndim - 1))
    m = jnp.sum(mask16.astype(jnp.int32) * w, axis=0)
    mm = m | (m << 16)  # unwrap the cycle
    r = mm & (mm >> 1)
    r = r & (r >> 2)
    r = r & (r >> 4)  # runs >= 8
    r = r & (mm >> 8)  # runs >= 9
    return (r & 0xFFFF) != 0


@partial(jax.jit, static_argnames=("th_hi", "th_lo"))
def fast_score_dual(stack, th_hi: int, th_lo: int):
    """One-pass FAST at BOTH thresholds (sharing the 16 shifted reads —
    the memory-bound part) + the low-threshold ranking score.

    Returns (corner_hi, corner_lo, score_lo). Replaces two fast_score calls
    in the extractor (the high-threshold score was never used: the
    grid-fallback ranking uses the low-threshold score everywhere,
    mirroring cv::FAST's scoring at the detection threshold).
    """
    center = stack
    neigh = jnp.stack(
        [_shift2d(stack, int(dy), int(dx)) for (dx, dy) in CIRCLE], axis=0
    )  # (16, ..., H, W)
    diff = neigh - center[None]

    t_lo = jnp.asarray(th_lo, stack.dtype)
    brighter_lo = diff > t_lo
    darker_lo = diff < -t_lo
    t_hi = jnp.asarray(th_hi, stack.dtype)
    corner_hi = _has_arc9(diff > t_hi) | _has_arc9(diff < -t_hi)
    corner_lo = _has_arc9(brighter_lo) | _has_arc9(darker_lo)

    excess = jnp.abs(diff) - t_lo
    score_b = jnp.sum(jnp.where(brighter_lo, excess, 0.0), axis=0)
    score_d = jnp.sum(jnp.where(darker_lo, excess, 0.0), axis=0)
    score_lo = jnp.maximum(score_b, score_d)
    return corner_hi, corner_lo, score_lo


@partial(jax.jit, static_argnames=("threshold",))
def fast_score(stack, threshold: int):
    """Segment test + score for each pixel.

    stack: (..., H, W) float32 intensities.
    Returns (is_corner (..., H, W) bool, score (..., H, W) float32) where
    score is the sum of |I_p - I_center| over circle pixels on the dominant
    (brighter/darker) arc side — the same ranking statistic cv::FAST uses.
    Border pixels (3px) are NOT masked here.
    """
    center = stack
    t = jnp.asarray(threshold, stack.dtype)

    neigh = jnp.stack(
        [_shift2d(stack, int(dy), int(dx)) for (dx, dy) in CIRCLE], axis=0
    )  # (16, ..., H, W)
    diff = neigh - center[None]
    brighter = diff > t
    darker = diff < -t

    def has_arc(mask):
        # Contiguous run of ARC_LEN around the 16-cycle: OR over the 16
        # rotations of an AND over ARC_LEN consecutive elements.
        out = jnp.zeros_like(mask[0])
        for s in range(16):
            run = mask[s]
            for i in range(1, ARC_LEN):
                run = run & mask[(s + i) % 16]
            out = out | run
        return out

    is_corner = has_arc(brighter) | has_arc(darker)

    excess = jnp.abs(diff) - t
    score_b = jnp.sum(jnp.where(brighter, excess, 0.0), axis=0)
    score_d = jnp.sum(jnp.where(darker, excess, 0.0), axis=0)
    score = jnp.maximum(score_b, score_d)
    return is_corner, score


def nms3x3(score):
    """3x3 non-maximum suppression mask for (..., H, W) scores."""
    neigh_max = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh_max = jnp.maximum(neigh_max, _shift2d(score, dy, dx))
    return score >= neigh_max
