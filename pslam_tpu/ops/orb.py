"""Oriented-FAST + rotated-BRIEF extraction as one batched device program.

Replaces ORBextractor (reference src/ORBextractor.cc) end to end:

- ComputeKeyPointsOctTree (765): per-cell FAST with high->low threshold
  fallback becomes full-stack FAST at both thresholds + a per-cell fallback
  mask; DistributeOctTree's sequential quadtree (539) becomes grid-bucketed
  per-cell top-k followed by per-level top-quota — same goal (spatially
  spread, response-ranked, scale-distributed keypoints) without data-
  dependent control flow.
- IC_Angle (77): per-keypoint circular-patch moments become two 31x31
  convolutions over the whole stack (MXU) sampled at keypoint locations.
- computeOrbDescriptor (108): 256 learned pairs are replaced by a seeded
  Gaussian pattern (BRIEF-style); bits are gathered from the blurred stack
  with per-keypoint rotated offsets and packed to uint8[32].

The descriptor pattern differs bit-for-bit from OpenCV's learned table (we
do not copy it); matching is internal to this framework so only
self-consistency matters. Pattern quality is validated by the matching tests
(viewpoint/rotation invariance).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pslam_tpu.ops.fast import fast_score, nms3x3
from pslam_tpu.ops.image import build_pyramid, gaussian_blur

HALF_PATCH = 15  # reference HALF_PATCH_SIZE (ORBextractor.cc:73)
EDGE = 16  # reference minBorder = EDGE_THRESHOLD-3 (ORBextractor.cc:771-774)


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    n_features: int = 1000
    levels: int = 8
    scale: float = 1.2
    th_fast_hi: int = 20  # iniThFAST (TUM1.yaml:58)
    th_fast_lo: int = 7  # minThFAST (TUM1.yaml:62)
    cell: int = 32  # spread-grid cell size on the canvas
    k_per_cell: int = 8

    @property
    def level_quota(self):
        """Per-level keypoint budget, geometric in 1/scale — mirrors
        mnFeaturesPerLevel (ORBextractor.cc:442-457)."""
        f = 1.0 / self.scale
        n_desired = self.n_features * (1 - f) / (1 - f**self.levels)
        quotas = [int(round(n_desired * f**l)) for l in range(self.levels)]
        quotas[-1] = max(self.n_features - sum(quotas[:-1]), 0)
        return quotas

    @property
    def capacity(self):
        return sum(self.level_quota)


from typing import NamedTuple  # noqa: E402


class OrbFeatures(NamedTuple):
    """SoA keypoint set (fixed capacity N = config.capacity)."""

    uv: jnp.ndarray  # (N, 2) level-0 pixel coords (x, y)
    uv_lvl: jnp.ndarray  # (N, 2) level-local coords on the canvas
    level: jnp.ndarray  # (N,) int32 octave
    response: jnp.ndarray  # (N,) float32
    angle: jnp.ndarray  # (N,) float32 radians
    desc: jnp.ndarray  # (N, 32) uint8 packed 256-bit descriptor
    valid: jnp.ndarray  # (N,) bool


# ---------------------------------------------------------------------------
# Orientation: circular-patch moments as convolutions
# ---------------------------------------------------------------------------


def _moment_kernels():
    r = HALF_PATCH
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    mask = (xs**2 + ys**2) <= r**2 + 1  # circular patch like IC_Angle's u_max
    kx = (xs * mask).astype(np.float32)
    ky = (ys * mask).astype(np.float32)
    return jnp.asarray(kx), jnp.asarray(ky)


def keypoint_angles(stack, uv_lvl, level):
    """IC angle at each keypoint via patch gather + moment matmul.

    A whole-image 31x31 single-channel conv costs ~32ms/frame on TPU (no
    channel contraction to feed the MXU); gathering the ~1k keypoint patches
    (N, 961) and contracting against the two moment kernels as a matmul is
    ~0.5ms for identical results at the sampled locations.
    """
    h, w = stack.shape[-2:]
    kx, ky = _moment_kernels()
    r = HALF_PATCH
    offs = jnp.stack(
        jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2)  # (961, 2) [dy, dx]
    yi = jnp.clip(uv_lvl[:, 1:2].astype(jnp.int32) + offs[None, :, 0], 0, h - 1)
    xi = jnp.clip(uv_lvl[:, 0:2][:, 0:1].astype(jnp.int32) + offs[None, :, 1], 0, w - 1)
    flat = (level[:, None] * h + yi) * w + xi
    patches = stack.reshape(-1)[flat]  # (N, 961)
    kmat = jnp.stack([kx.reshape(-1), ky.reshape(-1)], axis=-1)  # (961, 2)
    m = jnp.dot(patches, kmat, preferred_element_type=jnp.float32)  # (N, 2)
    return jnp.arctan2(m[:, 1], m[:, 0])


# ---------------------------------------------------------------------------
# Descriptor pattern
# ---------------------------------------------------------------------------


def _brief_pattern(n_bits: int = 256, seed: int = 1234):
    """(n_bits, 4) int32 [ax, ay, bx, by] Gaussian test pairs (BRIEF G-II).

    sigma = patch/5 per the BRIEF paper; clipped to stay inside the rotated
    patch radius.
    """
    rng = np.random.default_rng(seed)
    sigma = (2 * HALF_PATCH + 1) / 5.0
    pts = rng.normal(0.0, sigma, size=(n_bits, 4))
    pts = np.clip(np.round(pts), -(HALF_PATCH - 2), HALF_PATCH - 2)
    return jnp.asarray(pts.astype(np.int32))


_PATTERN = _brief_pattern()


# ---------------------------------------------------------------------------
# Extraction
# ---------------------------------------------------------------------------


def _per_level_mask(shape, levels, scale, h, w):
    """Detection-valid mask per level: inside the level extent minus EDGE."""
    masks = []
    ys, xs = np.mgrid[0:h, 0:w]
    for l in range(levels):
        s = 1.0 / scale**l
        hl, wl = int(round(h * s)), int(round(w * s))
        m = (
            (xs >= EDGE)
            & (xs < wl - EDGE)
            & (ys >= EDGE)
            & (ys < hl - EDGE)
        )
        masks.append(m)
    return jnp.asarray(np.stack(masks))


@partial(jax.jit, static_argnames=("cfg",))
def extract_orb(img, cfg: OrbConfig = OrbConfig()) -> OrbFeatures:
    """img: (H, W) float32 grayscale in [0, 255] -> OrbFeatures."""
    h, w = img.shape
    L = cfg.levels
    stack, level_scale, _ = build_pyramid(img, L, cfg.scale)
    # Materialize the pyramid: without the barrier XLA fuses the whole
    # resize chain into every downstream gather (descriptor sampling went
    # 0.3ms -> 530ms when fused on TPU).
    stack = jax.lax.optimization_barrier(stack)
    det_mask = _per_level_mask((h, w), L, cfg.scale, h, w)

    # --- FAST at both thresholds, with per-cell fallback ------------------
    hi_corner, score = fast_score(stack, cfg.th_fast_hi)
    lo_corner, score_lo = fast_score(stack, cfg.th_fast_lo)
    keep_nms = nms3x3(jnp.where(lo_corner & det_mask, score_lo, 0.0))

    cs = cfg.cell
    ncy, ncx = h // cs, w // cs
    hc, wc = ncy * cs, ncx * cs  # crop ragged edge of the cell grid

    def to_cells(x):
        return x[:, :hc, :wc].reshape(L, ncy, cs, ncx, cs)

    hi_in_cell = jnp.any(
        to_cells(hi_corner & det_mask), axis=(2, 4)
    )  # (L, ncy, ncx)
    hi_b = jnp.repeat(jnp.repeat(hi_in_cell, cs, axis=1), cs, axis=2)
    hi_full = jnp.zeros_like(hi_corner).at[:, :hc, :wc].set(hi_b)

    eff = (
        det_mask
        & keep_nms
        & lo_corner
        & (hi_corner | ~hi_full)  # low threshold only where cell has no hi
    )
    eff_score = jnp.where(eff, score_lo, 0.0)

    # --- spatial spread: top-k per cell, then top-quota per level ---------
    cell_scores = to_cells(eff_score).transpose(0, 1, 3, 2, 4).reshape(
        L, ncy, ncx, cs * cs
    )
    k = cfg.k_per_cell
    top_v, top_i = jax.lax.top_k(cell_scores, k)  # (L, ncy, ncx, k)
    iy = top_i // cs
    ix = top_i % cs
    cy = jnp.arange(ncy)[None, :, None, None]
    cx = jnp.arange(ncx)[None, None, :, None]
    ys = (cy * cs + iy).reshape(L, -1)
    xs = (cx * cs + ix).reshape(L, -1)
    vs = top_v.reshape(L, -1)

    quotas = cfg.level_quota
    uv_lvl, level_arr, resp = [], [], []
    for l in range(L):
        q = quotas[l]
        v_l, idx = jax.lax.top_k(vs[l], q)
        uv_lvl.append(jnp.stack([xs[l][idx], ys[l][idx]], axis=-1))
        level_arr.append(jnp.full((q,), l, jnp.int32))
        resp.append(v_l)
    uv_lvl = jnp.concatenate(uv_lvl).astype(jnp.float32)  # (N, 2) canvas coords
    level = jnp.concatenate(level_arr)
    response = jnp.concatenate(resp)
    valid = response > 0.0

    # --- orientation ------------------------------------------------------
    uv_lvl, level, response = jax.lax.optimization_barrier(
        (uv_lvl, level, response)
    )
    angle = keypoint_angles(stack, uv_lvl, level)

    # --- descriptors ------------------------------------------------------
    blurred = jax.lax.optimization_barrier(gaussian_blur(stack))
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    pat = _PATTERN.astype(jnp.float32)  # (256, 4)

    def rot(px, py):
        # (N, 256) rotated sample offsets (reference computeOrbDescriptor
        # GET_VALUE semantics: x' = x cos - y sin, y' = x sin + y cos).
        rx = px[None, :] * ca[:, None] - py[None, :] * sa[:, None]
        ry = px[None, :] * sa[:, None] + py[None, :] * ca[:, None]
        return rx, ry

    ax, ay = rot(pat[:, 0], pat[:, 1])
    bx, by = rot(pat[:, 2], pat[:, 3])

    def sample(dx, dy):
        sy = jnp.clip(jnp.round(uv_lvl[:, 1:2] + dy).astype(jnp.int32), 0, h - 1)
        sx = jnp.clip(jnp.round(uv_lvl[:, 0:1] + dx).astype(jnp.int32), 0, w - 1)
        flat = (level[:, None] * h + sy) * w + sx
        return blurred.reshape(-1)[flat]  # (N, 256)

    bits = (sample(ax, ay) < sample(bx, by)).astype(jnp.uint8)  # (N, 256)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    desc = jnp.sum(
        bits.reshape(-1, 32, 8) * weights[None, None, :], axis=-1, dtype=jnp.uint8
    )

    # --- level-0 coordinates & output ------------------------------------
    uv0 = uv_lvl * level_scale[level][:, None]
    return OrbFeatures(
        uv=uv0,
        uv_lvl=uv_lvl,
        level=level,
        response=response,
        angle=angle,
        desc=desc,
        valid=valid,
    )


def scale_sigma2(cfg: OrbConfig):
    """Per-level sigma^2 (reference mvLevelSigma2, Frame.cc ctor)."""
    return jnp.asarray(
        [(cfg.scale**l) ** 2 for l in range(cfg.levels)], jnp.float32
    )
