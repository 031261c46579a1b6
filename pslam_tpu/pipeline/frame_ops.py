"""Per-frame device program: feature extraction + RGB-D stereo.

Replaces the Frame RGB-D constructor pipeline (reference src/Frame.cc:133-210:
ExtractORB -> UndistortKeyPoints -> ComputeStereoFromRGBD -> grid assignment)
with one fused jit call. No feature grid is built — matching uses masked
distance matrices instead (ops/match.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pslam_tpu.geometry import Camera, backproject, undistort_points
from pslam_tpu.ops.image import sample_nearest
from pslam_tpu.ops.orb import OrbConfig, OrbFeatures, extract_orb


class FrameData(NamedTuple):
    """Device-side frame: SoA features + stereo depth (capacity N)."""

    uv: jnp.ndarray  # (N, 2) undistorted level-0 pixel coords
    ur: jnp.ndarray  # (N,) virtual right-image u, -1 if no depth
    depth: jnp.ndarray  # (N,) z in meters, 0 if invalid
    xyz_c: jnp.ndarray  # (N, 3) camera-frame backprojection (0 if no depth)
    level: jnp.ndarray  # (N,) int32
    angle: jnp.ndarray  # (N,)
    desc: jnp.ndarray  # (N, 32) uint8
    valid: jnp.ndarray  # (N,) bool


@partial(jax.jit, static_argnames=("cam", "orb_cfg"))
def make_frame(img, depth_img, cam: Camera, orb_cfg: OrbConfig) -> FrameData:
    """img (H, W) float32 [0..255]; depth_img (H, W) float32 meters (0=hole).

    Depth is sampled at the *raw* (distorted) keypoint location like
    Frame::ComputeStereoFromRGBD (Frame.cc:1342-1363), then keypoints are
    undistorted for all geometric use.
    """
    feats: OrbFeatures = extract_orb(img, orb_cfg)
    z = sample_nearest(depth_img[None], jnp.zeros_like(feats.level), feats.uv[:, 1], feats.uv[:, 0])
    has_depth = (z > 0.05) & feats.valid
    uv = undistort_points(cam, feats.uv)
    z_safe = jnp.where(has_depth, z, 1.0)
    ur = jnp.where(has_depth, uv[:, 0] - cam.bf / z_safe, -1.0)
    xyz_c = backproject(cam, uv, z) * has_depth[:, None]
    return FrameData(
        uv=uv,
        ur=ur,
        depth=jnp.where(has_depth, z, 0.0),
        xyz_c=xyz_c,
        level=feats.level,
        angle=feats.angle,
        desc=feats.desc,
        valid=feats.valid,
    )
