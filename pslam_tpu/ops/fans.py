"""Fan detection + structural-line (LIL) hypothesis construction.

Replaces CPartiallyRecoverConnectivity (reference
add_src/PartiallyRecoverConnectivity.cpp:14-133) and the structural-line
builder inside Frame::ExtractLSD (src/Frame.cc:489-646) with masked pairwise
matrix ops:

- fan candidates: for each ordered line pair (i, j), j must drop an endpoint
  into i's rotated search rect (length + 2r x 2r, r = expandWidth = 20,
  Frame.h:217), the angle gap must exceed fanThr = pi/4 (mod-pi, both sides),
  and the infinite-line intersection must land inside i's rect and >= 4 px
  inside the image (PartiallyRecoverConnectivity.cpp:44-106);
- unordered dedup keeps the first row-major occurrence
  (PartiallyRecoverConnectivity.cpp:107-133);
- 3D crosspoint: closest point of approach of the two fitted 3D lines (2x2
  solve, Frame::Frame_shortestDistance, Frame.cc:380-424) gated by the
  reference's mid-point distance test;
- plane hypothesis: normal = cross of the 3D directions, coplanarity
  dmax - dmin <= 0.05 over both endpoint pairs + crosspoint, d = -mean,
  sign-fixed (Frame.cc:553-633);
- OldPlane dedup (|delta d| <= 0.2 and |cos| >= 0.9397 -> duplicate,
  Frame.cc:474-487) as a first-occurrence mask over the candidate set.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

EXPAND_WIDTH = 20.0  # Frame.h:217
FAN_THR = jnp.pi / 4  # Frame.h:218
COPLANAR_TOL = 0.05  # Frame.cc:619
OLDPLANE_D = 0.2  # Frame.cc:480
OLDPLANE_COS = 0.9397  # cos(20 deg)? reference comment says 30 deg (:482)
BORDER = 4.0


class LILFeatures(NamedTuple):
    """Fixed-capacity per-frame structural-line hypotheses (camera frame)."""

    line_idx: jnp.ndarray  # (Q, 2) int32 indices (l1, l2) into LineFeatures
    cross2d: jnp.ndarray  # (Q, 2) 2D intersection (CrossPoint_2D)
    cross3d: jnp.ndarray  # (Q, 3) 3D crosspoint (CrossPoint_3D, cam frame)
    plane: jnp.ndarray  # (Q, 4) plane (n, d), |n| = 1, d >= 0 (mvPlanes)
    eq1: jnp.ndarray  # (Q, 3) normalized image-line eq of line 1 (mvle_l)
    eq2: jnp.ndarray  # (Q, 3)
    p1s: jnp.ndarray  # (Q, 3) 3D endpoints of line 1 (cam frame)
    p1e: jnp.ndarray  # (Q, 3)
    p2s: jnp.ndarray  # (Q, 3) 3D endpoints of line 2
    p2e: jnp.ndarray  # (Q, 3)
    valid: jnp.ndarray  # (Q,) bool


def _in_rect(pt, mid, ang, half_w, half_h):
    """Point-in-rotated-rect (isPtInRotatedRect semantics). Broadcasts:
    pt (..., 2) vs rect params (...,)."""
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    dx = pt[..., 0] - mid[..., 0]
    dy = pt[..., 1] - mid[..., 1]
    fx = ca * dx + sa * dy
    fy = sa * dx - ca * dy
    return (
        (fx >= -half_w) & (fx < half_w) & (fy >= -half_h) & (fy < half_h)
    )


def _line_intersection(sp_i, ep_i, sp_j, ep_j):
    """Infinite-line intersections for all pairs. Inputs (L, 2) each side
    broadcast to (L, L, 2). Returns (pt (L, L, 2), ok (L, L))."""
    a1 = sp_i[..., 1] - ep_i[..., 1]
    b1 = ep_i[..., 0] - sp_i[..., 0]
    c1 = ep_i[..., 1] * sp_i[..., 0] - sp_i[..., 1] * ep_i[..., 0]
    a2 = sp_j[..., 1] - ep_j[..., 1]
    b2 = ep_j[..., 0] - sp_j[..., 0]
    c2 = ep_j[..., 1] * sp_j[..., 0] - sp_j[..., 1] * ep_j[..., 0]
    det = a1 * b2 - a2 * b1
    ok = jnp.abs(det) > 1e-9
    det_safe = jnp.where(ok, det, 1.0)
    x = (-c1 * b2 + c2 * b1) / det_safe
    y = (a1 * -c2 + a2 * c1) / det_safe
    return jnp.stack([x, y], axis=-1), ok


def _closest_point_of_approach(p1, d1, p2, d2):
    """Midpoint of the shortest segment between two 3D lines (p + t*d).

    Frame_shortestDistance's 2x2 solve (Frame.cc:380-424). Returns
    (crosspoint (..., 3), ok (...,))."""
    d11 = jnp.sum(d1 * d1, axis=-1)
    d12 = jnp.sum(d1 * d2, axis=-1)
    d22 = jnp.sum(d2 * d2, axis=-1)
    p21 = p1 - p2
    r1 = jnp.sum(p21 * d1, axis=-1)
    r2 = jnp.sum(p21 * d2, axis=-1)
    det = d11 * (-d22) + d12 * d12  # det [[d11, -d12], [d12, -d22]]
    ok = jnp.abs(det) > 1e-12
    det_safe = jnp.where(ok, det, 1.0)
    t1 = (-r1 * (-d22) - (-d12) * (-r2)) / det_safe
    t2 = (d11 * (-r2) - d12 * (-r1)) / det_safe
    root1 = p1 + t1[..., None] * d1
    root2 = p2 + t2[..., None] * d2
    return 0.5 * (root1 + root2), ok


@partial(jax.jit, static_argnames=("n_lil", "width", "height"))
def build_lils(
    sp, ep, eq2d, line_valid,
    p3s, p3e, dir3d, ok3d,
    n_lil: int = 64,
    width: int = 640,
    height: int = 480,
) -> LILFeatures:
    """Detect fans over a line set and build coplanar LIL hypotheses.

    2D inputs from ops.lines.detect_lines, 3D from ops.line3d.fit_lines_3d.
    """
    L = sp.shape[0]
    d2 = ep - sp
    length = jnp.linalg.norm(d2, axis=-1)
    ang = jnp.arctan2(d2[..., 1], d2[..., 0])
    mid = 0.5 * (sp + ep)

    # --- fan candidate mask (L_i, L_j) ---------------------------------
    r = EXPAND_WIDTH
    half_w = (length + 2.0 * r) / 2.0
    half_h = jnp.full_like(length, r)

    def rect_i(pt_j):  # pt_j (L, 2) -> (L_i, L_j) membership in rect of i
        return _in_rect(
            pt_j[None, :, :], mid[:, None, :], ang[:, None],
            half_w[:, None], half_h[:, None],
        )

    endpoint_in = rect_i(sp) | rect_i(ep)

    dang = jnp.abs(ang[:, None] - ang[None, :]) % jnp.pi
    angle_ok = (dang >= FAN_THR) & (jnp.pi - dang >= FAN_THR)

    ipt, int_ok = _line_intersection(
        sp[:, None, :], ep[:, None, :], sp[None, :, :], ep[None, :, :]
    )
    in_rect = _in_rect(ipt, mid[:, None, :], ang[:, None], half_w[:, None], half_h[:, None])
    in_img = (
        (ipt[..., 0] >= BORDER)
        & (ipt[..., 0] < width - BORDER)
        & (ipt[..., 1] >= BORDER)
        & (ipt[..., 1] < height - BORDER)
    )
    not_self = ~jnp.eye(L, dtype=bool)
    fan = (
        endpoint_in & angle_ok & int_ok & in_rect & in_img & not_self
        & line_valid[:, None] & line_valid[None, :]
    )
    # Unordered dedup, first row-major occurrence: (i, j) with i < j wins
    # unless only (j, i) is a fan.
    upper = jnp.arange(L)[:, None] < jnp.arange(L)[None, :]
    fan = fan & (upper | ~fan.T)

    # --- select top candidates by combined 2D length --------------------
    score = jnp.where(fan, length[:, None] + length[None, :], -1.0)
    flat = score.reshape(-1)
    k = min(4 * n_lil, flat.shape[0])
    top_v, top_idx = jax.lax.top_k(flat, k)
    li = top_idx // L
    lj = top_idx % L
    cand_ok = top_v > 0.0

    # --- 3D crosspoint ---------------------------------------------------
    P1s, P1e = p3s[li], p3e[li]
    P2s, P2e = p3s[lj], p3e[lj]
    cross3d, cpa_ok = _closest_point_of_approach(P1s, P1e - P1s, P2s, P2e - P2s)
    # Reference gate: 2*|mid1-mid2| < |line1_6d| + |line2_6d|
    # (Frame_shortestDistance, Frame.cc:412-424).
    m1 = 0.5 * (P1s + P1e)
    m2 = 0.5 * (P2s + P2e)
    n6_1 = jnp.sqrt(jnp.sum(P1s * P1s, -1) + jnp.sum(P1e * P1e, -1))
    n6_2 = jnp.sqrt(jnp.sum(P2s * P2s, -1) + jnp.sum(P2e * P2e, -1))
    near_ok = 2.0 * jnp.linalg.norm(m1 - m2, axis=-1) < (n6_1 + n6_2)
    cand_ok = (
        cand_ok & cpa_ok & near_ok & ok3d[li] & ok3d[lj]
        & (jnp.linalg.norm(cross3d, axis=-1) > 1e-9)
    )

    # --- coplanarity + plane hypothesis ---------------------------------
    n = jnp.cross(dir3d[li], dir3d[lj])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    ds = jnp.stack(
        [
            jnp.sum(n * P1s, -1), jnp.sum(n * P1e, -1),
            jnp.sum(n * P2s, -1), jnp.sum(n * P2e, -1),
            jnp.sum(n * cross3d, -1),
        ],
        axis=-1,
    )  # (k, 5)
    dspread = jnp.max(ds, -1) - jnp.min(ds, -1)
    plane_d = -jnp.mean(ds, axis=-1)
    flip = plane_d < 0.0
    n = jnp.where(flip[:, None], -n, n)
    plane_d = jnp.where(flip, -plane_d, plane_d)
    plane = jnp.concatenate([n, plane_d[:, None]], axis=-1)
    cand_ok = cand_ok & (dspread <= COPLANAR_TOL)

    # --- OldPlane dedup: drop candidates similar to an earlier one -------
    cos = jnp.abs(jnp.einsum("ai,bi->ab", n, n))
    dd = jnp.abs(plane_d[:, None] - plane_d[None, :])
    similar = (cos >= OLDPLANE_COS) & (dd <= OLDPLANE_D)
    earlier = (
        jnp.arange(k)[None, :] < jnp.arange(k)[:, None]
    )  # candidates are already in priority (score) order
    dup = jnp.any(similar & earlier & cand_ok[None, :], axis=1)
    cand_ok = cand_ok & ~dup

    # --- final fixed-capacity selection ----------------------------------
    fsc = jnp.where(cand_ok, top_v, -1.0)
    sel_v, sel = jax.lax.top_k(fsc, min(n_lil, k))
    valid = sel_v > 0.0

    def take(a):
        return a[sel]

    return LILFeatures(
        line_idx=jnp.stack([li[sel], lj[sel]], axis=-1).astype(jnp.int32),
        cross2d=take(ipt[li, lj]),
        cross3d=take(cross3d),
        plane=take(plane),
        eq1=eq2d[li[sel]],
        eq2=eq2d[lj[sel]],
        p1s=take(P1s),
        p1e=take(P1e),
        p2s=take(P2s),
        p2e=take(P2e),
        valid=valid,
    )
