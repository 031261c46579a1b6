"""Local mapping (backend): BA problem assembly + write-back, point culling.

Replaces the LocalMapping thread (reference src/LocalMapping.cc): runs
synchronously after each keyframe insertion (the reference's thread overlap
becomes async dispatch later). The numeric core is solver/local_ba.py; this
module does the host-side gather/scatter between MapState and the
fixed-capacity BAProblem.
"""

from __future__ import annotations

import numpy as np

from pslam_tpu.models.map_state import MapState
from pslam_tpu.solver.local_ba import BAProblem
from pslam_tpu.utils.config import SlamConfig


def assemble_local_ba(map_state: MapState, kf_idx: int, cfg: SlamConfig):
    """Build a BAProblem around keyframe ``kf_idx``.

    Free cameras: ``kf_idx`` + its best covisible keyframes (1-hop local
    window, Optimizer.cc:2112); fixed: other observers of the local points
    (Optimizer.cc:2125). KF 0 is always fixed (gauge).
    Returns (prob, cam_ids (C,), pt_ids (P,), edge meta) or None if there is
    nothing to optimize.
    """
    caps = cfg.caps
    n_free_cap = caps.ba_free

    # KF 0 always stays fixed (gauge anchor, like the reference's pKF->mnId==0
    # setFixed at Optimizer.cc:2121).
    covis = map_state.best_covisible(kf_idx, n_free_cap - 1)
    free_ids = [kf_idx] + [int(j) for j in covis if j != kf_idx and j != 0]
    free_ids = free_ids[:n_free_cap]
    free_set = set(free_ids)

    # Local points: union over free KFs.
    pt_ids = map_state.local_map_points(np.asarray(free_ids), caps.ba_points)
    if len(pt_ids) == 0:
        return None
    pt_slot = np.full(map_state.mp_valid.shape[0], -1, np.int64)
    pt_slot[pt_ids] = np.arange(len(pt_ids))

    # Cameras: free + fixed observers.
    feat_mp = map_state.kf_feat_mp[: map_state.n_kf]
    observes_local = (pt_slot[np.maximum(feat_mp, 0)] >= 0) & (feat_mp >= 0)
    obs_count = observes_local.sum(axis=1)
    fixed_ids = [
        k
        for k in np.flatnonzero(obs_count > 0)
        if k not in free_set and map_state.kf_valid[k]
    ]
    # Always pin the oldest involved KF; truncate to capacity.
    cam_ids = free_ids + fixed_ids[: caps.ba_cams - len(free_ids)]
    if len(free_ids) == len(cam_ids) and len(cam_ids) > 1:
        # No fixed camera at all -> fix the oldest free one for gauge.
        oldest = min(free_ids)
        free_ids = [k for k in free_ids if k != oldest]
        free_set = set(free_ids)

    C = caps.ba_cams
    cam_arr = np.zeros((C, 4, 4), np.float32)
    cam_arr[:] = np.eye(4)
    free_slot = np.full(C, -1, np.int32)
    for s, k in enumerate(cam_ids):
        cam_arr[s] = map_state.kf_pose[k]
    fs = 0
    for s, k in enumerate(cam_ids):
        if k in free_set:
            free_slot[s] = fs
            fs += 1

    # Edges.
    sigma2 = np.asarray(
        [(cfg.orb.scale**l) ** 2 for l in range(cfg.orb.levels)], np.float32
    )
    e_cam, e_pt, e_obs, e_is2, e_feat = [], [], [], [], []
    for s, k in enumerate(cam_ids):
        mp = map_state.kf_feat_mp[k]
        sel = np.flatnonzero((mp >= 0) & (pt_slot[np.maximum(mp, 0)] >= 0))
        if len(sel) == 0:
            continue
        e_cam.append(np.full(len(sel), s, np.int32))
        e_pt.append(pt_slot[mp[sel]].astype(np.int32))
        uv = map_state.kf_uv[k, sel]
        ur = map_state.kf_ur[k, sel]
        e_obs.append(
            np.concatenate([uv, ur[:, None]], axis=1).astype(np.float32)
        )
        e_is2.append(1.0 / sigma2[np.clip(map_state.kf_level[k, sel], 0, len(sigma2) - 1)])
        e_feat.append(np.stack([np.full(len(sel), k), sel], axis=1))

    if not e_cam:
        return None
    e_cam = np.concatenate(e_cam)
    e_pt = np.concatenate(e_pt)
    e_obs = np.concatenate(e_obs)
    e_is2 = np.concatenate(e_is2)
    e_feat = np.concatenate(e_feat)

    E = caps.ba_edges
    n_e = min(len(e_cam), E)
    if len(e_cam) > E:
        keep = np.random.default_rng(0).choice(len(e_cam), E, replace=False)
        e_cam, e_pt, e_obs, e_is2, e_feat = (
            e_cam[keep], e_pt[keep], e_obs[keep], e_is2[keep], e_feat[keep],
        )
        n_e = E

    def pad(a, shape, fill=0):
        out = np.full(shape, fill, a.dtype)
        out[: len(a)] = a
        return out

    P = caps.ba_points
    prob = BAProblem(
        T_cw=cam_arr,
        free_slot=free_slot,
        X_w=pad(map_state.mp_pos[pt_ids], (P, 3)),
        point_valid=pad(np.ones(len(pt_ids), bool), (P,)),
        cam_idx=pad(e_cam, (E,)),
        pt_idx=pad(e_pt, (E,)),
        obs=pad(e_obs, (E, 3)),
        inv_sigma2=pad(e_is2, (E,), 1.0),
        edge_valid=pad(np.ones(n_e, bool), (E,)),
    )
    return prob, cam_ids, pt_ids, e_feat, n_e


def write_back_ba(map_state: MapState, result, cam_ids, pt_ids, e_feat, n_e, free_slot):
    """Write optimized poses/points into the map and erase outlier
    observations (Optimizer.cc:2482-2532)."""
    T_opt, X_opt, inlier, _ = result
    T_opt = np.asarray(T_opt)
    X_opt = np.asarray(X_opt)
    inlier = np.asarray(inlier)
    for s, k in enumerate(cam_ids):
        if free_slot[s] >= 0:
            map_state.kf_pose[k] = T_opt[s]
    map_state.mp_pos[pt_ids] = X_opt[: len(pt_ids)]
    # Outlier observation erasure.
    bad = ~inlier[:n_e]
    if bad.any():
        kf_i = e_feat[:n_e][bad, 0]
        ft_i = e_feat[:n_e][bad, 1]
        mp_ids = map_state.kf_feat_mp[kf_i, ft_i]
        map_state.kf_feat_mp[kf_i, ft_i] = -1
        np.add.at(map_state.mp_n_obs, mp_ids[mp_ids >= 0], -1)


def cull_points(map_state: MapState, cfg: SlamConfig):
    """MapPointCulling (LocalMapping.cc:200-235): drop points with a bad
    found/visible ratio or too few observations shortly after creation."""
    n_kf = map_state.n_kf
    mp = map_state.mp_valid
    ratio = map_state.mp_found / np.maximum(map_state.mp_visible, 1)
    age = n_kf - 1 - map_state.mp_first_kf
    bad = mp & (
        ((ratio < 0.25) & (map_state.mp_visible >= 4))
        | ((age >= 2) & (map_state.mp_n_obs <= 1) & (map_state.mp_first_kf > 0))
    )
    ids = np.flatnonzero(bad)
    if len(ids):
        map_state.cull_map_points(ids)
    return len(ids)
