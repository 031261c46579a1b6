"""System facade + tracking orchestration.

Replaces System (reference src/System.cc) and the Tracking state machine
(src/Tracking.cc): per-frame entry point, initialization, motion-model
tracking, local-map tracking, keyframe policy, trajectory bookkeeping.

Host/device split: the host keeps MapState and makes control decisions; each
frame costs a small fixed number of fused device dispatches (extract+stereo,
track vs previous matches, track vs local map).
"""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp
import numpy as np

from pslam_tpu.models.map_state import MapState
from pslam_tpu.pipeline import line_mapping, local_mapping
from pslam_tpu.pipeline.frame_ops import (
    FrameData,
    FrameLineData,
    make_frame,
    make_frame_lines,
)
from pslam_tpu.pipeline.track_ops import (
    PointSet,
    track_against_points,
    track_local_map_step,
)
from pslam_tpu.solver.ba_lil import local_bundle_adjustment_lil
from pslam_tpu.solver.lil import LILPoseObs
from pslam_tpu.solver.local_ba import local_bundle_adjustment
from pslam_tpu.utils.config import SlamConfig


class TrackState(enum.Enum):
    # Mirrors Tracking::eTrackingState (Tracking.h:90-96).
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@dataclasses.dataclass
class HostFrame:
    """Host copy of a processed frame + its tracking results."""

    frame_id: int
    timestamp: float
    T_cw: np.ndarray  # (4, 4)
    uv: np.ndarray
    ur: np.ndarray
    depth: np.ndarray
    xyz_c: np.ndarray
    level: np.ndarray
    angle: np.ndarray
    desc: np.ndarray
    valid: np.ndarray
    feat_mp: np.ndarray  # map point id per feature, -1 = none
    # Line features (present when cfg.use_lines).
    line_sp: np.ndarray | None = None
    line_ep: np.ndarray | None = None
    line_desc: np.ndarray | None = None
    line_valid: np.ndarray | None = None
    line_p3s: np.ndarray | None = None
    line_p3e: np.ndarray | None = None
    line_ok3d: np.ndarray | None = None
    line_ml: np.ndarray | None = None  # map-line id per line slot, -1 none
    lil: FrameLineData | None = None  # .lil LILFeatures (device arrays ok)
    lil_il: np.ndarray | None = None  # map-InsectLine id per LIL slot


class SlamSystem:
    def __init__(self, cfg: SlamConfig | None = None, vocab=None):
        self.cfg = cfg or SlamConfig()
        self.map = MapState(self.cfg)
        self.state = TrackState.NO_IMAGES_YET
        self.frame_id = 0
        self.velocity = np.eye(4, dtype=np.float32)
        self.last: HostFrame | None = None
        self.ref_kf = 0
        # Trajectory rows are (ts, T_rel, ref_kf): the frame pose RELATIVE to
        # its reference keyframe (mlRelativeFramePoses, Tracking.cc:534-551),
        # chained against the CURRENT (loop-corrected) KF pose at save time
        # (System::SaveTrajectoryTUM, System.cc:323-384). ref_kf == -1 marks a
        # row frozen to an absolute pose (pre-reset history).
        self.trajectory: list[tuple[float, np.ndarray, int]] = []
        self.stats = {"ba_runs": 0, "culled": 0, "kf_inserted": 0}
        # Place recognition DB (System.cc:61-82: vocabulary + KeyFrameDatabase;
        # trained at startup instead of parsing ORBvoc.txt for minutes).
        self.kf_db = None
        if self.cfg.use_bow:
            from pslam_tpu.ops.bow import default_vocabulary
            from pslam_tpu.pipeline.keyframe_db import KeyFrameDatabase

            if vocab is None:
                vocab = default_vocabulary(
                    k=self.cfg.bow_k, levels=self.cfg.bow_levels
                )
            self.kf_db = KeyFrameDatabase(
                vocab, self.cfg.caps.max_keyframes, self.cfg.orb.capacity
            )
        # Loop closing (LoopClosing thread in the reference — shipped
        # disabled there, enabled here per BASELINE config 4).
        self.loop_closer = None
        if self.cfg.use_loop_closing and self.kf_db is not None:
            from pslam_tpu.pipeline.loop_closing import LoopCloser

            self.loop_closer = LoopCloser(self)

    # ------------------------------------------------------------------

    def track_rgbd(self, gray: np.ndarray, depth: np.ndarray, timestamp: float):
        """Process one RGB-D frame; returns the (4, 4) world->cam pose
        (System::TrackRGBD, System.cc:169)."""
        cam, orb = self.cfg.camera, self.cfg.orb
        gray_d = jnp.asarray(gray, jnp.float32)
        depth_d = jnp.asarray(depth, jnp.float32)
        fd: FrameData = make_frame(gray_d, depth_d, cam, orb)
        hf = self._to_host(fd, timestamp)
        if self.cfg.use_lines:
            fl: FrameLineData = make_frame_lines(
                gray_d, depth_d, cam, self.cfg.lines, self.cfg.caps.frame_lils
            )
            self._lines_to_host(hf, fl)

        if self.state in (TrackState.NO_IMAGES_YET, TrackState.NOT_INITIALIZED):
            self._initialize(hf, fd)
        elif self.state == TrackState.LOST:
            # Relocalization, or hard reset while the map is still tiny
            # (Tracking.cc:327, 518-526; System::Reset, System.cc:294).
            from pslam_tpu.pipeline.relocalization import relocalize

            if self.map.n_kf <= self.cfg.tracking.reset_if_lost_with_kfs:
                self.reset()
                self._initialize(hf, fd)
            elif relocalize(self, hf, fd):
                self.state = TrackState.OK
                self.velocity = np.eye(4, dtype=np.float32)
            else:
                hf.T_cw = self.last.T_cw.copy()
        else:
            self._track(hf, fd)

        self.last = hf
        self.frame_id += 1
        if self.state == TrackState.OK and self.map.n_kf > 0:
            T_rel = hf.T_cw @ np.linalg.inv(self.map.kf_pose[self.ref_kf])
            self.trajectory.append(
                (timestamp, T_rel.astype(np.float32), int(self.ref_kf))
            )
        else:
            self.trajectory.append((timestamp, hf.T_cw.copy(), -1))
        return hf.T_cw

    # ------------------------------------------------------------------

    def _to_host(self, fd: FrameData, timestamp) -> HostFrame:
        return HostFrame(
            frame_id=self.frame_id,
            timestamp=float(timestamp),
            T_cw=np.eye(4, dtype=np.float32),
            uv=np.asarray(fd.uv),
            ur=np.asarray(fd.ur),
            depth=np.asarray(fd.depth),
            xyz_c=np.asarray(fd.xyz_c),
            level=np.asarray(fd.level),
            angle=np.asarray(fd.angle),
            desc=np.asarray(fd.desc),
            valid=np.asarray(fd.valid),
            feat_mp=np.full(fd.uv.shape[0], -1, np.int32),
        )

    def _lines_to_host(self, hf: HostFrame, fl: FrameLineData):
        hf.line_sp = np.asarray(fl.sp)
        hf.line_ep = np.asarray(fl.ep)
        hf.line_desc = np.asarray(fl.desc)
        hf.line_valid = np.asarray(fl.valid)
        hf.line_p3s = np.asarray(fl.p3s)
        hf.line_p3e = np.asarray(fl.p3e)
        hf.line_ok3d = np.asarray(fl.ok3d)
        hf.line_ml = np.full(len(hf.line_valid), -1, np.int32)
        hf.lil = fl.lil
        hf.lil_il = np.full(self.cfg.caps.frame_lils, -1, np.int32)

    def _initialize(self, hf: HostFrame, fd: FrameData):
        """StereoInitialization (Tracking.cc:555-657): need enough
        depth-valid features, create the first KF and its map points."""
        n_depth = int((hf.depth > 0).sum())
        # Reference gate is a fixed 500 with a 1000-feature budget
        # (Tracking.cc:560); scale it to the configured capacity.
        if n_depth < min(500, self.cfg.orb.capacity // 2):
            self.state = TrackState.NOT_INITIALIZED
            return
        hf.T_cw = np.eye(4, dtype=np.float32)
        kf = self.map.add_keyframe(
            hf.frame_id, hf.timestamp, hf.T_cw, hf.uv, hf.ur, hf.level, hf.angle,
            hf.desc, hf.valid, hf.depth, np.full_like(hf.feat_mp, -1),
        )
        self._register_kf_bow(kf, hf)
        sel = np.flatnonzero((hf.depth > 0) & hf.valid)
        X_w = hf.xyz_c[sel]  # identity pose: camera frame == world frame
        ids = self.map.create_points_from_depth(kf, sel, X_w)
        hf.feat_mp[sel] = ids
        if self.cfg.use_lines and hf.line_valid is not None:
            line_mapping.create_or_attach_lines(self.map, kf, hf, hf.T_cw)
            if self.cfg.use_lils:
                line_mapping.create_or_attach_lils(self.map, kf, hf, hf.T_cw)
        self.ref_kf = kf
        self.state = TrackState.OK
        self.stats["kf_inserted"] += 1

    # ------------------------------------------------------------------

    def _track(self, hf: HostFrame, fd: FrameData):
        cfg_t = self.cfg.tracking
        cam, orb = self.cfg.camera, self.cfg.orb
        T_pred = (self.velocity @ self.last.T_cw).astype(np.float32)

        # --- 1. motion-model tracking vs last frame's map points ----------
        prev_mp = self.last.feat_mp
        prev_sel = np.flatnonzero(prev_mp >= 0)
        pts_prev = self._point_set(prev_mp[prev_sel], cap=len(prev_mp))
        res = track_against_points(
            cam, jnp.asarray(T_pred), pts_prev, fd, cfg_t.motion_match_radius,
            orb.scale, orb.levels,
        )
        if int(res.n_inliers) < cfg_t.min_track_inliers:
            # Widen the window (Tracking.cc:1198-1203), then fall back to
            # tracking against the reference KF's points.
            res = track_against_points(
                cam, jnp.asarray(T_pred), pts_prev, fd,
                cfg_t.motion_match_radius_wide, orb.scale, orb.levels,
            )
        if int(res.n_inliers) < cfg_t.min_track_inliers:
            # Reference-KF fallback: un-windowed descriptor matching
            # (TrackReferenceKeyFrame / SearchByBoW, Tracking.cc:880) —
            # recovers from motion far outside any projection window.
            from pslam_tpu.pipeline.track_ops import (
                track_against_points_unwindowed,
            )

            ref_mp = self.map.kf_feat_mp[self.ref_kf]
            ref_sel = ref_mp[ref_mp >= 0]
            pts_ref = self._point_set(ref_sel, cap=len(prev_mp))
            res = track_against_points_unwindowed(
                cam, jnp.asarray(self.last.T_cw), pts_ref, fd,
                orb.scale, orb.levels,
            )
            prev_sel = np.arange(len(ref_sel))
            track_ids = np.full(len(prev_mp), -1, np.int32)
            track_ids[: len(ref_sel)] = ref_sel
        else:
            track_ids = np.full(len(prev_mp), -1, np.int32)
            track_ids[: len(prev_sel)] = prev_mp[prev_sel]

        # Per-feature map-point assignment from the first solve.
        match_point = np.asarray(res.match_point)
        inlier = np.asarray(res.inlier)

        # --- 2. local-map tracking ---------------------------------------
        local_kfs = self._local_keyframes()
        pt_ids = self.map.local_map_points(local_kfs, self.cfg.caps.local_points)
        local_set = self._point_set(pt_ids, cap=self.cfg.caps.local_points)
        # Prior matches: feature index per local point where the first solve
        # already matched that point.
        prior = np.full(self.cfg.caps.local_points, -1, np.int32)
        if len(pt_ids):
            slot_of_mp = {int(m): i for i, m in enumerate(pt_ids)}
            for p_slot, f_idx in zip(np.flatnonzero(match_point >= 0),
                                     match_point[match_point >= 0]):
                mp_id = track_ids[p_slot]
                if mp_id >= 0 and int(mp_id) in slot_of_mp and inlier[p_slot]:
                    prior[slot_of_mp[int(mp_id)]] = f_idx

        # --- structural lines: plane association + LIL pose terms ---------
        lil_obs = None
        if self.cfg.use_lines and hf.lil is not None:
            if self.cfg.use_lils:
                lil_obs = self._associate_lils(hf, np.asarray(res.T_cw))
            self._track_lines_f2f(hf)

        res2 = track_local_map_step(
            cam, res.T_cw, local_set, fd, jnp.asarray(prior),
            cfg_t.local_match_radius, orb.scale, orb.levels,
            lil=lil_obs,
        )
        hf.T_cw = np.asarray(res2.T_cw)

        # Local-map line search (SearchLocalLines, Tracking.cc:1754-1838):
        # recover map-line associations lost by the f2f chain.
        if self.cfg.use_lines and hf.line_valid is not None:
            line_mapping.track_local_map_lines(self, hf, hf.T_cw)

        # --- 3. bookkeeping ----------------------------------------------
        m2 = np.asarray(res2.match_point)
        in2 = np.asarray(res2.inlier)
        vis2 = np.asarray(res2.visible)
        if len(pt_ids):
            np.add.at(self.map.mp_visible, pt_ids[vis2[: len(pt_ids)]], 1)
            good = (m2[: len(pt_ids)] >= 0) & in2[: len(pt_ids)]
            np.add.at(self.map.mp_found, pt_ids[good], 1)
            hf.feat_mp[m2[: len(pt_ids)][good]] = pt_ids[good]

        n_inliers = int(res2.n_inliers)
        if n_inliers < cfg_t.min_track_inliers:
            self.state = TrackState.LOST
            self.velocity = np.eye(4, dtype=np.float32)
        else:
            self.state = TrackState.OK
            self.velocity = (hf.T_cw @ np.linalg.inv(self.last.T_cw)).astype(
                np.float32
            )
            if self._need_new_keyframe(hf, n_inliers):
                self._create_keyframe(hf)

    # ------------------------------------------------------------------

    def _associate_lils(self, hf: HostFrame, T_pred) -> LILPoseObs | None:
        """Plane-associate frame LILs with map InsectLines and build the
        fixed-capacity LIL pose-observation set (Tracking.cc:1196-1209 via
        Map::AssociatePlanesByBoundary)."""
        lil = hf.lil
        state_c = np.concatenate(
            [
                np.asarray(lil.p1s), np.asarray(lil.p1e),
                np.asarray(lil.p2s), np.asarray(lil.p2e),
                np.asarray(lil.cross3d),
            ],
            axis=-1,
        ).astype(np.float32)
        hf.lil_il = line_mapping.associate_planes(
            self.map, state_c, np.asarray(lil.plane), np.asarray(lil.valid),
            T_pred, self.cfg,
        )
        matched = hf.lil_il >= 0
        if not matched.any():
            return None
        QF = self.cfg.caps.frame_lils
        state = np.zeros((QF, 15), np.float32)
        state[matched] = self.map.il_state[hf.lil_il[matched]]
        obs = line_mapping.lil_obs8(lil)
        return LILPoseObs(
            state=jnp.asarray(state),
            obs=jnp.asarray(obs),
            valid=jnp.asarray(matched),
        )

    def _track_lines_f2f(self, hf: HostFrame):
        """Inherit map-line associations from the previous frame
        (LSDmatcher::SearchByGeomNApearance bookkeeping, LSDmatcher.cpp:36)."""
        last = self.last
        if last is None or last.line_ml is None or not (last.line_ml >= 0).any():
            return
        from pslam_tpu.ops.line_match import match_lines_f2f

        idx, _ = match_lines_f2f(
            jnp.asarray(last.line_desc), jnp.asarray(last.line_sp),
            jnp.asarray(last.line_ep), jnp.asarray(last.line_valid),
            jnp.asarray(hf.line_desc), jnp.asarray(hf.line_sp),
            jnp.asarray(hf.line_ep), jnp.asarray(hf.line_valid),
            float(self.cfg.camera.width), float(self.cfg.camera.height),
        )
        idx = np.asarray(idx)
        src = np.flatnonzero((idx >= 0) & (last.line_ml >= 0))
        hf.line_ml[idx[src]] = last.line_ml[src]
        ml = last.line_ml[src]
        np.add.at(self.map.ml_visible, ml, 1)
        np.add.at(self.map.ml_found, ml, 1)

    def _point_set(self, mp_ids, cap: int) -> PointSet:
        """Gather a device PointSet snapshot for the given map-point ids."""
        m = self.map
        mp_ids = np.asarray(mp_ids, np.int64)
        n = min(len(mp_ids), cap)
        mp_ids = mp_ids[:n]
        pos = np.zeros((cap, 3), np.float32)
        desc = np.zeros((cap, 32), np.uint8)
        level = np.zeros(cap, np.int32)
        angle = np.zeros(cap, np.float32)
        mind = np.zeros(cap, np.float32)
        maxd = np.full(cap, 1e9, np.float32)
        normal = np.zeros((cap, 3), np.float32)
        valid = np.zeros(cap, bool)
        if n:
            pos[:n] = m.mp_pos[mp_ids]
            desc[:n] = m.mp_desc[mp_ids]
            mind[:n] = m.mp_min_dist[mp_ids]
            maxd[:n] = m.mp_max_dist[mp_ids]
            normal[:n] = m.mp_normal[mp_ids]
            valid[:n] = m.mp_valid[mp_ids]
            level[:n] = m.mp_level[mp_ids]
            angle[:n] = m.mp_angle[mp_ids]
        return PointSet(
            pos=jnp.asarray(pos),
            desc=jnp.asarray(desc),
            level=jnp.asarray(level),
            angle=jnp.asarray(angle),
            min_dist=jnp.asarray(mind),
            max_dist=jnp.asarray(maxd),
            normal=jnp.asarray(normal),
            valid=jnp.asarray(valid),
        )

    def _local_keyframes(self):
        """Reference KF + best covisible neighbours (UpdateLocalKeyFrames,
        Tracking.cc:1905-2029, capped at 80)."""
        base = self.ref_kf
        covis = self.map.best_covisible(base, 79)
        ids = np.unique(np.concatenate([[base], covis]))
        return ids

    def _need_new_keyframe(self, hf: HostFrame, n_inliers: int) -> bool:
        """NeedNewKeyFrame (Tracking.cc:1410-1515), RGB-D branch."""
        t = self.cfg.tracking
        frames_since_kf = hf.frame_id - int(
            self.map.kf_frame_id[self.map.last_kf]
        )
        ref_tracked = int((self.map.kf_feat_mp[self.ref_kf] >= 0).sum())
        # Close points tracked vs. close points availables (Tracking.cc:1452).
        close = (hf.depth > 0) & (hf.depth < self.cfg.th_depth) & hf.valid
        tracked_close = int(((hf.feat_mp >= 0) & close).sum())
        untracked_close = int(((hf.feat_mp < 0) & close).sum())
        need_close = (tracked_close < 100) and (untracked_close > 70)

        c1 = frames_since_kf >= t.kf_max_interval
        c2 = n_inliers < ref_tracked * t.kf_min_inlier_ratio or need_close
        c3 = n_inliers > 15
        return (c1 or c2) and c3 and frames_since_kf >= t.kf_min_interval

    def _create_keyframe(self, hf: HostFrame):
        """CreateNewKeyFrame (Tracking.cc:1516-1605): insert KF, create new
        map points from depth for unmatched close features, run the backend."""
        kf = self.map.add_keyframe(
            hf.frame_id, hf.timestamp, hf.T_cw, hf.uv, hf.ur, hf.level, hf.angle,
            hf.desc, hf.valid, hf.depth, hf.feat_mp,
        )
        self._register_kf_bow(kf, hf)
        self.ref_kf = kf
        self.stats["kf_inserted"] += 1

        # New points from depth: unmatched features sorted by depth, close
        # ones first, at least 100 (Tracking.cc:1545-1599).
        cand = np.flatnonzero((hf.feat_mp < 0) & (hf.depth > 0) & hf.valid)
        if len(cand):
            order = np.argsort(hf.depth[cand])
            cand = cand[order]
            close = hf.depth[cand] < self.cfg.th_depth
            n_take = max(int(close.sum()), min(100, len(cand)))
            n_take = min(n_take, self.cfg.tracking.max_new_points_per_kf)
            sel = cand[:n_take]
            T_wc = np.linalg.inv(hf.T_cw)
            X_w = (hf.xyz_c[sel] @ T_wc[:3, :3].T) + T_wc[:3, 3]
            ids = self.map.create_points_from_depth(kf, sel, X_w.astype(np.float32))
            hf.feat_mp[sel] = ids

        # Lines & structural lines onto the new KF.
        if self.cfg.use_lines and hf.line_valid is not None:
            line_mapping.create_or_attach_lines(self.map, kf, hf, hf.T_cw)
            if self.cfg.use_lils:
                line_mapping.create_or_attach_lils(self.map, kf, hf, hf.T_cw)
            self.stats["culled"] += line_mapping.cull_lines(self.map, self.cfg)

        # Backend (LocalMapping::Run order, LocalMapping.cc:47-120): point
        # culling, epipolar triangulation of new points, line triangulation,
        # neighbour fuse, local BA, keyframe culling.
        self.stats["culled"] += local_mapping.cull_points(self.map, self.cfg)
        self.stats["triangulated"] = self.stats.get(
            "triangulated", 0
        ) + local_mapping.create_new_map_points(self.map, kf, self.cfg)
        if self.cfg.use_lines and hf.line_valid is not None:
            self.stats["lines_triangulated"] = self.stats.get(
                "lines_triangulated", 0
            ) + line_mapping.create_new_map_lines(self.map, kf, self.cfg)
        self.stats["fused"] = self.stats.get(
            "fused", 0
        ) + local_mapping.search_in_neighbors(self.map, kf, self.cfg)
        if self.cfg.use_lines and hf.line_valid is not None:
            self.stats["lines_fused"] = self.stats.get(
                "lines_fused", 0
            ) + line_mapping.fuse_lines_in_neighbors(self.map, kf, self.cfg)
            row = self.map.kf_line_ml[kf]
            self.map.update_line_stats(np.unique(row[row >= 0]))
        self.map.update_point_stats(
            np.unique(self.map.kf_feat_mp[kf][self.map.kf_feat_mp[kf] >= 0])
        )
        self._run_local_ba(kf)
        self._cull_keyframes(kf)

        # Loop closing on the freshly inserted KF (LoopClosing::Run would
        # poll its queue; here it runs synchronously after local BA).
        if self.loop_closer is not None:
            self.loop_closer.on_new_keyframe(kf)

    def _cull_keyframes(self, kf: int):
        """KeyFrameCulling + the bookkeeping the map can't do itself:
        re-target trajectory rows that referenced the victim, drop it from
        the BoW database (KeyFrame::SetBadFlag touches both)."""
        protect = {self.ref_kf}
        if self.loop_closer is not None:
            # KFs holding loop edges are never erased (the reference's
            # mspLoopEdges check in KeyFrame::SetBadFlag).
            for a, b in self.loop_closer.loop_edges:
                protect.add(a)
                protect.add(b)
        victims = local_mapping.cull_keyframes(
            self.map, kf, self.cfg, protect=protect
        )
        for k in victims:
            self._retarget_trajectory(k)
            if self.kf_db is not None:
                self.kf_db.erase(k)
            self.map.erase_keyframe(k)
        self.stats["kf_culled"] = self.stats.get("kf_culled", 0) + len(victims)

    def _retarget_trajectory(self, k: int):
        """Re-reference trajectory rows pointing at KF ``k`` to its best
        covisible neighbour before the slot is erased/recycled (the
        reference chains mTcp to the parent on SetBadFlag,
        KeyFrame.cc:533-608)."""
        cov = self.map.best_covisible(k, 1)
        parent = int(cov[0]) if len(cov) else int(self.map.last_kf)
        if parent == k:
            parent = -1
        T_k = self.map.kf_pose[k]
        if parent >= 0:
            T_fix = (T_k @ np.linalg.inv(self.map.kf_pose[parent])).astype(
                np.float32
            )
        self.trajectory = [
            (ts, T_rel, ref)
            if ref != k
            else (
                (ts, (T_rel @ T_fix).astype(np.float32), parent)
                if parent >= 0
                else (ts, (T_rel @ T_k).astype(np.float32), -1)
            )
            for ts, T_rel, ref in self.trajectory
        ]

    def _run_local_ba(self, kf_idx: int):
        if self.map.n_kf < 3:
            return
        out = local_mapping.assemble_local_ba(self.map, kf_idx, self.cfg)
        if out is None:
            return
        prob, cam_ids, pt_ids, e_feat, n_e = out

        lil_pack = None
        if self.cfg.use_lines and self.cfg.use_lils:
            lil_pack = line_mapping.assemble_lil_edges(self.map, cam_ids, self.cfg)
        if lil_pack is not None:
            lil_state, lil_valid, ledges, il_ids = lil_pack
            T_opt, X_opt, lil_opt, in_p, in_l = local_bundle_adjustment_lil(
                self.cfg.camera, prob, jnp.asarray(lil_state),
                jnp.asarray(lil_valid), ledges, self.cfg.caps.ba_free,
            )
            result = (T_opt, X_opt, in_p, None)
            # Write back LIL structures + refresh plane offsets (d = -mean
            # n.p; the rigid-translation update leaves n unchanged).
            lil_opt = np.asarray(lil_opt)
            sel = il_ids >= 0
            ids = il_ids[sel]
            st = lil_opt[sel]
            self.map.il_state[ids] = st
            n = self.map.il_plane[ids, :3]
            pts = st.reshape(-1, 5, 3)
            d = -np.einsum("qj,qpj->q", n, pts) / 5.0
            flip = d < 0
            pl = np.concatenate([np.where(flip[:, None], -n, n),
                                 np.abs(d)[:, None]], axis=1)
            self.map.il_plane[ids] = pl.astype(np.float32)
        elif self.cfg.distributed and len(jax.devices()) > 1:
            # Edge-sharded Schur assembly over the device mesh
            # (parallel/sharded_ba.py); caps.ba_edges is a power of two, so
            # the fixed-capacity edge arrays always divide the mesh.
            from pslam_tpu.parallel.sharded_ba import (
                make_ba_mesh,
                sharded_local_bundle_adjustment,
            )

            result = sharded_local_bundle_adjustment(
                self.cfg.camera, prob, self.cfg.caps.ba_free, make_ba_mesh()
            )
        else:
            result = local_bundle_adjustment(
                self.cfg.camera, prob, self.cfg.caps.ba_free
            )
        local_mapping.write_back_ba(
            self.map, result, cam_ids, pt_ids, e_feat, n_e,
            np.asarray(prob.free_slot),
        )
        self.stats["ba_runs"] += 1

    # ------------------------------------------------------------------

    def _register_kf_bow(self, kf: int, hf: HostFrame):
        """Compute + store the new KF's BoW (KeyFrame::ComputeBoW +
        KeyFrameDatabase::add)."""
        if self.kf_db is None:
            return
        b, w, nd = self.kf_db.compute_bow(hf.desc, hf.valid)
        self.kf_db.add(kf, b, w, nd)

    def reset(self):
        """System::Reset (System.cc:294) / Tracking::Reset (Tracking.cc:2195):
        clear map, database, trajectory bookkeeping keeps accumulating."""
        vocab = self.kf_db.vocab if self.kf_db is not None else None
        # Freeze prior rows to absolute poses — their reference KFs are about
        # to be destroyed with the map.
        self.trajectory = [
            (ts, self._abs_pose(T_rel, ref), -1)
            for ts, T_rel, ref in self.trajectory
        ]
        self.map = MapState(self.cfg)
        if self.kf_db is not None:
            from pslam_tpu.pipeline.keyframe_db import KeyFrameDatabase

            self.kf_db = KeyFrameDatabase(
                vocab, self.cfg.caps.max_keyframes, self.cfg.orb.capacity
            )
        if self.loop_closer is not None:
            from pslam_tpu.pipeline.loop_closing import LoopCloser

            self.loop_closer = LoopCloser(self)
        self.state = TrackState.NOT_INITIALIZED
        self.velocity = np.eye(4, dtype=np.float32)
        self.ref_kf = 0
        self.stats["resets"] = self.stats.get("resets", 0) + 1

    def _abs_pose(self, T_rel: np.ndarray, ref_kf: int) -> np.ndarray:
        """Chain a relative row against the current (possibly loop-corrected)
        reference-KF pose (System.cc:345-365)."""
        if ref_kf < 0:
            return T_rel
        return (T_rel @ self.map.kf_pose[ref_kf]).astype(np.float32)

    @staticmethod
    def _write_tum_row(f, ts: float, T_cw: np.ndarray):
        from pslam_tpu.geometry.lie import rotation_to_quaternion

        import jax.numpy as jnp_

        R = T_cw[:3, :3]
        t = T_cw[:3, 3]
        C = -R.T @ t
        q = np.asarray(rotation_to_quaternion(jnp_.asarray(R.T)))
        f.write(
            f"{ts:.6f} {C[0]:.7f} {C[1]:.7f} {C[2]:.7f} "
            f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
        )

    def save_trajectory_tum(self, path: str):
        """TUM-format trajectory (System::SaveTrajectoryTUM, System.cc:323)."""
        with open(path, "w") as f:
            for ts, T_rel, ref in self.trajectory:
                self._write_tum_row(f, ts, self._abs_pose(T_rel, ref))

    def save_keyframe_trajectory_tum(self, path: str):
        """TUM-format keyframe trajectory (SaveKeyFrameTrajectoryTUM,
        System.cc:384)."""
        m = self.map
        # Slot order is not temporal once culled slots are recycled; emit
        # rows in timestamp order for downstream evaluation tools.
        ks = np.flatnonzero(m.kf_valid[: m.n_kf])
        ks = ks[np.argsort(m.kf_timestamp[ks], kind="stable")]
        with open(path, "w") as f:
            for k in ks:
                self._write_tum_row(f, float(m.kf_timestamp[k]), m.kf_pose[k])

    def save_trajectory_kitti(self, path: str):
        """KITTI-format trajectory: row-major 3x4 of T_wc
        (System::SaveTrajectoryKITTI, System.cc:412-441)."""
        with open(path, "w") as f:
            for ts, T_rel, ref in self.trajectory:
                T = self._abs_pose(T_rel, ref)
                R = T[:3, :3].T
                C = -R @ T[:3, 3]
                vals = np.c_[R, C].reshape(-1)
                f.write(" ".join(f"{v:.9e}" for v in vals) + "\n")

    @property
    def poses(self):
        return np.stack(
            [self._abs_pose(T_rel, ref) for _, T_rel, ref in self.trajectory]
        )
