"""Benchmark: RGB-D tracking throughput per chip (BASELINE config-1 analogue).

Measures the per-frame tracking hot path on device — ORB extraction (1000
kps, 8 levels, 640x480), RGB-D stereo, projection-window Hamming matching
against a 4096-point local map, and two LM pose optimizations (motion-model
+ local-map, 4x10 iterations each) — scanned over frames inside one jit so
the measurement reflects deployed throughput, not the dev-tunnel's ~100ms
per-dispatch relay overhead.

Baseline: the reference publishes no numbers (BASELINE.md) and cannot be
built here (needs Pangolin/PCL). vs_baseline uses 20 frames/s as the assumed
C++ reference tracking rate on a desktop CPU (ORB-SLAM2-class RGB-D trackers
run 20-30 fps; PSL-SLAM adds line extraction on top). North-star target is
5x => vs_baseline >= 5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

ASSUMED_BASELINE_FPS = 20.0
N_FRAMES = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pslam_tpu.io.synthetic import render_sequence
    from pslam_tpu.pipeline.frame_ops import make_frame
    from pslam_tpu.pipeline.track_ops import (
        PointSet,
        track_against_points,
        track_local_map_step,
    )
    from pslam_tpu.utils.config import SlamConfig

    cfg = SlamConfig()
    cam, orb = cfg.camera, cfg.orb
    log("device:", jax.devices()[0])

    log("rendering synthetic sequence...")
    grays, depths, poses_gt = render_sequence(cam, n_frames=N_FRAMES, seed=0)
    grays_d = jnp.asarray(grays)
    depths_d = jnp.asarray(depths)

    # Build a realistic local map: points from frame 0's depth.
    fd0 = make_frame(grays_d[0], depths_d[0], cam, orb)
    M = cfg.caps.local_points
    has = np.asarray((fd0.depth > 0) & fd0.valid)
    sel = np.flatnonzero(has)[:M]
    pos = np.zeros((M, 3), np.float32)
    pos[: len(sel)] = np.asarray(fd0.xyz_c)[sel]
    desc = np.zeros((M, 32), np.uint8)
    desc[: len(sel)] = np.asarray(fd0.desc)[sel]
    level = np.zeros(M, np.int32)
    level[: len(sel)] = np.asarray(fd0.level)[sel]
    angle = np.zeros(M, np.float32)
    angle[: len(sel)] = np.asarray(fd0.angle)[sel]
    dist = np.linalg.norm(pos, axis=-1)
    pts = PointSet(
        pos=jnp.asarray(pos),
        desc=jnp.asarray(desc),
        level=jnp.asarray(level),
        angle=jnp.asarray(angle),
        min_dist=jnp.asarray((dist * 0.2).astype(np.float32)),
        max_dist=jnp.asarray((dist * 5.0 + 1.0).astype(np.float32)),
        normal=jnp.asarray(
            pos / np.maximum(dist[:, None], 1e-9).astype(np.float32)
        ),
        valid=jnp.asarray(np.arange(M) < len(sel)),
    )

    t_cfg = cfg.tracking

    def per_frame(T_carry, inputs):
        img, depth = inputs
        fd = make_frame(img, depth, cam, orb)
        res = track_against_points(
            cam, T_carry, pts, fd, t_cfg.motion_match_radius, orb.scale, orb.levels
        )
        res2 = track_local_map_step(
            cam, res.T_cw, pts, fd,
            jnp.full(M, -1, jnp.int32), t_cfg.local_match_radius,
            orb.scale, orb.levels,
        )
        return res2.T_cw, res2.n_inliers

    @jax.jit
    def run_all(grays_d, depths_d):
        T0 = jnp.eye(4, dtype=jnp.float32)
        _, inl = jax.lax.scan(per_frame, T0, (grays_d, depths_d))
        return inl

    log("compiling...")
    t0 = time.time()
    inl = np.asarray(run_all(grays_d, depths_d))
    log(f"compile+first: {time.time()-t0:.1f}s; inliers/frame: {inl[:4]}...")

    # NOTE: block_until_ready does not reliably synchronize on the axon
    # relay backend; a host fetch (np.asarray) is the only trustworthy sync.
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        np.asarray(run_all(grays_d, depths_d))
    dt = (time.time() - t0) / (reps * N_FRAMES)
    fps = 1.0 / dt
    log(f"tracking: {dt*1e3:.2f} ms/frame = {fps:.1f} frames/s")

    print(
        json.dumps(
            {
                "metric": "rgbd_tracking_throughput",
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / ASSUMED_BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
