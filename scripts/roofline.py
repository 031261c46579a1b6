"""Per-stage roofline account of the SLAM hot path on the real TPU.

For each stage of the per-frame program and the keyframe-rate backend:
measure device time (R reps inside one jitted lax.scan, so the relay's
per-dispatch overhead amortizes), pull FLOPs + bytes accessed from XLA's
cost analysis, and score it against the v5e roofline:

    t_floor = max(flops / PEAK_FLOPS, bytes / PEAK_BW)
    bound   = compute if flops/bytes > PEAK_FLOPS/PEAK_BW else memory
    eff     = t_floor / t_measured   (1.0 == at the roofline)

Writes the table to ROOFLINE.md and prints it. This is the evidence the
north star's "driving kernels to roofline" asks for: each stage's achieved
throughput, which ceiling it is under, and how far from it.

v5e peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PEAK_TFLOPS = 197.0
PEAK_BW_GBS = 819.0
R = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _cost(fn, *args):
    """(flops, bytes) from XLA cost analysis of fn(*args)."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    ca = lowered.compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _time(fn, *args, reps=R):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*args):
        def body(c, _):
            def perturb(x):
                if jnp.issubdtype(x.dtype, jnp.floating):
                    return x + (c * 1e-30).astype(x.dtype)
                return x

            out = fn(*jax.tree_util.tree_map(perturb, args))
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves if x.size)
            return c + s * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return c

    np.asarray(loop(*args))  # compile + warm
    t0 = time.time()
    np.asarray(loop(*args))
    return (time.time() - t0) / reps


def stage(rows, name, fn, *args):
    t = _time(fn, *args)
    try:
        fl, by = _cost(fn, *args)
    except Exception as e:  # pragma: no cover
        log(f"{name}: cost analysis failed ({e})")
        fl = by = 0.0
    t_comp = fl / (PEAK_TFLOPS * 1e12)
    t_mem = by / (PEAK_BW_GBS * 1e9)
    t_floor = max(t_comp, t_mem)
    bound = "compute" if t_comp >= t_mem else "memory"
    eff = t_floor / t if t > 0 and t_floor > 0 else 0.0
    rows.append(dict(
        name=name, ms=t * 1e3, gflop=fl / 1e9, mb=by / 1e6,
        tflops=fl / t / 1e12, gbs=by / t / 1e9,
        bound=bound, floor_ms=t_floor * 1e3, eff=eff,
    ))
    log(f"{name:28s} {t*1e3:8.3f} ms  {fl/1e9:8.2f} GF {by/1e6:8.1f} MB "
        f"{bound:7s} floor {t_floor*1e3:7.3f} ms  eff {eff*100:5.1f}%")


def main():
    import jax
    import jax.numpy as jnp

    from pslam_tpu.utils.backend import enable_compile_cache

    enable_compile_cache()

    from pslam_tpu.io.synthetic import render_sequence
    from pslam_tpu.ops import orb as orb_mod
    from pslam_tpu.ops.fast import fast_score_dual
    from pslam_tpu.ops.image import build_pyramid, gaussian_blur
    from pslam_tpu.ops.orb import (
        detect_keypoints,
        extract_orb,
        extract_patches,
        keypoint_angles,
    )
    from pslam_tpu.pipeline import frame_step as fstep
    from pslam_tpu.pipeline.frame_ops import make_frame, make_frame_lines
    from pslam_tpu.pipeline.system import SlamSystem
    from pslam_tpu.pipeline.track_ops import PointSet, track_against_points
    from pslam_tpu.utils.config import SlamConfig

    cfg = SlamConfig()
    cam, orb = cfg.camera, cfg.orb
    log("device:", jax.devices()[0])

    grays, depths, _ = render_sequence(cam, n_frames=2, seed=0)
    img = jnp.asarray(grays[0])
    depth = jnp.asarray(depths[0])
    stack = jax.block_until_ready(build_pyramid(img, orb.levels, orb.scale)[0])
    h, w = img.shape

    rows = []
    stage(rows, "pyramid", lambda x: build_pyramid(x, orb.levels, orb.scale)[0], img)
    stage(rows, "fast_dual", lambda s: fast_score_dual(s, orb.th_fast_hi, orb.th_fast_lo), stack)
    stage(rows, "detect_keypoints", lambda s: detect_keypoints(s, orb, h, w), stack)
    stage(rows, "gaussian_blur", gaussian_blur, stack)

    feats = jax.block_until_ready(extract_orb(img, orb))
    blurred = jax.block_until_ready(gaussian_blur(stack))
    stage(rows, "patches+angles+brief",
          lambda b, u, l: orb_mod._brief_bits(
              extract_patches(b, u, l),
              keypoint_angles(extract_patches(b, u, l))),
          blurred, feats.uv_lvl, feats.level)
    stage(rows, "line_frontend",
          lambda i, d: make_frame_lines(i, d, cam, cfg.lines, cfg.caps.frame_lils),
          img, depth)

    # Hamming match + pose solve against a realistic local map.
    fd0 = jax.block_until_ready(make_frame(img, depth, cam, orb))
    M = cfg.caps.local_points
    has = np.asarray((fd0.depth > 0) & fd0.valid)
    sel = np.flatnonzero(has)[:M]
    pos = np.zeros((M, 3), np.float32)
    pos[: len(sel)] = np.asarray(fd0.xyz_c)[sel]
    desc = np.zeros((M, 32), np.uint8)
    desc[: len(sel)] = np.asarray(fd0.desc)[sel]
    dist = np.linalg.norm(pos, axis=-1)
    pts = PointSet(
        pos=jnp.asarray(pos), desc=jnp.asarray(desc),
        level=jnp.zeros(M, jnp.int32), angle=jnp.zeros(M, jnp.float32),
        min_dist=jnp.asarray((dist * 0.2).astype(np.float32)),
        max_dist=jnp.asarray((dist * 5.0 + 1.0).astype(np.float32)),
        normal=jnp.asarray(pos / np.maximum(dist[:, None], 1e-9).astype(np.float32)),
        valid=jnp.asarray(np.arange(M) < len(sel)),
    )
    T0 = jnp.eye(4, dtype=jnp.float32)
    stage(rows, "match+pose (motion model)",
          lambda T, f: track_against_points(
              cam, T, pts, f, cfg.tracking.motion_match_radius,
              orb.scale, orb.levels),
          T0, fd0)

    # Whole fused frame program (the deployed per-frame dispatch).
    s = SlamSystem(cfg)
    s.track_rgbd(grays[0], depths[0], 0.0)
    s._rebuild_snapshot()
    snap, acc = s._snap, s._acc
    stage(rows, "frame_step (fused)",
          lambda g, d, T, v, a: fstep.frame_step(
              cfg, g, d, T, v,
              jnp.float32(cfg.tracking.motion_match_radius), snap, a),
          img, depth, T0, jnp.eye(4), acc)

    # Keyframe-rate backend: local BA at the bench's typical shape.
    from pslam_tpu.geometry import project_stereo, se3_exp, transform_points
    from pslam_tpu.solver.local_ba import BAProblem, local_bundle_adjustment

    caps = cfg.caps
    rng = np.random.default_rng(0)
    C, P, E, n_free = caps.ba_cams, 2048, 8192, caps.ba_free
    X = rng.uniform([-3, -2, 1], [3, 2, 8], (P, 3)).astype(np.float32)
    T_cw = np.stack([
        np.asarray(se3_exp(jnp.asarray(
            np.r_[rng.normal(0, 0.01, 3), 0.05 * c, 0, 0].astype(np.float32))))
        for c in range(C)
    ])
    cam_idx = rng.integers(0, C, E).astype(np.int32)
    pt_idx = rng.integers(0, P, E).astype(np.int32)
    Xc = transform_points(jnp.asarray(T_cw)[cam_idx], jnp.asarray(X)[pt_idx])
    obs = np.asarray(project_stereo(cam, Xc)) + rng.normal(0, 0.3, (E, 3)).astype(np.float32)
    free_slot = np.full(C, -1, np.int32)
    free_slot[1: 1 + n_free] = np.arange(n_free)
    prob = BAProblem(
        T_cw=jnp.asarray(T_cw.astype(np.float32)),
        free_slot=jnp.asarray(free_slot),
        X_w=jnp.asarray(X + rng.normal(0, 0.02, X.shape).astype(np.float32)),
        point_valid=jnp.ones(P, bool),
        cam_idx=jnp.asarray(cam_idx), pt_idx=jnp.asarray(pt_idx),
        obs=jnp.asarray(obs.astype(np.float32)),
        inv_sigma2=jnp.ones(E, jnp.float32),
        edge_valid=jnp.ones(E, bool),
    )
    stage(rows, "local BA (48c/2048p/8192e)",
          lambda p: local_bundle_adjustment(cam, p, caps.ba_free), prob)

    # ---- write ROOFLINE.md ----------------------------------------------
    dev = str(jax.devices()[0])
    out = os.path.join(os.path.dirname(__file__), "..", "ROOFLINE.md")
    with open(out, "w") as f:
        f.write(
            "# Per-stage roofline account (real TPU, scripts/roofline.py)\n\n"
            f"Device: `{dev}`; peaks used: {PEAK_TFLOPS:.0f} TFLOP/s bf16, "
            f"{PEAK_BW_GBS:.0f} GB/s HBM.\n"
            "`floor` = max(flops/peak_flops, bytes/peak_bw) — the roofline\n"
            "lower bound for the op mix XLA reports; `eff` = floor/measured\n"
            "(1.0 = at the roofline for that mix).\n\n"
            "| stage | ms | GFLOP | MB | TFLOP/s | GB/s | bound | floor ms | eff |\n"
            "|---|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['name']} | {r['ms']:.3f} | {r['gflop']:.2f} | "
                f"{r['mb']:.1f} | {r['tflops']:.2f} | {r['gbs']:.1f} | "
                f"{r['bound']} | {r['floor_ms']:.3f} | {r['eff']*100:.1f}% |\n"
            )
        worst = sorted(
            (r for r in rows if r["name"] != "frame_step (fused)"),
            key=lambda r: r["ms"] * (1 - r["eff"]), reverse=True,
        )[:2]
        f.write(
            "\nTop optimization targets (largest headroom x time): "
            + ", ".join(
                f"**{r['name']}** ({r['ms']:.2f} ms at {r['eff']*100:.0f}% "
                f"of its {r['bound']} ceiling)" for r in worst
            )
            + f".\n\nGenerated {time.strftime('%Y-%m-%d')}.\n"
        )
    log(f"wrote {os.path.abspath(out)}")


if __name__ == "__main__":
    main()
