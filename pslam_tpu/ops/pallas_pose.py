"""Fused pose-optimization edge terms as a Pallas TPU kernel.

One LM iteration of PoseOptimization (reference src/Optimizer.cc:239-1023)
needs, from the 4096-slot point-edge list: residuals, analytic Jacobians,
Huber weights, the 6x6 normal equations, and the robust cost. The jnp path
(solver/pose_opt.py + solver/reproj.py) spends ~25 XLA ops per iteration on
(4096, ...) arrays; at 40 LM iterations x 2 pose solves per frame the
per-op dispatch latency (~3 us) dominates the whole tracking hot path. This
kernel computes everything in ONE op: the edge list lives in VMEM as an
(8, E) lane-major block, the Jacobian algebra is unrolled scalar formulas
over 4096-lane vectors (VPU), and only H (6,6), b (6,), cost, and the
per-edge chi2 row leave the kernel.

Parameter packing:
    data: (8, E) f32 rows [X0, X1, X2, obs_u, obs_v, obs_ur, inv_sigma2,
          active] (world points; obs_ur < 0 marks mono edges)
    par:  (1, 128) f32 [T_cw row-major (16), fx, fy, cx, cy, bf, use_huber]
Outputs:
    P24 (24, 24) = S S^T for the stacked weighted-Jacobian/residual matrix
    S (24, E); H/b/cost are small slices of it (see pose_terms_fused).
    chi2: (1, E) f32
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pslam_tpu.solver.robust import CHI2_MONO, CHI2_STEREO


def _kernel(data_ref, par_ref, stats_ref, chi2_ref, smat_ref):
    p = par_ref[0, :]
    R00, R01, R02, t0 = p[0], p[1], p[2], p[3]
    R10, R11, R12, t1 = p[4], p[5], p[6], p[7]
    R20, R21, R22, t2 = p[8], p[9], p[10], p[11]
    fx, fy, cx, cy, bf = p[16], p[17], p[18], p[19], p[20]
    use_huber = p[21] > 0.5

    X0 = data_ref[0:1, :]
    X1 = data_ref[1:2, :]
    X2 = data_ref[2:3, :]
    obs_u = data_ref[3:4, :]
    obs_v = data_ref[4:5, :]
    obs_r = data_ref[5:6, :]
    inv_s2 = data_ref[6:7, :]
    act = data_ref[7:8, :]

    x = R00 * X0 + R01 * X1 + R02 * X2 + t0
    y = R10 * X0 + R11 * X1 + R12 * X2 + t1
    z = R20 * X0 + R21 * X1 + R22 * X2 + t2
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz

    u = fx * x * iz + cx
    v = fy * y * iz + cy
    urr = u - bf * iz
    is_stereo = obs_r >= 0.0
    sm = is_stereo.astype(jnp.float32)
    r0 = obs_u - u
    r1 = obs_v - v
    r2 = (obs_r - urr) * sm

    chi2 = (r0 * r0 + r1 * r1 + r2 * r2) * inv_s2
    chi2_ref[0:1, :] = chi2

    delta = jnp.where(
        is_stereo,
        jnp.float32(CHI2_STEREO) ** 0.5,
        jnp.float32(CHI2_MONO) ** 0.5,
    )
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w_rob = jnp.where(use_huber & (e > delta), delta / e, 1.0)
    w_eff = w_rob * inv_s2 * act

    # Analytic Jacobian rows (solver/reproj.py stereo_residual_jac):
    # row_u = [a, 0, b], row_v = [0, c, d], row_r = [a, 0, b+e2] with
    # a = fx/z, b = -fx x/z^2, c = fy/z, d = -fy y/z^2, e2 = bf/z^2;
    # J = -(row . [[0,z,-y,1,0,0],[-z,0,x,0,1,0],[y,-x,0,0,0,1]]).
    a = fx * iz
    b = -fx * x * iz2
    c = fy * iz
    d = -fy * y * iz2
    e2 = bf * iz2
    be = b + e2

    J0 = (-(b * y), -(a * z - b * x), a * y, -a, jnp.zeros_like(a), -b)
    J1 = (-(d * y - c * z), d * x, -(c * x), jnp.zeros_like(a), -c, -d)
    J2 = (
        -(be * y) * sm, -(a * z - be * x) * sm, a * y * sm,
        -a * sm, jnp.zeros_like(a), -be * sm,
    )

    # Normal equations via ONE MXU matmul: stack sqrt(w)-weighted Jacobian
    # rows (18) + weighted residual rows (3) as a (24, E) matrix S; then
    # P = S S^T contains H (3 diagonal 6x6 blocks), b (Jacobian-residual
    # entries), and the robust cost (residual-square trace). 63 separate
    # lane reductions + scalar stores measured ~2x slower.
    sw = jnp.sqrt(jnp.maximum(w_eff, 0.0))
    for i in range(6):
        smat_ref[i : i + 1, :] = J0[i] * sw
        smat_ref[6 + i : 7 + i, :] = J1[i] * sw
        smat_ref[12 + i : 13 + i, :] = J2[i] * sw
    smat_ref[18:19, :] = r0 * sw
    smat_ref[19:20, :] = r1 * sw
    smat_ref[20:21, :] = r2 * sw
    smat_ref[21:24, :] = jnp.zeros_like(smat_ref[21:24, :])
    S = smat_ref[:]
    stats_ref[:] = jax.lax.dot_general(
        S, S, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@partial(jax.jit, static_argnames=("interpret",))
def pose_terms_fused(data, par, interpret: bool = False):
    """data (8, E) f32, par (1, 128) f32 -> (H (6,6), b (6,), cost (),
    chi2 (E,)). E must be a multiple of 128."""
    E = data.shape[1]
    P24, chi2 = pl.pallas_call(
        _kernel,
        interpret=interpret,
        out_shape=(
            jax.ShapeDtypeStruct((24, 24), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((24, E), jnp.float32)],
    )(data, par)
    # P24 = S S^T for S = [sqrt(w) J rows (18); sqrt(w) r rows (3); 0 (3)]:
    # H sums the 3 diagonal 6x6 Jacobian blocks, b the Jacobian-residual
    # couplings, cost the residual trace.
    H = P24[0:6, 0:6] + P24[6:12, 6:12] + P24[12:18, 12:18]
    b = -(P24[0:6, 18] + P24[6:12, 19] + P24[12:18, 20])
    cost = P24[18, 18] + P24[19, 19] + P24[20, 20]
    return H, b, cost, chi2[0]


def pack_pose_data(po):
    """PoseObs -> the kernel's (8, E) data block (active = po.valid here;
    the caller overwrites row 7 per round)."""
    return jnp.stack(
        [
            po.X_w[:, 0], po.X_w[:, 1], po.X_w[:, 2],
            po.obs[:, 0], po.obs[:, 1], po.obs[:, 2],
            po.inv_sigma2, po.valid.astype(jnp.float32),
        ],
        axis=0,
    )


def pack_pose_params(cam, T, use_huber):
    """Camera + pose + flags -> the kernel's (1, 128) parameter row."""
    extras = jnp.asarray(
        [cam.fx, cam.fy, cam.cx, cam.cy, cam.bf], jnp.float32
    )
    hub = jnp.where(use_huber, 1.0, 0.0).reshape(1)
    row = jnp.concatenate(
        [T.reshape(16), extras, hub, jnp.zeros(106, jnp.float32)]
    )
    return row[None, :]
