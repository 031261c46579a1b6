"""Parity: the fused Pallas pose-terms kernel (ops/pallas_pose.py,
interpret mode on CPU) must reproduce the jnp path's normal equations,
cost, and chi2 (solver/pose_opt._edge_terms + _gn_system)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pslam_tpu.geometry import Camera, se3_exp
from pslam_tpu.ops.pallas_pose import (
    pack_pose_data,
    pack_pose_params,
    pose_terms_fused,
)
from pslam_tpu.solver.pose_opt import PoseObs, _edge_terms, _gn_system

CAM = Camera(fx=500.0, fy=505.0, cx=320.0, cy=240.0, bf=40.0)


@pytest.mark.parametrize("seed,use_huber", [(0, True), (1, False)])
def test_fused_terms_match_reference(seed, use_huber):
    rng = np.random.default_rng(seed)
    E = 512
    X = rng.uniform([-2, -2, 1], [2, 2, 8], (E, 3)).astype(np.float32)
    T = np.asarray(
        se3_exp(jnp.asarray(np.r_[rng.normal(0, 0.05, 3),
                                  rng.normal(0, 0.2, 3)].astype(np.float32)))
    )
    Xc = X @ T[:3, :3].T + T[:3, 3]
    u = CAM.fx * Xc[:, 0] / Xc[:, 2] + CAM.cx + rng.normal(0, 2, E)
    v = CAM.fy * Xc[:, 1] / Xc[:, 2] + CAM.cy + rng.normal(0, 2, E)
    ur = u - CAM.bf / Xc[:, 2] + rng.normal(0, 1, E)
    ur[rng.uniform(size=E) < 0.3] = -1.0  # mono edges
    obs = np.stack([u, v, ur], axis=1).astype(np.float32)
    inv_s2 = rng.uniform(0.3, 1.0, E).astype(np.float32)
    valid = rng.uniform(size=E) > 0.15
    active = valid & (rng.uniform(size=E) > 0.1)

    po = PoseObs(
        X_w=jnp.asarray(X), obs=jnp.asarray(obs),
        inv_sigma2=jnp.asarray(inv_s2), valid=jnp.asarray(valid),
    )
    T_j = jnp.asarray(T)
    chi2_r, w_eff, r, J, row_mask, cost_r = _edge_terms(
        CAM, T_j, po, use_huber, jnp.asarray(active)
    )
    H_r, b_r = _gn_system(w_eff, r, J, row_mask)

    data = pack_pose_data(po).at[7].set(jnp.asarray(active, jnp.float32))
    par = pack_pose_params(CAM, T_j, jnp.asarray(1.0 if use_huber else 0.0))
    H_f, b_f, cost_f, chi2_f = pose_terms_fused(data, par, interpret=True)

    np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_r), rtol=2e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(b_f), np.asarray(b_r), rtol=2e-4,
                               atol=1e-2)
    np.testing.assert_allclose(float(cost_f), float(cost_r), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(chi2_f), np.asarray(chi2_r),
                               rtol=1e-4, atol=1e-4)
