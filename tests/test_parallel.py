"""Distributed BA tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pslam_tpu import geometry as geo
from pslam_tpu.parallel import make_ba_mesh, sharded_local_bundle_adjustment
from pslam_tpu.solver import local_bundle_adjustment

from test_solver import CAM
from test_solver import TestLocalBA as _BAHelper  # noqa: N813 (not collected)


@pytest.fixture(scope="module")
def ba_problem():
    t = _BAHelper()
    prob, T_true, X_true, n_free = t._ba_problem(seed=11)
    # Pad edge arrays to a multiple of 8 for the mesh.
    E = len(np.asarray(prob.cam_idx))
    E_pad = -(-E // 8) * 8

    def pad(a, fill=0):
        out = np.full((E_pad,) + a.shape[1:], fill, np.asarray(a).dtype)
        out[:E] = np.asarray(a)
        return jnp.asarray(out)

    prob = prob._replace(
        cam_idx=pad(prob.cam_idx),
        pt_idx=pad(prob.pt_idx),
        obs=pad(prob.obs),
        inv_sigma2=pad(prob.inv_sigma2, 1.0),
        edge_valid=pad(prob.edge_valid, False),
    )
    return prob, T_true, X_true, n_free


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(ba_problem):
    prob, T_true, X_true, n_free = ba_problem
    mesh = make_ba_mesh()
    T_s, X_s, inl_s, chi2_s = sharded_local_bundle_adjustment(
        CAM, prob, n_free, mesh
    )
    T_1, X_1, inl_1, chi2_1 = local_bundle_adjustment(CAM, prob, n_free)
    # Same solution up to float summation order.
    np.testing.assert_allclose(np.asarray(T_s), np.asarray(T_1), atol=5e-3)
    err_pts = np.abs(np.asarray(X_s) - np.asarray(X_1))
    assert np.median(err_pts) < 1e-3
    # Same accuracy vs ground truth.
    rel = np.asarray(jax.vmap(geo.se3_log)(T_s @ geo.se3_inverse(T_true)))
    assert np.abs(rel[2:, 3:]).max() < 0.01
    assert float(jnp.mean(inl_s == inl_1)) > 0.99


def test_sharded_jits_under_mesh(ba_problem):
    prob, T_true, X_true, n_free = ba_problem
    mesh = make_ba_mesh()
    f = jax.jit(
        lambda p: sharded_local_bundle_adjustment(CAM, p, n_free, mesh)
    )
    T_s, X_s, inl, chi2 = f(prob)
    assert bool(jnp.isfinite(T_s).all())
