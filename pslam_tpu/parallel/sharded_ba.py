"""Distributed local/global BA: edge-sharded Schur assembly over a mesh.

Distribution layout (BASELINE.json north star; scaling-book style):

- mesh axis ``edges``: the observation edge list (cam_idx, pt_idx, obs, ...)
  is sharded along it. Edges are the data axis of BA — each device computes
  residuals/Jacobians and partial normal-equation blocks for its shard only.
- camera poses and landmark positions are replicated (they are small: C*16 +
  P*3 floats); the per-shard partial blocks (Hcc, bc, Hpp, bp, G) are summed
  with ``psum`` over ICI, after which every device holds the full normal
  equations and runs the identical reduced solve (replicated compute instead
  of a broadcast round-trip).

This reuses solver/local_ba.py's math: `_edge_terms` + `_assemble` run inside
shard_map on the edge shard; `_solve_schur` and the LM control flow are
unchanged. ATE-relevant semantics are identical to the single-chip path up to
floating-point summation order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pslam_tpu.geometry import Camera
from pslam_tpu.solver.local_ba import (
    BAProblem,
    _apply,
    _assemble,
    _edge_depth,
    _edge_terms,
    _solve_schur,
)
from pslam_tpu.solver.robust import CHI2_MONO, CHI2_STEREO


def make_ba_mesh(devices=None, axis: str = "edges") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


def _edge_spec(axis: str):
    """PartitionSpec for a BAProblem: edge arrays sharded, the rest replicated."""
    return BAProblem(
        T_cw=P(),
        free_slot=P(),
        X_w=P(),
        point_valid=P(),
        cam_idx=P(axis),
        pt_idx=P(axis),
        obs=P(axis),
        inv_sigma2=P(axis),
        edge_valid=P(axis),
    )


def sharded_local_bundle_adjustment(
    cam: Camera,
    prob: BAProblem,
    n_free: int,
    mesh: Mesh,
    schedule=(5, 10),
    axis: str = "edges",
):
    """Distributed drop-in for solver.local_bundle_adjustment.

    Edge-array lengths must be divisible by the mesh size. Returns
    (T_opt, X_opt, edge_inlier, chi2) with edge outputs sharded like inputs.
    """

    espec = _edge_spec(axis)
    rep = BAProblem(
        T_cw=P(), free_slot=P(), X_w=P(), point_valid=P(),
        cam_idx=P(), pt_idx=P(), obs=P(), inv_sigma2=P(), edge_valid=P(),
    )
    del rep

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), espec, P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def assemble_shard(T_all, X_all, prob_shard, active_shard, params):
        """Per-shard partial blocks -> psum'd full normal equations + cost."""
        use_huber = params[0] > 0.5
        _, w_eff, r, Jc, Jp, cost = _edge_terms(
            cam, prob_shard, T_all, X_all, active_shard, use_huber
        )
        Hcc, bc, Hpp, bp, G = _assemble(prob_shard, n_free, w_eff, r, Jc, Jp)
        blocks = jax.lax.psum((Hcc, bc, Hpp, bp, G), axis)
        cost = jax.lax.psum(cost, axis)
        return blocks, cost

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), espec, P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    def classify_shard(T_all, X_all, prob_shard, _dummy):
        chi2, *_ = _edge_terms(
            cam, prob_shard, T_all, X_all, prob_shard.edge_valid, False
        )
        z = _edge_depth(prob_shard, T_all, X_all)
        return chi2, z

    def lm_phase(T_all, X_all, active, n_iters, use_huber):
        params = jnp.asarray([1.0 if use_huber else 0.0], jnp.float32)

        # One assembly (and one psum of the normal-equation blocks) per LM
        # iteration: the blocks at the current estimate ride the carry, the
        # step solves from them, and the proposal's blocks (needed for its
        # cost anyway) become the next carry on acceptance.
        def body(carry, _):
            T_all, X_all, lam, cost, blocks = carry
            Hcc, bc, Hpp, bp, G = blocks
            dx_c, dx_p = _solve_schur(Hcc, bc, Hpp, bp, G, prob.point_valid, lam)
            T_new, X_new = _apply(prob, T_all, X_all, dx_c, dx_p)
            blocks_new, cost_new = assemble_shard(
                T_new, X_new, prob, active, params
            )
            accept = cost_new < cost
            sel = lambda a, b: jnp.where(accept, a, b)  # noqa: E731
            T_next = sel(T_new, T_all)
            X_next = sel(X_new, X_all)
            blocks_next = jax.tree_util.tree_map(sel, blocks_new, blocks)
            lam_next = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e6)
            cost_next = jnp.where(accept, cost_new, cost)
            return (T_next, X_next, lam_next, cost_next, blocks_next), None

        blocks0, cost0 = assemble_shard(T_all, X_all, prob, active, params)
        (T_out, X_out, *_), _ = jax.lax.scan(
            body,
            (T_all, X_all, jnp.asarray(1e-4, T_all.dtype), cost0, blocks0),
            None,
            length=n_iters,
        )
        return T_out, X_out

    T_all, X_all = prob.T_cw, prob.X_w
    active = prob.edge_valid

    T_all, X_all = lm_phase(T_all, X_all, active, schedule[0], True)
    chi2, z = classify_shard(T_all, X_all, prob, jnp.zeros(1))
    is_stereo = prob.obs[..., 2] >= 0.0
    gate = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    active = prob.edge_valid & (chi2 <= gate) & (z > 0.0)
    T_all, X_all = lm_phase(T_all, X_all, active, schedule[1], False)

    chi2, z = classify_shard(T_all, X_all, prob, jnp.zeros(1))
    inlier = prob.edge_valid & (chi2 <= gate) & (z > 0.0)
    return T_all, X_all, inlier, chi2
