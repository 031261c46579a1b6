"""Parity: the fused Pallas projection matcher (ops/pallas_match.py,
interpret mode on CPU) must agree with the jnp reference path
(ops/match.py: window_mask + level_window_mask + hamming_matrix +
mutual_nn_match)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pslam_tpu.ops.match import (
    hamming_matrix,
    level_window_mask,
    mutual_nn_match,
    window_mask,
)
from pslam_tpu.ops.pallas_match import projection_match


@pytest.mark.parametrize("na,nb,seed", [(200, 300, 0), (128, 128, 1), (50, 700, 2)])
def test_fused_matches_reference(na, nb, seed):
    rng = np.random.default_rng(seed)
    desc_a = rng.integers(0, 256, (na, 32), dtype=np.uint8)
    desc_b = rng.integers(0, 256, (nb, 32), dtype=np.uint8)
    # Plant some near-duplicates so real matches exist.
    plant = rng.permutation(min(na, nb))[: min(na, nb) // 2]
    for i, j in enumerate(plant):
        desc_b[j] = desc_a[i]
        flip = rng.integers(0, 32)
        desc_b[j, flip] ^= np.uint8(1 << rng.integers(0, 8))

    uv_a = rng.uniform(0, 640, (na, 2)).astype(np.float32)
    uv_b = uv_a[rng.integers(0, na, nb)] + rng.normal(0, 6, (nb, 2)).astype(
        np.float32
    )
    lev_a = rng.integers(0, 8, na).astype(np.int32)
    lev_b = rng.integers(0, 8, nb).astype(np.int32)
    # Planted matches must land inside the geometric + octave window, or no
    # match survives and the test checks nothing.
    for i, j in enumerate(plant):
        uv_b[j] = uv_a[i] + rng.normal(0, 2, 2).astype(np.float32)
        lev_b[j] = lev_a[i]
    val_a = rng.uniform(size=na) > 0.1
    val_b = rng.uniform(size=nb) > 0.1
    radius = rng.uniform(5, 25, na).astype(np.float32)

    # Reference jnp path.
    box = window_mask(jnp.asarray(uv_a), jnp.asarray(uv_b), jnp.asarray(radius))
    lvl = level_window_mask(jnp.asarray(lev_a), jnp.asarray(lev_b), -1, 1)
    dist = hamming_matrix(jnp.asarray(desc_a), jnp.asarray(desc_b))
    idx_ref, d_ref = mutual_nn_match(
        dist,
        valid_a=jnp.asarray(val_a),
        valid_b=jnp.asarray(val_b),
        max_dist=100,
        ratio=0.9,
        extra_mask=box & lvl,
    )

    idx_p, d_p = projection_match(
        jnp.asarray(uv_a), jnp.asarray(radius),
        jnp.asarray(lev_a - 1), jnp.asarray(lev_a + 1), jnp.asarray(val_a),
        jnp.asarray(desc_a),
        jnp.asarray(uv_b), jnp.asarray(lev_b), jnp.asarray(val_b),
        jnp.asarray(desc_b),
        max_dist=100, ratio=0.9, interpret=True,
    )

    idx_ref, idx_p = np.asarray(idx_ref), np.asarray(idx_p)
    d_ref, d_p = np.asarray(d_ref), np.asarray(d_p)
    np.testing.assert_array_equal(idx_p, idx_ref)
    both = idx_ref >= 0
    np.testing.assert_array_equal(d_p[both], d_ref[both])
    assert both.sum() > 0  # planted matches must actually survive
