"""Fused projection matching as a Pallas TPU kernel.

The jnp path (ops/match.py + pipeline/track_ops.py:_match_points_to_frame)
materializes an (Na, Nb) int32 Hamming matrix plus two (Na, Nb) bool masks in
HBM before reducing them. This kernel fuses the whole ORBmatcher
SearchByProjection pipeline (reference ORBmatcher.cc:45-157, 1328-1464) into
one pass over (TA, TB) tiles held in VMEM:

    geometric window mask + octave window + validity
    -> +/-1 int8 descriptor dot on the MXU -> Hamming distance
    -> per-row best/second-best merge + per-column min (for the mutual check)

Only O(Na + Nb) results are ever written to HBM. The ratio/threshold/mutual
acceptance and the rotation-consistency histogram stay outside (they are
O(N) elementwise).

Parameter packing:
    a_par: (8, Na) f32 rows [u, v, radius, lev_lo, lev_hi, valid, 0, 0]
    b_par: (8, Nb) f32 rows [u, v, level, valid, 0, 0, 0, 0]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BITS = 256
BIG = 1 << 20
# In-tile sentinel for masked pairs: must stay small enough that
# TILE_BIG * max(TA, TB) + lane fits in int32 (min-pack argmin trick).
TILE_BIG = 512
TA = 128
TB = 128


def _match_kernel(
    a_bits_ref, a_par_ref, b_bits_ref, b_par_ref,
    best_ref, second_ref, bestj_ref, colmin_ref, colarg_ref,
    rb1, rb2, rbj, cmin_scr, carg_scr,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)

    # --- pairwise distance tile on the MXU ---------------------------------
    # +/-1 bits as bfloat16 with f32 accumulation: products are +/-1 and the
    # sum is <= 256, so the result is exact. b arrives pre-transposed
    # (N_BITS, TB) so this is a plain (TA,K)x(K,TB) matmul. precision must be
    # pinned to DEFAULT: the package-global jax_default_matmul_precision=
    # "highest" would request contract_precision<fp32> on bf16 operands,
    # which Mosaic rejects on v5e ("Bad lhs type").
    dot = jax.lax.dot_general(
        a_bits_ref[:].astype(jnp.bfloat16), b_bits_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(jnp.int32)
    dist = (N_BITS - dot) >> 1  # (TA, TB)

    # --- geometric + validity mask, computed in-register --------------------
    au = a_par_ref[0, :].reshape(TA, 1)
    av = a_par_ref[1, :].reshape(TA, 1)
    ar = a_par_ref[2, :].reshape(TA, 1)
    alo = a_par_ref[3, :].reshape(TA, 1)
    ahi = a_par_ref[4, :].reshape(TA, 1)
    aok = a_par_ref[5, :].reshape(TA, 1) > 0.5
    bu = b_par_ref[0, :].reshape(1, TB)
    bv = b_par_ref[1, :].reshape(1, TB)
    bl = b_par_ref[2, :].reshape(1, TB)
    bok = b_par_ref[3, :].reshape(1, TB) > 0.5
    mask = (
        (jnp.abs(au - bu) <= ar)
        & (jnp.abs(av - bv) <= ar)
        & (bl >= alo)
        & (bl <= ahi)
        & aok
        & bok
    )
    # Valid Hamming distances are <= N_BITS; use a small sentinel so the
    # min-packed (dist, lane) fits comfortably in int32. (Mosaic has no
    # int32 argmin lowering on TPU, so argmin is done by packing the lane
    # index into the low bits and taking a single min.)
    d = jnp.where(mask, dist, TILE_BIG)

    # --- per-row best/second within this tile -------------------------------
    col = jax.lax.broadcasted_iota(jnp.int32, (TA, TB), 1)
    packed = d * TB + col  # lexicographic (dist, lane) in one int32
    p1 = jnp.min(packed, axis=1)  # (TA,)
    m1 = p1 // TB
    j1 = p1 % TB
    d2 = jnp.where(col == j1[:, None], TILE_BIG, d)
    m2 = jnp.min(d2, axis=1)
    m1 = jnp.where(m1 >= TILE_BIG, BIG, m1)
    m2 = jnp.where(m2 >= TILE_BIG, BIG, m2)
    j1 = j1 + j * TB

    # --- merge with the running row state (reset at j == 0) -----------------
    @pl.when(j == 0)
    def _():
        rb1[0, :] = jnp.full((TA,), BIG, jnp.int32)
        rb2[0, :] = jnp.full((TA,), BIG, jnp.int32)
        rbj[0, :] = jnp.full((TA,), -1, jnp.int32)

    b1, b2, bj = rb1[0, :], rb2[0, :], rbj[0, :]
    new_b1 = jnp.minimum(b1, m1)
    new_bj = jnp.where(m1 < b1, j1, bj)
    new_b2 = jnp.minimum(jnp.maximum(b1, m1), jnp.minimum(b2, m2))
    rb1[0, :] = new_b1
    rb2[0, :] = new_b2
    rbj[0, :] = new_bj

    @pl.when(j == nj - 1)
    def _():
        best_ref[0, :] = rb1[0, :]
        second_ref[0, :] = rb2[0, :]
        bestj_ref[0, :] = rbj[0, :]

    # --- per-column min accumulated across row tiles -------------------------
    # The column output block (indexed by j) is revisited once per row tile i,
    # but those visits are NOT consecutive in the (i-major, j-minor) grid
    # order, so the output VMEM buffer cannot carry the running state between
    # them. Instead the running per-column min lives in a full-width VMEM
    # scratch (scratch persists across the whole sequential TPU grid), and
    # the output block is written only on the final row tile — its copy-out
    # is the last one in grid order, so it wins in HBM.
    row = jax.lax.broadcasted_iota(jnp.int32, (TA, TB), 0)
    cpacked = jnp.min(d * TA + row, axis=0)  # (TB,)
    cm1 = cpacked // TA
    cm1 = jnp.where(cm1 >= TILE_BIG, BIG, cm1)
    ca1 = cpacked % TA + i * TA

    csl = pl.ds(pl.multiple_of(j * TB, TB), TB)

    @pl.when(i == 0)
    def _():
        cmin_scr[0, csl] = cm1
        carg_scr[0, csl] = ca1

    @pl.when(i > 0)
    def _():
        prev = cmin_scr[0, csl]
        take = cm1 < prev
        cmin_scr[0, csl] = jnp.where(take, cm1, prev)
        carg_scr[0, csl] = jnp.where(take, ca1, carg_scr[0, csl])

    @pl.when(i == ni - 1)
    def _():
        colmin_ref[0, :] = cmin_scr[0, csl]
        colarg_ref[0, :] = carg_scr[0, csl]


def _pad_to(x, n, axis, fill=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_projection_match(
    a_bits, a_par, b_bits, b_par, *, interpret: bool = False
):
    """Run the fused matcher.

    a_bits: (Na, 256) int8 in {-1, +1}; a_par: (8, Na) f32 (see module doc)
    b_bits: (Nb, 256) int8;            b_par: (8, Nb) f32
    Returns (best, second, best_j, col_min, col_argmin) with the padded
    tail trimmed: best/second are int32 distances (BIG where no candidate).
    """
    Na, Nb = a_bits.shape[0], b_bits.shape[0]
    Nap = -(-Na // TA) * TA
    Nbp = -(-Nb // TB) * TB
    a_bits = _pad_to(a_bits, Nap, 0)
    b_bits_t = _pad_to(b_bits, Nbp, 0).T  # (N_BITS, Nbp) for plain matmul
    a_par = _pad_to(a_par, Nap, 1)  # padded valid flag = 0 -> masked out
    b_par = _pad_to(b_par, Nbp, 1)

    grid = (Nap // TA, Nbp // TB)
    out = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TA, N_BITS), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TA), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_BITS, TB), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TB), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TA), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TA), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TA), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Nap), jnp.int32),
            jax.ShapeDtypeStruct((1, Nap), jnp.int32),
            jax.ShapeDtypeStruct((1, Nap), jnp.int32),
            jax.ShapeDtypeStruct((1, Nbp), jnp.int32),
            jax.ShapeDtypeStruct((1, Nbp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, TA), jnp.int32),
            pltpu.VMEM((1, TA), jnp.int32),
            pltpu.VMEM((1, TA), jnp.int32),
            pltpu.VMEM((1, Nbp), jnp.int32),
            pltpu.VMEM((1, Nbp), jnp.int32),
        ],
        interpret=interpret,
    )(a_bits, a_par, b_bits_t, b_par)
    best, second, bestj, colmin, colarg = out
    return (
        best[0, :Na], second[0, :Na], bestj[0, :Na],
        colmin[0, :Nb], colarg[0, :Nb],
    )


def projection_match(
    uv_a, radius_a, lev_lo_a, lev_hi_a, valid_a, desc_a,
    uv_b, level_b, valid_b, desc_b,
    *, max_dist: int = 100, ratio: float = 0.9, interpret: bool = False,
):
    """Drop-in fused equivalent of window_mask + level_window_mask +
    hamming_matrix + mutual_nn_match (ops/match.py) for projection search.

    desc_* are packed (N, 32) uint8. Returns (match_idx (Na,) int32 or -1,
    best_dist (Na,) int32).
    """
    from pslam_tpu.ops.match import unpack_bits

    a_bits = unpack_bits(desc_a)
    b_bits = unpack_bits(desc_b)
    Na, Nb = a_bits.shape[0], b_bits.shape[0]
    zeros_a = jnp.zeros(Na, jnp.float32)
    a_par = jnp.stack([
        uv_a[:, 0], uv_a[:, 1],
        jnp.broadcast_to(jnp.asarray(radius_a, jnp.float32), (Na,)),
        lev_lo_a.astype(jnp.float32), lev_hi_a.astype(jnp.float32),
        valid_a.astype(jnp.float32), zeros_a, zeros_a,
    ])
    zeros_b = jnp.zeros(Nb, jnp.float32)
    b_par = jnp.stack([
        uv_b[:, 0], uv_b[:, 1], level_b.astype(jnp.float32),
        valid_b.astype(jnp.float32),
        zeros_b, zeros_b, zeros_b, zeros_b,
    ])
    best, second, bestj, colmin, colarg = fused_projection_match(
        a_bits, a_par, b_bits, b_par, interpret=interpret
    )
    mutual = colarg[jnp.clip(bestj, 0, Nb - 1)] == jnp.arange(Na)
    ok = (
        (best <= max_dist)
        & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
        & mutual
        & (bestj >= 0)
    )
    return jnp.where(ok, bestj, -1), best
