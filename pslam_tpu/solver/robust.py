"""Robust kernels and chi-square gates.

The reference uses g2o Huber kernels with fixed deltas and per-round chi2
outlier gates (Optimizer.cc:291-299, 699-706): sqrt(5.991) for 2-dof mono
edges, sqrt(7.815) for 3-dof stereo edges. We implement Huber as IRLS weights
applied to the normal equations, which is equivalent at the Gauss-Newton
level.
"""

import jax.numpy as jnp

# 95% chi-square quantiles used throughout the reference.
CHI2_MONO = 5.991  # 2 dof
CHI2_STEREO = 7.815  # 3 dof
CHI2_LINE = 5.991   # 2 dof point-to-line pairs
# (The composite LIL edge gate lives in solver/lil.py: CHI2_LIL = 11.07,
# matching the reference's chi2LLIL, Optimizer.cc:628,706.)

HUBER_MONO = jnp.sqrt(CHI2_MONO)
HUBER_STEREO = jnp.sqrt(CHI2_STEREO)


def huber_weight(chi2, delta):
    """IRLS weight for the Huber kernel.

    chi2 is the squared weighted residual norm (r^T Omega r); delta the Huber
    threshold on sqrt(chi2). Returns w such that using w*Omega in the normal
    equations reproduces g2o's robustified GN step.
    """
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(e <= delta, 1.0, delta / e)
