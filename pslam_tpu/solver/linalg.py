"""Small batched linear-algebra helpers for the solver."""

import jax.numpy as jnp


def inv3x3(A):
    """Batched closed-form 3x3 inverse via adjugate. A: (..., 3, 3)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det_safe = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=-1),
            jnp.stack([A21, A22, A23], axis=-1),
            jnp.stack([A31, A32, A33], axis=-1),
        ],
        axis=-2,
    )
    return adj / det_safe[..., None, None]


def solve_psd(A, b, jitter: float = 1e-6):
    """Solve A x = b for symmetric PSD A with a scaled diagonal jitter."""
    n = A.shape[-1]
    diag_mean = jnp.trace(A, axis1=-2, axis2=-1) / n
    A_reg = A + (jitter * jnp.maximum(diag_mean, 1.0))[..., None, None] * jnp.eye(
        n, dtype=A.dtype
    )
    return jnp.linalg.solve(A_reg, b)
