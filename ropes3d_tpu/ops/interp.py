"""Cubic spline interpolation (not-a-knot) in JAX.

Device-side replacement for the reference's
``scipy.interpolate.interp1d(kind='cubic')`` used by InterpolativeSweep
(reference robotpose/prediction/predict.py:310-313).  scipy's 'cubic' is a
not-a-knot cubic spline; knots here are always uniformly spaced (they come
from ``np.linspace``), which keeps the system small and dense-solvable on
device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cubic_spline_uniform(lo, hi, y: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the not-a-knot cubic spline through uniformly-spaced knots.

    Parameters
    ----------
    lo, hi : scalars (traced ok) — knot range; knots are linspace(lo, hi, n)
    y : [n] knot values (n >= 4)
    t : [m] evaluation points (must lie within [lo, hi])
    """
    n = y.shape[0]
    if n < 4:
        # The not-a-knot system is singular at n == 3 (first and last rows
        # coincide) and under-determined below that; scipy's 'cubic' also
        # requires >= 4 points.
        raise ValueError(
            f"cubic_spline_uniform needs >= 4 knots, got {n} "
            "(not-a-knot boundary conditions are singular below 4)"
        )
    h = (hi - lo) / (n - 1)

    # Second derivatives M with not-a-knot boundary conditions.  The system
    # matrix depends only on n (knots are uniform), so its inverse is a
    # compile-time numpy constant — a tiny on-device linalg.solve has a
    # millisecond-scale fixed cost on TPU that would dominate sweep stages.
    A = np.zeros((n, n))
    A[0, 0], A[0, 1], A[0, 2] = 1.0, -2.0, 1.0
    A[-1, -3], A[-1, -2], A[-1, -1] = 1.0, -2.0, 1.0
    for i in range(1, n - 1):
        A[i, i - 1], A[i, i], A[i, i + 1] = 1.0, 4.0, 1.0
    Ainv = np.linalg.solve(A, np.eye(n))
    b = jnp.zeros(n, y.dtype)
    interior = 6.0 * (y[2:] - 2.0 * y[1:-1] + y[:-2]) / (h * h)
    b = b.at[1:-1].set(interior)
    M = jnp.asarray(Ainv, y.dtype) @ b

    # Segment lookup (uniform spacing).
    idx = jnp.clip(jnp.floor((t - lo) / h).astype(jnp.int32), 0, n - 2)
    s = t - (lo + idx.astype(y.dtype) * h)
    yi = y[idx]
    yi1 = y[idx + 1]
    Mi = M[idx]
    Mi1 = M[idx + 1]
    return (
        yi
        + s * ((yi1 - yi) / h - h * (2.0 * Mi + Mi1) / 6.0)
        + s * s * Mi / 2.0
        + s * s * s * (Mi1 - Mi) / (6.0 * h)
    )
