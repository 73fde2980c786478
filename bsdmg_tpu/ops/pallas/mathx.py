"""Inverse-trig built from Mosaic-supported primitives.

Pallas TPU lowering has no ``acos``/``asin``/``atan``/``atan2`` (only
``sin``/``cos``/``log``/``pow`` of the transcendentals used here), so kernels
that need them — the mandelbulb distance estimator — use these polynomial
versions. ``atan`` is an odd degree-17 minimax-style polynomial in x² on
[0, 1] (max error 4.6e-8, fitted by Chebyshev regression against
``np.arctan``), range-reduced via ``atan(v) = pi/2 - atan(1/v)``;
``atan2``/``acos`` follow by the usual identities. Errors are below float32
round-off for the fractal iteration they feed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# atan(x) = x * P(x^2) on [0, 1]; degree-8 Chebyshev regression coefficients
_ATAN_P = (
    0.9999999880822991,
    -0.33333120743008615,
    0.1999371506337942,
    -0.142131856822068,
    0.10681372641605166,
    -0.07596691513630713,
    0.043854018740410415,
    -0.016826361743595055,
    0.0030496670837260403,
)

_HALF_PI = float(np.pi / 2.0)
_PI = float(np.pi)


def atan_c(v):
    """Polynomial arctangent on planes (any real input)."""
    a = jnp.abs(v)
    big = a > 1.0
    x = jnp.where(big, 1.0 / jnp.maximum(a, 1e-30), a)
    t = x * x
    p = jnp.full_like(x, _ATAN_P[-1])
    for c in _ATAN_P[-2::-1]:
        p = p * t + c
    r = x * p
    r = jnp.where(big, _HALF_PI - r, r)
    return jnp.where(v < 0, -r, r)


def atan2_c(y, x):
    """Polynomial ``atan2`` on planes (quadrant-correct, atan2(0, 0) = 0).

    Signed-zero/subnormal caveat: ``y < 0`` is false for ``y == -0.0`` (and
    for negative subnormals after TPU flush-to-zero), so ``atan2_c(-0.0,
    x < 0)`` returns ``+pi`` where IEEE atan2 returns ``-pi``. The boundary
    set is measure-zero and irrelevant for the mandelbulb phi; documented
    here rather than branching on ``signbit`` (which Mosaic lowers poorly).
    """
    # the magnitude guard must preserve x's sign: flipping a tiny negative
    # x to +eps while still applying the +-pi quadrant correction returns
    # +-3pi/2 instead of +-pi/2
    safe_x = jnp.where(
        jnp.abs(x) < 1e-30, jnp.where(x < 0, -1e-30, 1e-30), x
    )
    base = atan_c(y / safe_x)
    add = jnp.where(
        safe_x < 0, jnp.where(y < 0, -_PI, _PI), 0.0
    )
    return base + add


def acos_c(u):
    """Polynomial ``acos`` on planes for u in [-1, 1]."""
    u = jnp.clip(u, -1.0, 1.0)
    s = jnp.sqrt(jnp.maximum(1.0 - u * u, 0.0))
    return atan2_c(s, u)
