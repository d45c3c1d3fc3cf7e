"""Angle and vector math primitives (JAX).

TPU-native re-implementation of the math utility layer of the reference
cyclist social-force model (reference: src/cyclistsocialforce/utils.py:56-227).
All functions are pure, branchless, dtype-polymorphic jnp functions that
broadcast over arbitrary leading axes so they can be vmapped/sharded over the
agent axis.

Semantics are kept exactly equal to the reference (including its quirks, e.g.
`angle_difference` sign selection via the two-sided wrap test) so that
trajectory parity holds to float tolerance.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "limit_angle",
    "expand_angle",
    "angle_difference",
    "cart2polar",
    "polar2cart",
    "thresh",
    "limit_magnitude",
    "angle_sumo_to_sfm",
    "angle_sfm_to_sumo",
    "to_deg",
    "to_rad",
]

_TWO_PI = 2.0 * jnp.pi


def limit_angle(theta):
    """Wrap an angle (rad) into [-pi, pi].

    Mirrors reference utils.py:124-139: first remove whole turns with a floor
    division, then fold the single remaining excess turn.
    """
    theta = theta - jnp.floor(theta / _TWO_PI) * _TWO_PI
    theta = jnp.where(theta > jnp.pi, theta - _TWO_PI, theta)
    theta = jnp.where(theta < -jnp.pi, theta + _TWO_PI, theta)
    return theta


def expand_angle(theta):
    """Convert an angle from [-pi, pi] to [0, 2*pi) (reference utils.py:142-148)."""
    return jnp.where(theta < 0, _TWO_PI + theta, theta)


def angle_difference(a1, a2):
    """Signed smallest rotation `da` such that a1 + da lands on a2 (mod 2*pi).

    Exact port of the reference's selection logic (utils.py:151-182): compute
    the unsigned smallest difference, then pick the sign by testing which of
    a1 -/+ da wraps closest to a2.
    """
    da = jnp.abs(a1 - a2)
    da = jnp.where(da > jnp.pi, _TWO_PI - da, da)
    test_1 = jnp.abs(limit_angle(a1 - da) - a2)
    test_2 = jnp.abs(limit_angle(a1 + da) - a2)
    return jnp.where(test_1 < test_2, -da, da)


def cart2polar(x, y):
    """Cartesian -> polar. Returns (rho, phi) with phi in [-pi, pi].

    Reference utils.py:185-194 uses arccos(x/rho) with a sign flip on y<0;
    rho == 0 yields NaN there as well. Callers masking self-interaction must
    use `safe` guards before division.
    """
    rho = jnp.sqrt(x * x + y * y)
    phi = jnp.arccos(x / rho)
    phi = jnp.where(y < 0, -phi, phi)
    return rho, phi


def polar2cart(rho, phi):
    """Polar -> cartesian (reference utils.py:197-201)."""
    return rho * jnp.cos(phi), rho * jnp.sin(phi)


def thresh(x, minmax):
    """Clip x into [minmax[0], minmax[1]] (reference utils.py:204-227)."""
    return jnp.maximum(jnp.minimum(x, minmax[1]), minmax[0])


def limit_magnitude(x, y, r):
    """Rescale vectors (x, y) whose magnitude exceeds r down to magnitude r.

    Reference utils.py:56-86. Vectors at/below the limit pass through
    untouched; zero vectors stay zero.
    """
    rin = jnp.sqrt(x * x + y * y)
    exceed = rin > r
    # Avoid 0/0 for zero-magnitude vectors: they never exceed a nonnegative r.
    denom = jnp.where(rin > 0, rin, 1.0)
    scale = jnp.where(exceed, r / denom, 1.0)
    return x * scale, y * scale


def to_deg(rad):
    """Radians -> degrees (reference utils.py:101-102)."""
    return 360.0 * rad / _TWO_PI


def to_rad(deg):
    """Degrees -> radians (reference utils.py:105-106)."""
    return _TWO_PI * deg / 360.0


def angle_sumo_to_sfm(theta_deg):
    """SUMO angle convention (deg, clockwise from north) -> SFM (rad, ccw from east).

    Reference utils.py:114-116.
    """
    return limit_angle(jnp.pi / 2 - to_rad(theta_deg))


def angle_sfm_to_sumo(theta_rad):
    """SFM angle convention -> SUMO (reference utils.py:119-121)."""
    return to_deg(expand_angle(jnp.pi / 2 - theta_rad))
