"""Trajectory prototype generation.

Equivalent of the reference's `trajectory.py` (reference
trajectory.py:11-41): resample a cubic parametric spline through a small
set of route support points, producing the destination prototype a road
user follows across an intersection.
"""

from __future__ import annotations

import numpy as np


def generate_spline_prototype(x, y, npoints=5):
    """Cubic-spline trajectory prototype through the given support points.

    Host-side scenario setup (scipy FITPACK, like the reference); the
    in-simulation spline destination force uses the jit-compatible
    `ops.spline` instead.

    Parameters
    ----------
    x, y : array-like, equal length >= 3 (cubic needs >= 4 for k=3; with 3
        points FITPACK drops to a quadratic -- same as the reference).
    npoints : number of prototype points returned.
    """
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    if x.shape != y.shape:
        raise ValueError("x and y must be same length!")
    if x.size < 3:
        raise ValueError(
            "Provide at least 3 points to calculate a trajectory prototype")
    from scipy import interpolate

    tck, _ = interpolate.splprep((x, y), s=0.0, k=min(3, x.size - 1))
    xp, yp = interpolate.splev(np.linspace(0.0, 1.0, npoints), tck)
    return xp, yp
