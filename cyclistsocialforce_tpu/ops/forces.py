"""Social-force field evaluations (repulsive, destination, infrastructure).

TPU-native, fully vectorized re-implementation of the reference force layer:
  - anisotropic elliptic repulsive field of the BMD2023 "2D model"
    (reference vehicle.py:1560-1648)
  - legacy speed-excentric elliptic field of the v0.1 Bicycle
    (reference vehicle.py:1066-1147)
  - straight-line/destination forces (reference vehicle.py:1150-1216,
    2078-2108)
  - road-edge inverse-power repulsion (reference intersection.py:226-242)
  - FOV / priority-to-the-right foe masking
    (reference intersection.py:690-745)
  - repulsive-force magnitude clamp + summation
    (reference intersection.py:825-851)

Forces have *velocity* semantics: |F| is the desired speed and atan2(Fy, Fx)
the desired heading (reference README.md:4).

All pairwise kernels are written as elementwise functions of relative
coordinates so they can be evaluated dense ([N, N] via broadcasting, for
small N) or blockwise (Pallas tiles / neighbor lists, for large N) without
touching the math.
"""

from __future__ import annotations

import jax.numpy as jnp

from cyclistsocialforce_tpu.utils.angles import (
    angle_difference,
    cart2polar,
    limit_angle,
    limit_magnitude,
)

# --------------------------------------------------------------------------
# pairwise repulsive fields
# --------------------------------------------------------------------------


def rep_force_twod(dx, dy, psi_src, psi_recv, f_0, e_0, e_1,
                   sigma_0, sigma_1, sigma_2, sigma_3):
    """Anisotropic elliptic repulsive force of the BMD2023 2D model.

    Force exerted by a source agent (heading ``psi_src``) on a receiver at
    relative position (dx, dy) = receiver - source with heading ``psi_recv``.
    Exact port of TwoDBicycle.calcRepulsiveForce (reference
    vehicle.py:1560-1648): an elliptic potential whose decay and
    excentricity are modulated by the relative heading, with the force
    renormalized to the potential magnitude.

    All arguments broadcast elementwise; parameters are those of the SOURCE.
    Returns (Fx, Fy). The rho == 0 self-pair produces NaN (as in the
    reference) -- callers must mask self-pairs.
    """
    psi_rel = psi_src - psi_recv
    sin2 = jnp.sin(psi_rel) ** 2

    vdecay0 = sigma_0 + sigma_1 * sin2
    vdecay1 = sigma_2 + sigma_3 * sin2
    e = e_0 - e_1 * sin2

    rho, phi1 = cart2polar(dx, dy)
    phi = limit_angle(phi1 - psi_src)

    cosphi = jnp.cos(phi)
    sinphi = jnp.sin(phi)

    sigma = vdecay0 - vdecay1 * jnp.sqrt((1 - cosphi) / 2)
    dsigm = -vdecay1 * jnp.sqrt((1 + cosphi) / 2) * jnp.sign(phi) / 2

    ec2 = 1 - (e * cosphi) ** 2
    sq = jnp.sqrt(ec2)

    P = f_0 * jnp.exp(-rho * sq / sigma)

    frho = P * sq / sigma
    fphi = (-P * (ec2 * dsigm - e**2 * sinphi * cosphi * sigma)
            / (sigma**2 * sq))

    fx = frho * jnp.cos(phi1) - fphi * jnp.sin(phi1)
    fy = frho * jnp.sin(phi1) + fphi * jnp.cos(phi1)

    fmag = jnp.sqrt(fx**2 + fy**2)
    fx = P * fx / fmag
    fy = P * fy / fmag

    zero = f_0 == 0.0
    return jnp.where(zero, 0.0, fx), jnp.where(zero, 0.0, fy)


def rep_force_legacy(dx, dy, psi_src, v_src, v_max_riding_fwd,
                     p_0, p_decay):
    """Legacy v0.1 elliptic repulsive force with speed-dependent excentricity.

    Exact port of Bicycle.calcPotential/calcRepulsiveForce (reference
    vehicle.py:1054-1147): e = min((v / v_max)^0.1, 0.7), potential
    P = p_0 exp(-rho (1 - e cos(phi0)) / (sqrt(1-e^2) p_decay)).

    Returns (Fx, Fy); parameters are those of the SOURCE. Self-pairs (rho=0)
    produce NaN and must be masked.
    """
    e = jnp.minimum(jnp.power(v_src / v_max_riding_fwd, 0.1), 0.7)

    rho, phi = cart2polar(dx, dy)
    phi0 = phi - psi_src

    se = jnp.sqrt(1 - e**2)
    b = (1 / (se * p_decay)) * rho * (1 - e * jnp.cos(phi0))
    P = p_0 * jnp.exp(-b) / p_decay

    frho0 = P * (1 - e * jnp.cos(phi0)) / se
    fphi0 = P * (e * jnp.sin(phi0)) / se

    fx = frho0 * jnp.cos(phi) - fphi0 * jnp.sin(phi)
    fy = frho0 * jnp.sin(phi) + fphi0 * jnp.cos(phi)
    return fx, fy


# --------------------------------------------------------------------------
# foe masking and dense pairwise assembly
# --------------------------------------------------------------------------


def untracked_foes(x, y, psi, hfov, active=None, priority_p2r: bool = False):
    """Pairwise "receiver j does not react to source i" mask.

    Exact port of SocialForceIntersection.get_untracked_foes (reference
    intersection.py:690-745) including its quirk that the FOV threshold is
    indexed by the SOURCE i: untracked[i, j] is True when the azimuth of
    source i relative to receiver j's heading exceeds hfov_i / 2, when
    i == j, or (under priority-to-the-right) when that azimuth is positive.

    Returns [N, N] bool, i = source, j = receiver.
    """
    n = x.shape[0]
    dx = x[:, None] - x[None, :]   # [i, j] = x_i - x_j
    dy = y[:, None] - y[None, :]
    # azimuth of source i as seen from receiver j
    foe_azimuth_abs = limit_angle(jnp.arctan2(dy, dx))
    rel = angle_difference(psi[None, :], foe_azimuth_abs)

    hfov_i = jnp.broadcast_to(jnp.asarray(hfov), (n,))
    untracked = jnp.abs(rel) > hfov_i[:, None] / 2
    untracked = untracked | jnp.eye(n, dtype=bool)
    if priority_p2r:
        untracked = untracked | (rel > 0)
    if active is not None:
        untracked = untracked | ~active[:, None] | ~active[None, :]
    return untracked


def sum_repulsive(fx_pair, fy_pair, tracked, fdest_x, fdest_y):
    """Mask, sum over sources, and clamp the repulsive force.

    Mirrors intersection.py:822-848: sum tracked pairwise forces over the
    source axis, limit the summed magnitude to the destination-force
    magnitude, and add the destination force.
    """
    fx_pair = jnp.where(tracked, fx_pair, 0.0)
    fy_pair = jnp.where(tracked, fy_pair, 0.0)
    frep_x = jnp.sum(fx_pair, axis=0)
    frep_y = jnp.sum(fy_pair, axis=0)
    fdest_mag = jnp.sqrt(fdest_x**2 + fdest_y**2)
    frep_x, frep_y = limit_magnitude(frep_x, frep_y, fdest_mag)
    return frep_x + fdest_x, frep_y + fdest_y


# --------------------------------------------------------------------------
# destination forces
# --------------------------------------------------------------------------


def dest_force_straight(x, y, dest_x, dest_y, vd, ddest):
    """Straight-line destination force field (reference vehicle.py:1150-1187).

    F points from (x, y) to the destination with magnitude vd (the desired
    speed). Zero at ddest == 0.
    """
    safe = jnp.where(ddest > 0, ddest, 1.0)
    fx = jnp.where(ddest > 0, -vd * (x - dest_x) / safe, 0.0)
    fy = jnp.where(ddest > 0, -vd * (y - dest_y) / safe, 0.0)
    return fx, fy


def dest_force_hm(fx_straight, fy_straight, v, psi, v_desired,
                  relax: float = 3.0):
    """Helbing-Molnar acceleration-semantics destination force
    (reference vehicle.py:1196-1216)."""
    r = jnp.sqrt(fx_straight**2 + fy_straight**2)
    ex = fx_straight / r
    ey = fy_straight / r
    fx = (1 / relax) * (v_desired * ex - v * jnp.cos(psi))
    fy = (1 / relax) * (v_desired * ey - v * jnp.sin(psi))
    return fx, fy


# --------------------------------------------------------------------------
# infrastructure forces
# --------------------------------------------------------------------------


def road_edge_force(x, y, vertices, weights, F_0, sigma):
    """Inverse-power repulsion from road-edge polyline vertices.

    Exact port of RoadEdge.calcRepulsiveForce (reference
    intersection.py:226-242): each vertex repels with magnitude
    F_0 * r^-sigma along the unit vector away from the vertex; forces are
    summed over vertices.

    Parameters
    ----------
    x, y : [M] evaluation points.
    vertices : [V, 2] polyline vertices (padded).
    weights : [V] 1.0 for real vertices, 0.0 for padding.
    """
    dx = vertices[None, :, 0] - x[:, None]   # [M, V]
    dy = vertices[None, :, 1] - y[:, None]
    r = jnp.sqrt(dx**2 + dy**2)
    r_safe = jnp.where(r > 0, r, 1.0)
    f = -F_0 * r_safe**-sigma * weights[None, :]
    fx = jnp.sum(jnp.where(r > 0, f * dx / r_safe, 0.0), axis=1)
    fy = jnp.sum(jnp.where(r > 0, f * dy / r_safe, 0.0), axis=1)
    return fx, fy
