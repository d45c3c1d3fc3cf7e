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

from cyclistsocialforce_tpu.utils.angles import limit_magnitude

# --------------------------------------------------------------------------
# pairwise repulsive fields
# --------------------------------------------------------------------------


def rep_force_twod_pair(dx, dy, cos_src, sin_src, cos_recv, sin_recv,
                        f_0, e_0, e_1, sigma_0, sigma_1, sigma_2, sigma_3):
    """Anisotropic elliptic repulsive force of the BMD2023 2D model
    (hot-loop form).

    Force exerted by a source agent on a receiver at relative position
    (dx, dy) = receiver - source. Math identical to
    TwoDBicycle.calcRepulsiveForce (reference vehicle.py:1560-1648) -- an
    elliptic potential whose decay and excentricity are modulated by the
    relative heading, renormalized to the potential magnitude -- but
    restructured for the TPU VPU: headings enter as precomputed
    (cos, sin) pairs and every per-pair angle function is replaced by a
    rotation identity, so the O(N^2) inner loop contains no trig/atan2,
    only sqrt/exp.

    All arguments broadcast elementwise; parameters are those of the SOURCE.
    Returns (Fx, Fy). Zero-distance pairs return 0 (the reference produces
    NaN there; callers mask self-pairs either way).
    """
    # sin^2 of the relative heading via the subtraction identity
    sin_rel = sin_src * cos_recv - cos_src * sin_recv
    sin2 = sin_rel * sin_rel

    vdecay0 = sigma_0 + sigma_1 * sin2
    vdecay1 = sigma_2 + sigma_3 * sin2
    e = e_0 - e_1 * sin2

    rho = jnp.sqrt(dx * dx + dy * dy)
    safe = jnp.where(rho > 0, rho, 1.0)
    # phi = azimuth of the receiver in the source's ego frame:
    # cos(phi) = cos(phi1 - psi_src), sin(phi) = sin(phi1 - psi_src)
    cosphi = jnp.clip((dx * cos_src + dy * sin_src) / safe, -1.0, 1.0)
    sinphi = (dy * cos_src - dx * sin_src) / safe

    sigma = vdecay0 - vdecay1 * jnp.sqrt((1 - cosphi) / 2)
    # d(sigma)/d(phi); sign(phi) == sign(sin(phi)) on (-pi, pi)
    dsigm = -vdecay1 * jnp.sqrt((1 + cosphi) / 2) * jnp.sign(sinphi) / 2

    ec2 = 1 - (e * cosphi) ** 2
    sq = jnp.sqrt(ec2)

    P = f_0 * jnp.exp(-rho * sq / sigma)

    frho = P * sq / sigma
    fphi = (-P * (ec2 * dsigm - e**2 * sinphi * cosphi * sigma)
            / (sigma**2 * sq))

    # rotate (frho, fphi) back to world axes: the magnitude is rotation-
    # invariant, so renormalize with |(frho, fphi)| directly
    fmag = jnp.sqrt(frho * frho + fphi * fphi)
    fmag = jnp.where(fmag > 0, fmag, 1.0)
    scale = P / (fmag * safe)
    fx = scale * (frho * dx - fphi * dy)
    fy = scale * (frho * dy + fphi * dx)

    zero = (f_0 == 0.0) | (rho == 0.0)
    return jnp.where(zero, 0.0, fx), jnp.where(zero, 0.0, fy)


def rep_force_twod(dx, dy, psi_src, psi_recv, f_0, e_0, e_1,
                   sigma_0, sigma_1, sigma_2, sigma_3):
    """Reference-signature wrapper of `rep_force_twod_pair` taking headings
    in radians (reference vehicle.py:1560-1648)."""
    return rep_force_twod_pair(
        dx, dy, jnp.cos(psi_src), jnp.sin(psi_src),
        jnp.cos(psi_recv), jnp.sin(psi_recv),
        f_0, e_0, e_1, sigma_0, sigma_1, sigma_2, sigma_3)


def rep_force_legacy_pair(dx, dy, cos_src, sin_src, e, inv_se,
                          inv_pdecay, amp):
    """Legacy v0.1 elliptic repulsive force (hot-loop form).

    Math identical to Bicycle.calcPotential/calcRepulsiveForce (reference
    vehicle.py:1054-1147): potential
    P = (p_0/p_decay) exp(-rho (1 - e cos(phi0)) / (sqrt(1-e^2) p_decay)),
    force (frho0, fphi0) = (P (1-e cos phi0), P e sin phi0)/sqrt(1-e^2)
    rotated to world axes. The speed-dependent excentricity terms are
    hoisted to per-source precomputations (`legacy_excentricity`;
    inv_se = 1/sqrt(1-e^2), amp = p_0/p_decay), and all per-pair trig is
    replaced by rotation identities -- only sqrt/exp remain in the O(N^2)
    loop.
    """
    rho = jnp.sqrt(dx * dx + dy * dy)
    safe = jnp.where(rho > 0, rho, 1.0)
    cosphi0 = (dx * cos_src + dy * sin_src) / safe
    sinphi0 = (dy * cos_src - dx * sin_src) / safe

    u = (1 - e * cosphi0) * inv_se
    P = amp * jnp.exp(-rho * u * inv_pdecay)

    frho0 = P * u
    fphi0 = P * e * sinphi0 * inv_se
    fx = (frho0 * dx - fphi0 * dy) / safe
    fy = (frho0 * dy + fphi0 * dx) / safe
    zero = rho == 0.0
    return jnp.where(zero, 0.0, fx), jnp.where(zero, 0.0, fy)


def legacy_excentricity(v_src, v_max_riding_fwd):
    """Speed-dependent excentricity of the legacy field,
    e = min((v / v_max)^0.1, 0.7) (reference vehicle.py:1093-1095).
    Negative speeds (possible while braking) are clamped to 0; the
    reference produces NaN there."""
    v = jnp.maximum(v_src, 0.0)
    return jnp.minimum(jnp.power(v / v_max_riding_fwd, 0.1), 0.7)


def potential_legacy(dx, dy, psi_src, v_src, v_max_riding_fwd,
                     p_0, p_decay):
    """Legacy elliptic repulsive POTENTIAL of a source agent evaluated at
    offsets (dx, dy) from it (reference Bicycle.calcPotential,
    vehicle.py:1066-1104): P = p_0 exp(-rho (1 - e cos phi0) /
    (sqrt(1 - e^2) p_decay)) with the speed-dependent excentricity e."""
    e = legacy_excentricity(v_src, v_max_riding_fwd)
    inv_se = 1.0 / jnp.sqrt(1 - e**2)
    rho = jnp.sqrt(dx * dx + dy * dy)
    safe = jnp.where(rho > 0, rho, 1.0)
    cosphi0 = (dx * jnp.cos(psi_src) + dy * jnp.sin(psi_src)) / safe
    u = (1 - e * jnp.where(rho > 0, cosphi0, 1.0)) * inv_se
    return p_0 * jnp.exp(-rho * u / p_decay)


def rep_force_legacy(dx, dy, psi_src, v_src, v_max_riding_fwd,
                     p_0, p_decay):
    """Reference-signature wrapper of `rep_force_legacy_pair`
    (reference vehicle.py:1054-1147). Parameters are those of the SOURCE."""
    e = legacy_excentricity(v_src, v_max_riding_fwd)
    inv_se = 1.0 / jnp.sqrt(1 - e**2)
    return rep_force_legacy_pair(
        dx, dy, jnp.cos(psi_src), jnp.sin(psi_src), e,
        inv_se, 1.0 / p_decay, p_0 / p_decay)


# --------------------------------------------------------------------------
# foe masking and dense pairwise assembly
# --------------------------------------------------------------------------


def untracked_foes_tile(x_src, y_src, idx_src, active_src, hfov_src,
                        x_recv, y_recv, psi_recv, idx_recv, active_recv,
                        priority_p2r: bool = False):
    """Tile of the "receiver j does not react to source i" mask.

    Tiled form of SocialForceIntersection.get_untracked_foes (reference
    intersection.py:690-745) including its quirk that the FOV threshold is
    indexed by the SOURCE i: untracked[i, j] is True when the azimuth of
    source i relative to receiver j's heading exceeds hfov_i / 2, when the
    global agent indices coincide (self-pair), or (under priority-to-the-
    right) when that azimuth is positive.

    Source args are [S], receiver args [R]; returns [S, R] bool. The same
    function serves the dense [N, N] case, receiver-chunked evaluation, and
    the shard_map path (sources = all-gathered, receivers = local shard).

    Hot-loop form: with rel = wrap(azimuth - psi_recv) in (-pi, pi],
    |rel| > hfov/2  <=>  cos(rel) < cos(hfov/2), and cos/sin(rel) follow
    from rotation identities -- no per-pair trig. Coincident distinct
    agents (rho == 0, azimuth undefined) are treated as untracked.
    """
    dx = x_src[:, None] - x_recv[None, :]
    dy = y_src[:, None] - y_recv[None, :]
    cr = jnp.cos(psi_recv)[None, :]
    sr = jnp.sin(psi_recv)[None, :]
    # rho * cos/sin of the azimuth of source i relative to receiver j's
    # heading
    rho_cos_rel = dx * cr + dy * sr
    rho_sin_rel = dy * cr - dx * sr
    rho = jnp.sqrt(dx * dx + dy * dy)
    safe = jnp.where(rho > 0, rho, 1.0)

    cos_half_hfov = jnp.cos(hfov_src / 2)[:, None]
    untracked = rho_cos_rel / safe < cos_half_hfov
    untracked = untracked | (idx_src[:, None] == idx_recv[None, :])
    untracked = untracked | (rho == 0.0)
    if priority_p2r:
        untracked = untracked | (rho_sin_rel > 0)
    untracked = untracked | ~active_src[:, None] | ~active_recv[None, :]
    return untracked


def untracked_foes(x, y, psi, hfov, active=None, priority_p2r: bool = False):
    """Dense [N, N] foe mask (i = source, j = receiver); see
    `untracked_foes_tile`."""
    n = x.shape[0]
    idx = jnp.arange(n)
    if active is None:
        active = jnp.ones((n,), dtype=bool)
    hfov = jnp.broadcast_to(jnp.asarray(hfov), (n,))
    return untracked_foes_tile(x, y, idx, active, hfov,
                               x, y, psi, idx, active,
                               priority_p2r=priority_p2r)


def sum_sources(fx_pair, fy_pair, tracked):
    """Mask untracked pairs and sum the repulsive force over the source
    axis (reference intersection.py:822-838)."""
    frep_x = jnp.sum(jnp.where(tracked, fx_pair, 0.0), axis=0)
    frep_y = jnp.sum(jnp.where(tracked, fy_pair, 0.0), axis=0)
    return frep_x, frep_y


def clamp_add_dest(frep_x, frep_y, fdest_x, fdest_y):
    """Clamp the summed repulsive force to the destination-force magnitude
    and add the destination force (reference intersection.py:841-848)."""
    fdest_mag = jnp.sqrt(fdest_x**2 + fdest_y**2)
    frep_x, frep_y = limit_magnitude(frep_x, frep_y, fdest_mag)
    return frep_x + fdest_x, frep_y + fdest_y


def sum_repulsive(fx_pair, fy_pair, tracked, fdest_x, fdest_y):
    """Mask, sum over sources, and clamp the repulsive force.

    Mirrors intersection.py:822-848: sum tracked pairwise forces over the
    source axis, limit the summed magnitude to the destination-force
    magnitude, and add the destination force.
    """
    frep_x, frep_y = sum_sources(fx_pair, fy_pair, tracked)
    return clamp_add_dest(frep_x, frep_y, fdest_x, fdest_y)


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
    (reference vehicle.py:1196-1216): relaxation of the current velocity
    toward v_desired along the straight-line direction.

    Divergence from the reference (degenerate case only): at the
    destination the straight force is zero and the reference divides
    0/0 -> NaN (vehicle.py:1203-1205 has no guard); here the force is 0.
    """
    r = jnp.sqrt(fx_straight**2 + fy_straight**2)
    safe = jnp.where(r > 0, r, 1.0)
    ex = fx_straight / safe
    ey = fy_straight / safe
    fx = (1 / relax) * (v_desired * ex - v * jnp.cos(psi))
    fy = (1 / relax) * (v_desired * ey - v * jnp.sin(psi))
    zero = jnp.zeros_like(fx)
    return jnp.where(r > 0, fx, zero), jnp.where(r > 0, fy, zero)


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
