"""Golden-value tests of the math utility layer against independently
computed NumPy expectations (reference semantics: utils.py:56-227)."""

import numpy as np
import pytest

from cyclistsocialforce_tpu.utils import (
    angle_difference,
    angle_sfm_to_sumo,
    angle_sumo_to_sfm,
    cart2polar,
    limit_angle,
    limit_magnitude,
    thresh,
)


def ref_limit_angle(theta):
    theta = np.floor(theta / (2 * np.pi)) * (-2 * np.pi) + theta
    if theta > np.pi:
        theta -= 2 * np.pi
    elif theta < -np.pi:
        theta += 2 * np.pi
    return theta


def ref_angle_difference(a1, a2):
    da = a1 - a2 if a1 > a2 else a2 - a1
    if da > np.pi:
        da = 2 * np.pi - da
    t1 = abs(ref_limit_angle(a1 - da) - a2)
    t2 = abs(ref_limit_angle(a1 + da) - a2)
    return -da if t1 < t2 else da


ANGLES = np.linspace(-10.0, 10.0, 41)


def test_limit_angle_matches_reference_semantics():
    got = np.asarray(limit_angle(ANGLES))
    want = np.array([ref_limit_angle(a) for a in ANGLES])
    np.testing.assert_allclose(got, want, atol=1e-12)
    assert np.all(got <= np.pi) and np.all(got >= -np.pi)


def test_angle_difference_matches_reference_semantics():
    rng = np.random.default_rng(0)
    a1 = rng.uniform(-np.pi, np.pi, 200)
    a2 = rng.uniform(-np.pi, np.pi, 200)
    got = np.asarray(angle_difference(a1, a2))
    want = np.array([ref_angle_difference(x, y) for x, y in zip(a1, a2)])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_angle_difference_moves_a1_to_a2():
    rng = np.random.default_rng(1)
    a1 = rng.uniform(-np.pi, np.pi, 100)
    a2 = rng.uniform(-np.pi, np.pi, 100)
    da = np.asarray(angle_difference(a1, a2))
    # a1 + da should equal a2 (mod 2*pi)
    err = np.asarray(limit_angle(a1 + da - a2))
    np.testing.assert_allclose(err, 0, atol=1e-9)


def test_cart2polar_roundtrip_and_convention():
    rng = np.random.default_rng(2)
    x = rng.normal(size=100)
    y = rng.normal(size=100)
    rho, phi = cart2polar(x, y)
    np.testing.assert_allclose(np.asarray(rho), np.hypot(x, y), atol=1e-12)
    np.testing.assert_allclose(np.asarray(phi), np.arctan2(y, x), atol=1e-9)


def test_thresh():
    x = np.array([-5.0, 0.0, 5.0])
    np.testing.assert_allclose(np.asarray(thresh(x, (-1.0, 2.0))),
                               [-1.0, 0.0, 2.0])


def test_limit_magnitude():
    x = np.array([3.0, 0.1, 0.0])
    y = np.array([4.0, 0.0, 0.0])
    r = np.array([1.0, 5.0, 1.0])
    gx, gy = limit_magnitude(x, y, r)
    np.testing.assert_allclose(np.hypot(gx, gy), [1.0, 0.1, 0.0], atol=1e-12)
    # direction preserved
    np.testing.assert_allclose(np.asarray(gx)[0] / np.asarray(gy)[0],
                               3.0 / 4.0, atol=1e-12)


def test_sumo_angle_conversion_roundtrip():
    sfm = np.linspace(-np.pi + 1e-6, np.pi - 1e-6, 17)
    sumo = np.asarray(angle_sfm_to_sumo(sfm))
    back = np.asarray(angle_sumo_to_sfm(sumo))
    np.testing.assert_allclose(back, sfm, atol=1e-9)
    # SFM 0 rad (east) == SUMO 90 deg
    assert np.isclose(np.asarray(angle_sfm_to_sumo(0.0)), 90.0)


@pytest.mark.parametrize("n", [1, 2, 5])
def test_population_params_broadcast(n):
    from cyclistsocialforce_tpu.params import BicycleParams, as_population

    p = BicycleParams.create()
    pop = as_population(p, n)
    assert pop.v_desired_default.shape == (n,)
    assert pop.a_max.shape == (n, 2)
