"""Utility structures: difference equations, complex angles, FIFO."""

import numpy as np
import jax.numpy as jnp

from cyclistsocialforce_tpu.utils import structures as S


def test_diffeq_matches_scipy_lfilter():
    from scipy.signal import lfilter

    a = np.array([1.0, -1.5, 0.7])
    b = np.array([0.1, 0.2, 0.05])
    u = np.sin(np.linspace(0, 6, 40))
    st = S.diffeq_init(a, b)
    ys = []
    for uk in u:
        st, yk = S.diffeq_step(st, uk)
        ys.append(float(yk))
    np.testing.assert_allclose(ys, lfilter(b, a, u), atol=1e-12)


def test_diffeq_saturation():
    st = S.diffeq_init([1.0, 0.0], [10.0])
    st, y = S.diffeq_step(st, 1.0, th=2.0)
    assert float(y) == 2.0


def test_complex_angles():
    z1 = S.angle_from_euler(0.3)
    z2 = S.angle_from_euler(170.0, deg=True)
    np.testing.assert_allclose(float(S.angle_to_euler(z1)), 0.3)
    comp = S.angle_add(z2, z2)   # 340 deg -> -20 deg wrapped
    np.testing.assert_allclose(float(S.angle_to_euler(comp, deg=True)),
                               -20.0, atol=1e-9)
    d = S.angle_difference_complex(S.angle_from_euler(3.0),
                                   S.angle_from_euler(-3.0))
    np.testing.assert_allclose(float(d), 2 * np.pi - 6.0, atol=1e-12)


def test_fifo_ring():
    st = S.fifo_init([1.0, 2.0, 3.0])
    st, out = S.fifo_next(st, 4.0)
    assert float(out) == 1.0
    st, out = S.fifo_next(st, 5.0)
    assert float(out) == 2.0
    st, out = S.fifo_next(st, 6.0)
    assert float(out) == 3.0
    st, out = S.fifo_next(st, 7.0)
    assert float(out) == 4.0


def test_validate_boolean_indicators():
    """Reference utils.py:230-292 semantics: bool mask passthrough, int
    index conversion, ValueError on mismatch."""
    import numpy as np
    import pytest

    from cyclistsocialforce_tpu.utils.structures import (
        validate_boolean_indicators)

    m = validate_boolean_indicators([True, False, True], "sel", "X", 3)
    assert m.tolist() == [True, False, True]
    m = validate_boolean_indicators([0, 2], "sel", "X", 3)
    assert m.tolist() == [True, False, True]
    with pytest.raises(ValueError):
        validate_boolean_indicators([True, False], "sel", "X", 3)
    with pytest.raises(ValueError):
        validate_boolean_indicators([0, 5], "sel", "X", 3)
    with pytest.raises(ValueError):
        validate_boolean_indicators([0.5, 1.0], "sel", "X", 3)
