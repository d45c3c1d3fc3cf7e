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


def test_agent_streams_invariance_contract():
    """state.agent_streams is the primitive behind every stochastic
    draw's layout invariance: per-agent keys are a pure function of
    (master key, t_glob, uid, salt) -- permutation-equivariant in uid,
    and distinct across steps, salts, and master keys."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cyclistsocialforce_tpu.state import agent_streams

    key = jax.random.PRNGKey(7)
    uid = jnp.arange(16, dtype=jnp.int32)
    t = jnp.asarray(3, jnp.int32)
    k0 = np.asarray(agent_streams(key, t, uid, 2))

    # permutation equivariance: keys follow the uid through any reorder
    perm = np.asarray([5, 0, 11, 3, 15, 8, 1, 2, 9, 4, 6, 7, 10, 12,
                       13, 14])
    kp = np.asarray(agent_streams(key, t, uid[perm], 2))
    np.testing.assert_array_equal(kp, k0[perm])

    # distinct across steps, salts, master keys, and agents
    k_t = np.asarray(agent_streams(key, t + 1, uid, 2))
    k_s = np.asarray(agent_streams(key, t, uid, 3))
    k_m = np.asarray(agent_streams(jax.random.PRNGKey(8), t, uid, 2))
    for other in (k_t, k_s, k_m):
        assert not np.any(np.all(other == k0, axis=1))
    assert len({tuple(r) for r in k0}) == 16
