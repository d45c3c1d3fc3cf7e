"""Small numerical structures: difference equations, complex angles,
FIFO ring buffers.

Jit-compatible equivalents of the reference's utility classes
(reference utils.py:292-614). Where the reference mutates Python objects,
these are pure functions over explicit state tuples -- the same pattern as
the framework's PID (`ops.control.pid_step`).
"""

from __future__ import annotations

import jax.numpy as jnp

from cyclistsocialforce_tpu.utils.angles import limit_angle, thresh


# --------------------------------------------------------------------------
# difference equation y(k) = (1/a0)(b.u_hist - a[1:].y_hist)
# (reference DiffEquation, utils.py:292-441)
# --------------------------------------------------------------------------


def diffeq_init(a, b, y0=None, u0=None):
    """State for `diffeq_step`: (a, b, y_hist [m], u_hist [n])."""
    a = jnp.asarray(a, dtype=float)
    b = jnp.asarray(b, dtype=float)
    m = a.shape[0] - 1
    n = b.shape[0]
    y = jnp.zeros(m) if y0 is None else jnp.asarray(y0, dtype=float)
    u = jnp.zeros(n)
    if u0 is not None:
        u = u.at[1:].set(jnp.asarray(u0, dtype=float)[:n - 1])
    return a, b, y, u


def diffeq_step(state, u_k, th=None):
    """One step of the LTI difference equation; returns (state, y_k).

    y(k) = (1/a0) (b0 u(k) + ... + bn u(k-n) - a1 y(k-1) - ... - am y(k-m))
    with optional symmetric output saturation `th` (reference
    utils.py:292-340).
    """
    a, b, y_hist, u_hist = state
    u_hist = jnp.concatenate([jnp.asarray(u_k)[None], u_hist[:-1]])
    y_k = (jnp.dot(b, u_hist) - jnp.dot(a[1:], y_hist)) / a[0]
    if th is not None:
        y_k = thresh(y_k, (-th, th))
    y_hist = jnp.concatenate([y_k[None], y_hist[:-1]])
    return (a, b, y_hist, u_hist), y_k


# --------------------------------------------------------------------------
# complex-number angle representation (reference Angle, utils.py:443-578)
# --------------------------------------------------------------------------


def angle_from_euler(theta, deg=False):
    """Angle as a complex unit vector cos + j sin (vectorized)."""
    theta = jnp.asarray(theta, dtype=float)
    if deg:
        theta = jnp.radians(theta)
    return jnp.exp(1j * theta)


def angle_to_euler(z, deg=False):
    """Complex unit vector -> angle in (-pi, pi] (vectorized)."""
    theta = limit_angle(jnp.angle(z))
    return jnp.degrees(theta) if deg else theta


def angle_add(z1, z2):
    """Compose rotations: multiplication of the unit vectors."""
    return z1 * z2


def angle_difference_complex(z1, z2):
    """Signed difference angle(z2) - angle(z1) via conj multiplication."""
    return jnp.angle(jnp.conj(z1) * z2)


# --------------------------------------------------------------------------
# fixed-length FIFO ring buffer (reference FIFOBuffer, utils.py:580-614)
# --------------------------------------------------------------------------


def fifo_init(initial_values):
    """State for `fifo_next`: (buffer [L, ...], head index)."""
    return jnp.asarray(initial_values), jnp.asarray(0, dtype=jnp.int32)


def fifo_next(state, value_in):
    """Push `value_in`, return ((buffer, head), oldest value) -- O(1)
    ring-buffer form of the reference's deque (`pos_hist` in AgentState
    uses the same pattern at population scale)."""
    buf, head = state
    value_out = buf[head]
    buf = buf.at[head].set(value_in)
    head = (head + 1) % buf.shape[0]
    return (buf, head), value_out


def validate_boolean_indicators(features, indicator_name, data_name,
                                n_features):
    """Validate a feature-selector input: either a bool mask of length
    `n_features` or an array of int indices within [0, n_features)
    (reference utils.validate_boolean_indicators, utils.py:230-292).
    Returns the selector normalized to a bool mask; raises ValueError
    with a message naming `indicator_name` / `data_name` otherwise."""
    import numpy as np

    arr = np.asarray(features)
    if arr.dtype == bool:
        if arr.ndim == 1 and arr.size == n_features:
            return arr
        raise ValueError(
            f"Boolean indicator '{indicator_name}' must have the same "
            f"number of elements as {data_name} has features "
            f"({n_features}); got {arr.size}.")
    if np.issubdtype(arr.dtype, np.integer):
        if arr.ndim == 1 and arr.size and np.all(
                (arr >= 0) & (arr < n_features)):
            mask = np.zeros(n_features, dtype=bool)
            mask[arr] = True
            return mask
        raise ValueError(
            f"Integer indicator '{indicator_name}' for {data_name} must "
            f"hold indices in [0, {n_features}); got {arr!r}.")
    raise ValueError(
        f"Indicator '{indicator_name}' must be bool (length "
        f"{n_features}) or int indices in [0, {n_features}); got dtype "
        f"{arr.dtype}.")
