"""Minimal scipy-based implementation of the `python-control` API surface
used by the reference cyclistsocialforce package.

This is NOT the python-control library: it is an independent shim, written
against the documented public API, just rich enough to let the reference at
/root/reference execute here and produce golden trajectories for parity
testing. Covered calls (see SURVEY.md section 2.2):

  - ct.ss / ct.StateSpace          (dynamics.py:1165,1212; vehicle.py:1774)
  - ct.place                        (dynamics.py:1209)
  - ct.ctrb                         (dynamics.py:1152,1206)
  - ct.forced_response              (dynamics.py:235,1220; vehicle.py:1835)

`forced_response` reproduces python-control's continuous-time semantics:
exact matrix-exponential propagation per sample with first-order-hold
(linearly interpolated) inputs, via the standard augmented-matrix trick.
"""

import numpy as np
from scipy.linalg import expm
from scipy.signal import place_poles


class StateSpace:
    def __init__(self, A, B, C, D):
        self.A = np.atleast_2d(np.asarray(A, dtype=float))
        self.B = np.asarray(B, dtype=float)
        if self.B.ndim == 1:
            self.B = self.B[:, None]
        self.C = np.atleast_2d(np.asarray(C, dtype=float))
        self.D = np.atleast_2d(np.asarray(D, dtype=float))

    def poles(self):
        return np.linalg.eigvals(self.A)


def ss(A, B, C, D):
    return StateSpace(A, B, C, D)


def ctrb(A, B):
    A = np.atleast_2d(np.asarray(A, dtype=float))
    B = np.asarray(B, dtype=float)
    if B.ndim == 1:
        B = B[:, None]
    n = A.shape[0]
    cols = [B]
    for _ in range(n - 1):
        cols.append(A @ cols[-1])
    return np.hstack(cols)


def place(A, B, poles):
    A = np.atleast_2d(np.asarray(A, dtype=float))
    B = np.asarray(B, dtype=float)
    if B.ndim == 1:
        B = B[:, None]
    res = place_poles(A, B, np.asarray(poles))
    return res.gain_matrix


class TimeResponseData:
    """Unpacks as (time, outputs, states) and exposes .time/.outputs/.states
    like python-control's return object."""

    def __init__(self, time, outputs, states):
        self.time = time
        self.outputs = outputs
        self.states = states

    def __iter__(self):
        return iter((self.time, self.outputs, self.states))


def forced_response(sys, T=None, U=0.0, X0=0.0, return_x=False,
                    squeeze=None):
    A, B, C, D = sys.A, sys.B, sys.C, sys.D
    n = A.shape[0]
    m = B.shape[1]
    T = np.asarray(T, dtype=float)
    nT = T.shape[0]

    U = np.asarray(U, dtype=float)
    if U.ndim == 0:
        U = np.full((m, nT), float(U))
    elif U.ndim == 1:
        U = U[None, :]
    assert U.shape == (m, nT), f"U shape {U.shape} != {(m, nT)}"

    X0 = np.asarray(X0, dtype=float).reshape(-1)
    if X0.shape[0] == 1 and n > 1:
        X0 = np.full((n,), X0[0])
    x = np.zeros((n, nT))
    x[:, 0] = X0

    dt = T[1] - T[0]
    # first-order hold: z = [x; u; du], du = (u_next - u)/dt constant
    M = np.zeros((n + 2 * m, n + 2 * m))
    M[:n, :n] = A * dt
    M[:n, n:n + m] = B * dt
    M[n:n + m, n + m:] = np.eye(m) * dt
    eM = expm(M)
    Ad = eM[:n, :n]
    P = eM[:n, n:n + m]
    Q = eM[:n, n + m:]

    for k in range(nT - 1):
        du = (U[:, k + 1] - U[:, k]) / dt
        x[:, k + 1] = Ad @ x[:, k] + P @ U[:, k] + Q @ du

    y = C @ x + D @ U
    return TimeResponseData(T, y, x)


# --- transfer-function API: only referenced by dead code paths
# (parameters.py update_dynamic_params); minimal stubs so imports resolve.


def tf(*a, **k):
    raise NotImplementedError("tf shim: only needed by dead reference code")


def sample_system(*a, **k):
    raise NotImplementedError("sample_system shim: dead reference code")


def series(*a, **k):
    raise NotImplementedError("series shim: dead reference code")
