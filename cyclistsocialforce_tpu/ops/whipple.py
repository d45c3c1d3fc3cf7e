"""Linearized Whipple-Carvallo bicycle model (Meijaard et al. 2007).

Computes the canonical benchmark matrices M, C1, K0, K2 and the state-space
form from the 27 physical parameters, replacing the reference's dependency
on the external `bicycleparameters` package (reference parameters.py:20-22,
1284-1301, dynamics.py:261-599). Built from the published equations of

    Meijaard, Papadopoulos, Ruina & Schwab (2007), "Linearized dynamics
    equations for the balance and steer of a bicycle: a benchmark and
    review", Proc. R. Soc. A 463:1955-1982 (Appendix A),

and validated against the paper's benchmark matrix values (Table 2) in
tests/test_whipple.py.

Equations of motion:  M qdd + v C1 qd + (g K0 + v^2 K2) q = f,
with q = [phi (roll), delta (steer)] and f = [T_phi, T_delta].

Works with numpy or jax.numpy inputs (pure arithmetic).
"""

from __future__ import annotations

import numpy as np

# The Meijaard-2007 parameter set shipped with the reference
# (reference data/bicycleparams/balanceassist_bikeparams.py:11-40, derived
# from Moore's BicycleParameters "Balanceassistv1" + average rider, BSD-2).
BALANCEASSIST_WITH_RIDER = dict(
    IBxx=16.136560964517308, IBxz=-2.5375819134691833, IByy=18.98228436804581,
    IBzz=4.308368614306412, IFxx=0.0995, IFyy=0.1902, IHxx=0.2984,
    IHxz=-0.038, IHyy=0.257, IHzz=0.0566, IRxx=0.1023, IRyy=0.1887,
    c=0.042, g=9.81, lam=0.255, mB=91.50000000000003, mF=2.235, mH=4.3,
    mR=4.085, rF=0.35231, rR=0.34895, v=1.0, w=1.113,
    xB=0.373106714751133, xH=0.921, yB=0.0, zB=-0.9697039390081493,
    zH=-0.86,
)

# Benchmark bicycle of Meijaard et al. (2007) Table 1 -- used as the
# independent test anchor (its canonical matrices are published).
MEIJAARD_BENCHMARK = dict(
    w=1.02, c=0.08, lam=np.pi / 10, g=9.81, v=1.0,
    rR=0.3, mR=2.0, IRxx=0.0603, IRyy=0.12,
    xB=0.3, zB=-0.9, mB=85.0, IBxx=9.2, IBxz=2.4, IByy=11.0, IBzz=2.8,
    xH=0.9, zH=-0.7, mH=4.0, IHxx=0.05892, IHxz=-0.00756, IHyy=0.06,
    IHzz=0.00708,
    rF=0.35, mF=3.0, IFxx=0.1405, IFyy=0.28,
)


def canonical_matrices(p: dict):
    """Physical parameters -> (M, C1, K0, K2), Meijaard 2007 Appendix A."""
    w, c, lam, g = p["w"], p["c"], p["lam"], p["g"]
    rR, mR, IRxx, IRyy = p["rR"], p["mR"], p["IRxx"], p["IRyy"]
    xB, zB, mB = p["xB"], p["zB"], p["mB"]
    IBxx, IBxz, IBzz = p["IBxx"], p["IBxz"], p["IBzz"]
    xH, zH, mH = p["xH"], p["zH"], p["mH"]
    IHxx, IHxz, IHzz = p["IHxx"], p["IHxz"], p["IHzz"]
    rF, mF, IFxx, IFyy = p["rF"], p["mF"], p["IFxx"], p["IFyy"]

    cl, sl = np.cos(lam), np.sin(lam)

    # total system
    mT = mR + mB + mH + mF
    xT = (xB * mB + xH * mH + w * mF) / mT
    zT = (-rR * mR + zB * mB + zH * mH - rF * mF) / mT
    ITxx = (IRxx + IBxx + IHxx + IFxx + mR * rR**2 + mB * zB**2
            + mH * zH**2 + mF * rF**2)
    ITxz = (IBxz + IHxz - mB * xB * zB - mH * xH * zH + mF * w * rF)
    IRzz, IFzz = IRxx, IFxx
    ITzz = (IRzz + IBzz + IHzz + IFzz + mB * xB**2 + mH * xH**2 + mF * w**2)

    # front assembly (handlebar + fork + front wheel)
    mA = mH + mF
    xA = (xH * mH + w * mF) / mA
    zA = (zH * mH - rF * mF) / mA
    IAxx = IHxx + IFxx + mH * (zH - zA)**2 + mF * (rF + zA)**2
    IAxz = (IHxz - mH * (xH - xA) * (zH - zA) + mF * (w - xA) * (rF + zA))
    IAzz = IHzz + IFzz + mH * (xH - xA)**2 + mF * (w - xA)**2

    # steer-axis quantities
    uA = (xA - w - c) * cl - zA * sl
    IAll = mA * uA**2 + IAxx * sl**2 + 2 * IAxz * sl * cl + IAzz * cl**2
    IAlx = -mA * uA * zA + IAxx * sl + IAxz * cl
    IAlz = mA * uA * xA + IAxz * sl + IAzz * cl

    mu = c / w * cl

    SR = IRyy / rR
    SF = IFyy / rF
    ST = SR + SF
    SA = mA * uA + mu * mT * xT

    M = np.array([
        [ITxx, IAlx + mu * ITxz],
        [IAlx + mu * ITxz, IAll + 2 * mu * IAlz + mu**2 * ITzz],
    ])
    K0 = np.array([
        [mT * zT, -SA],
        [-SA, -SA * sl],
    ])
    K2 = np.array([
        [0.0, (ST - mT * zT) / w * cl],
        [0.0, (SA + SF * sl) / w * cl],
    ])
    C1 = np.array([
        [0.0, mu * ST + SF * cl + ITxz / w * cl - mu * mT * zT],
        [-(mu * ST + SF * cl), IAlz / w * cl + mu * (SA + ITzz / w * cl)],
    ])
    return M, C1, K0, K2


def state_space_4(p: dict, v):
    """4-state Whipple model x = [phi, delta, phidot, deltadot],
    u = [T_phi, T_delta]. Matches
    `bicycleparameters.models.Meijaard2007Model.form_state_space_matrices`
    as consumed by the reference (dynamics.py:522, parameters.py:1325-1341).
    """
    import jax.numpy as jnp

    M, C1, K0, K2 = canonical_matrices(p)
    g = p["g"]
    Minv = np.linalg.inv(M)
    A = jnp.zeros((4, 4))
    A = A.at[0:2, 2:4].set(jnp.eye(2))
    A = A.at[2:4, 0:2].set(-Minv @ (g * K0 + v**2 * K2))
    A = A.at[2:4, 2:4].set(-Minv @ C1 * v)
    B = jnp.zeros((4, 2))
    B = B.at[2:4, :].set(Minv)
    return A, B


def state_space_5(p: dict, v):
    """5-state model with yaw: x = [phi, delta, phidot, deltadot, psi].

    Adds the kinematic yaw row psi_dot = (v cos(lam)/w) delta
    + (c cos(lam)/w) delta_dot used by the reference
    (dynamics.py:296-302, 511-538). Input reduced to the steer torque
    column only (dynamics.py:470, 612-613).
    """
    import jax.numpy as jnp

    A4, B4 = state_space_4(p, v)
    cl = np.cos(p["lam"])
    w, c = p["w"], p["c"]
    A = jnp.zeros((5, 5))
    A = A.at[:4, :4].set(A4)
    A = A.at[4, 1].set(cl / w * v)
    A = A.at[4, 3].set(cl * c / w)
    B = jnp.zeros((5, 1))
    B = B.at[:4, 0].set(B4[:, 1])
    C = jnp.zeros((1, 5)).at[0, 4].set(1.0)
    return A, B, C
