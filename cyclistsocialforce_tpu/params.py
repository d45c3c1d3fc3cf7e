"""Parameter pytrees for the TPU-native cyclist social-force framework.

Re-design of the reference's validated property-bag hierarchy
(reference: src/cyclistsocialforce/parameters.py:421-1970) as frozen
`flax.struct` dataclasses whose numeric fields are pytree leaves. Every
numeric field may be a scalar or an ``[N]`` array, so a single params object
describes a whole (possibly heterogeneous) agent population and traces
cleanly through jit/vmap/shard_map.

Validation semantics match the reference, including ``calib_mode``
(clamp-and-warn instead of raise, parameters.py:621-631). Validation runs
once at construction time (`create`) on concrete host values and never
inside traced code.
"""

from __future__ import annotations

import warnings
from typing import Any

import numpy as np
import jax.numpy as jnp
from flax import struct

LIMIT_PREC = 1e-4  # reference parameters.py:428

_TWO_PI = 2.0 * np.pi


def _err(calib_mode: bool, verbose: bool, msg: str):
    if calib_mode:
        if verbose:
            warnings.warn(msg)
        return True
    raise ValueError(msg)


def _chk_nonneg(name, val, calib_mode=False, verbose=True, clamp_to=LIMIT_PREC):
    val = np.asarray(val, dtype=float)
    if np.any(val < 0):
        _err(calib_mode, verbose, f"{name} must be >=0, instead it was {val}")
        val = np.where(val < 0, clamp_to, val)
    return val


def _chk_range(name, val, lo, hi, calib_mode=False, verbose=True,
               clamp=(None, None), lo_open=False, hi_open=False):
    val = np.asarray(val, dtype=float)
    bad_lo = (val <= lo) if lo_open else (val < lo)
    bad_hi = (val >= hi) if hi_open else (val > hi)
    if np.any(bad_lo | bad_hi):
        _err(calib_mode, verbose,
             f"{name} must be in [{lo},{hi}], instead it was {val}")
        c_lo = lo if clamp[0] is None else clamp[0]
        c_hi = hi if clamp[1] is None else clamp[1]
        val = np.clip(val, c_lo, c_hi)
    return val


def _repair_lut_rows(tab):
    """Repair non-finite rows of a speed-grid lookup table in place.

    The plant is uncontrollable at v = 0 exactly (the yaw row of A scales
    with v), so a grid point landing on it yields a non-finite row -- as
    does the reference's ct.place. Such isolated rows are repaired by
    interpolating between the nearest finite neighbors (they sit in
    walking-branch speed territory, never consumed by the riding path)."""
    flat = tab.reshape(tab.shape[0], -1)
    bad = ~np.isfinite(flat).all(axis=1)
    if bad.any():
        good = np.where(~bad)[0]
        for j in np.where(bad)[0]:
            lo = good[good < j]
            hi = good[good > j]
            if len(lo) and len(hi):
                a, b = lo[-1], hi[0]
                t = (j - a) / (b - a)
                tab[j] = (1 - t) * tab[a] + t * tab[b]
            else:
                tab[j] = tab[lo[-1] if len(lo) else hi[0]]
    return tab


def _pair(name, val):
    """Validate a (negative, positive) limit pair, e.g. a_max, v_max_riding."""
    val = np.asarray(val, dtype=float)
    if val.shape[-1] != 2:
        raise TypeError(f"{name} must be a (min, max) pair.")
    if np.any(val[..., 0] >= 0) or np.any(val[..., 1] <= 0):
        raise ValueError(
            f"{name}[0] must be <0 and {name}[1] must be >0, "
            f"instead it was {val}")
    return val


class VehicleParams(struct.PyTreeNode):
    """Tactical + repulsive-force-field parameters of a generic vehicle.

    Defaults equal reference parameters.py:430-451.
    """

    t_s: Any = 0.01
    d_arrived_inter: Any = 2.0
    d_arrived_stop: Any = 2.0
    v_max_stop: Any = 0.1
    v_max_harddecel: Any = 2.5
    hfov: Any = _TWO_PI
    # Repulsive force-field parameters (BMD2023 "2D model" field shape).
    f_0: Any = 7.0
    e_0: Any = 0.995
    e_1: Any = 0.7
    sigma_0: Any = 0.5
    sigma_1: Any = 5.0
    sigma_2: Any = 0.3
    sigma_3: Any = 4.9
    # Pluggable extra parameter dicts for external force models
    # (reference vehicle.py:111-125, external.py:141-181).
    rep_force: dict = struct.field(default_factory=dict)
    dest_force: dict = struct.field(default_factory=dict)

    @classmethod
    def create(cls, calib_mode: bool = False, verbose: bool = True, **kw):
        """Validated construction (mirrors reference property setters)."""
        base = {f: kw.pop(f, getattr(cls, f)) for f in
                ("t_s", "d_arrived_inter", "d_arrived_stop", "v_max_stop",
                 "v_max_harddecel", "hfov", "f_0", "e_0", "e_1",
                 "sigma_0", "sigma_1", "sigma_2", "sigma_3")}
        rep_force = kw.pop("rep_force", {})
        dest_force = kw.pop("dest_force", {})

        base["t_s"] = _chk_nonneg("t_s", base["t_s"])
        base["d_arrived_inter"] = _chk_nonneg("d_arrived_inter",
                                              base["d_arrived_inter"])
        base["d_arrived_stop"] = _chk_nonneg("d_arrived_stop",
                                             base["d_arrived_stop"])
        base["v_max_stop"] = _chk_nonneg("v_max_stop", base["v_max_stop"])
        base["v_max_harddecel"] = _chk_nonneg("v_max_harddecel",
                                              base["v_max_harddecel"])
        base["hfov"] = _chk_range("hfov", base["hfov"], 0.0, _TWO_PI,
                                  lo_open=True)
        cm, vb = calib_mode, verbose
        base["f_0"] = _chk_nonneg("f_0", base["f_0"], cm, vb)
        # e_1 before e_0 (reference initialises _e_1 = 0 first,
        # parameters.py:501-504).
        e1 = np.asarray(base["e_1"], dtype=float)
        e0 = np.asarray(base["e_0"], dtype=float)
        if np.any((e0 <= e1) | (e0 > 1)):
            _err(cm, vb, f"e_0 must be in ]e_1={e1}, 1], instead {e0}")
            e0 = np.clip(e0, e1 * 1.001, 0.99999)
        if np.any((e1 < 0) | (e1 >= e0)):
            _err(cm, vb, f"e_1 must be in [0, e_0={e0}[, instead {e1}")
            e1 = np.clip(e1, 0.0, 0.99999 * e0)
        base["e_0"], base["e_1"] = e0, e1
        base["sigma_0"] = _chk_nonneg("sigma_0", base["sigma_0"], cm, vb)
        base["sigma_1"] = _chk_nonneg("sigma_1", base["sigma_1"], cm, vb)
        base["sigma_2"] = _chk_range(
            "sigma_2", base["sigma_2"], 0.0, base["sigma_0"], cm, vb,
            clamp=(0.0, base["sigma_0"] - LIMIT_PREC), lo_open=True,
            hi_open=True)
        # Reference quirk (parameters.py:722-733): in calib mode sigma_3 is
        # warned about but NOT clamped (the clamp assigns to a dead local).
        s3 = np.asarray(base["sigma_3"], dtype=float)
        if np.any((s3 <= 0) | (s3 >= base["sigma_1"])):
            _err(cm, vb,
                 f"sigma_3 must be in ]0, sigma_1={base['sigma_1']}[, "
                 f"instead it was {s3}")
        base["sigma_3"] = s3

        return cls(rep_force=rep_force, dest_force=dest_force, **base, **kw)


class CarParams(VehicleParams):
    """Reference parameters.py:753-763."""

    length: Any = 4.0
    width: Any = 2.0


class BicycleParams(VehicleParams):
    """Bicycle + rider parameters (reference parameters.py:766-935).

    Defaults per reference (v_max_riding [-1, 10], hfov 2*pi/3, ...).
    """

    hfov: Any = _TWO_PI * 2.0 / 6.0  # np.pi * 2 / 3
    v_max_stop: Any = 0.6
    v_max_riding: Any = (-1.0, 10.0)
    v_desired_default: Any = 5.0
    p_decay: Any = 5.0
    p_0: Any = 30.0
    l: Any = 1.0
    l_1: Any = 0.5
    l_2: Any = 0.5
    delta_max: Any = 1.4
    a_max: Any = (-10.0, 10.0)
    a_desired_default: Any = (-5.0, 5.0)
    k_p_v: Any = 10.0
    k_p_delta: Any = 10.0
    g: Any = 9.81

    @classmethod
    def create(cls, calib_mode: bool = False, verbose: bool = True, **kw):
        # Wheelbase constraint solver (reference parameters.py:891-921):
        # exactly one of l, l_1, l_2 may be omitted; l = l_1 + l_2 must hold.
        l = kw.pop("l", "unset")
        l_1 = kw.pop("l_1", "unset")
        l_2 = kw.pop("l_2", "unset")
        if l == "unset" and l_1 == "unset" and l_2 == "unset":
            l, l_1, l_2 = cls.l, cls.l_1, cls.l_2
        else:
            l = None if l == "unset" else l
            l_1 = None if l_1 == "unset" else l_1
            l_2 = None if l_2 == "unset" else l_2
            if l_1 is None and l_2 is None:
                assert l is not None, \
                    "If l_1 and l_2 are None, l may not be None!"
                l_1 = np.asarray(l) / 2
                l_2 = np.asarray(l) / 2
            elif l is None:
                l = np.asarray(l_1) + np.asarray(l_2)
            elif l_1 is None:
                l_1 = np.asarray(l) - np.asarray(l_2)
            elif l_2 is None:
                l_2 = np.asarray(l) - np.asarray(l_1)
            else:
                assert np.allclose(np.asarray(l),
                                   np.asarray(l_1) + np.asarray(l_2)), \
                    "Equality l = l_1 + l_2 must hold!"

        fields = {
            "v_max_riding": _pair("v_max_riding",
                                  kw.pop("v_max_riding", cls.v_max_riding)),
            "v_desired_default": _chk_nonneg(
                "v_desired_default",
                kw.pop("v_desired_default", cls.v_desired_default)),
            "p_decay": _chk_nonneg("p_decay", kw.pop("p_decay", cls.p_decay)),
            "p_0": _chk_nonneg("p_0", kw.pop("p_0", cls.p_0)),
            "l": _chk_nonneg("l", l),
            "l_1": _chk_nonneg("l_1", l_1),
            "l_2": _chk_nonneg("l_2", l_2),
            "delta_max": _chk_range(
                "delta_max", kw.pop("delta_max", cls.delta_max), 0.0, np.pi),
            "a_max": _pair("a_max", kw.pop("a_max", cls.a_max)),
            "a_desired_default": _pair(
                "a_desired_default",
                kw.pop("a_desired_default", cls.a_desired_default)),
            "k_p_v": _chk_nonneg("k_p_v", kw.pop("k_p_v", cls.k_p_v)),
            "k_p_delta": _chk_nonneg("k_p_delta",
                                     kw.pop("k_p_delta", cls.k_p_delta)),
            "g": kw.pop("g", cls.g),
        }
        kw.setdefault("hfov", cls.hfov)
        kw.setdefault("v_max_stop", cls.v_max_stop)
        return super().create(calib_mode=calib_mode, verbose=verbose,
                              **fields, **kw)


class PlanarPointBicycleParams(BicycleParams):
    """Mass-less point bicycle (reference parameters.py:1175-1201)."""

    poles: Any = (-2.0 + 0.0j,)
    gains: Any = (2.0,)


class PlanarBicycleParams(BicycleParams):
    """Planar two-wheeler (reference parameters.py:1203-1211)."""

    poles: Any = (-1.0141284591434665 + 1.226826644413086j,
                  -1.0141284591434665 - 1.226826644413086j)


class InvPendulumBicycleParams(BicycleParams):
    """Inverted-pendulum bicycle (reference parameters.py:1414-1970).

    Defaults equal reference parameters.py:1429-1471 including the combined
    parameter tau_1_squared = (I_bike + m h^2) / (m g h).
    """

    v_max_riding: Any = (-1.0, 7.0)
    a_max: Any = (-3.0, 1.0)
    a_desired_default: Any = (-1.0, 0.5)
    h: Any = 1.0
    m: Any = 87.0
    i_bike_longlong: Any = 3.28
    i_steer_vertvert: Any = 0.07
    c_steer: Any = 50.0
    k_d0_r2: Any = -600.0
    k_d1_r2: Any = 0.2
    k_p_r1: Any = 0.25
    k_i0_r1: Any = 0.2
    v_max_walk: Any = 1.5
    delta_max_walk: Any = 0.174
    tau_1_squared: Any = (3.28 + 87.0 * 1.0**2) / (87.0 * 9.81 * 1.0)
    # Optional precomputed ZOH propagator lookup table:
    # (table [G, 30], v_lo, dv) -- rows are the first five rows of
    # expm([[Acl(v) t_s, Bcl(v) t_s], [0, 0]]) (25 Phi entries + 5 Gamma
    # entries) sampled on a uniform speed grid at build time and linearly
    # interpolated per step, replacing the per-agent 6x6 expm in the
    # inverted-pendulum hot loop (models/invpendulum.py; mirrors
    # BalancingRiderParams.br_gains_lut). Exact path stays the default.
    ip_zoh_lut: Any = None
    # Optional GATHER-FREE piecewise-polynomial ZOH propagator
    # (create zoh_poly=S): the same 30 Phi/Gamma entries as ip_zoh_lut,
    # fitted per speed segment and baked into the compiled step as
    # literal constants (static field) -- zero HBM table, zero row
    # gathers (the two ip_zoh_lut gathers cost ~0.7 ms/row each at
    # N = 1e5; see ops/piecewise.py and BASELINE.md). The fit band
    # starts at IP_ZOH_POLY_V_LO (clear of the v -> 0 gain-schedule
    # divergence); below-band speeds clamp to the band edge, which only
    # the masked-out walking branch ever sees (riding-branch speeds are
    # >= v_max_walk - |a_lo| t_s ~ 1.47 m/s). Exact path stays default.
    ip_zoh_poly: Any = struct.field(pytree_node=False, default=None)
    POPULATION_SHARED = ("ip_zoh_lut",)
    IP_ZOH_POLY_V_LO = 1.0

    @classmethod
    def create(cls, calib_mode: bool = False, verbose: bool = True,
               zoh_lut: int = 0, zoh_poly: int = 0, **kw):
        h = _chk_nonneg("h", kw.pop("h", cls.h))
        m = _chk_nonneg("m", kw.pop("m", cls.m))
        ibl = _chk_nonneg("i_bike_longlong",
                          kw.pop("i_bike_longlong", cls.i_bike_longlong))
        isv = _chk_nonneg("i_steer_vertvert",
                          kw.pop("i_steer_vertvert", cls.i_steer_vertvert))
        c_steer = _chk_nonneg("c_steer", kw.pop("c_steer", cls.c_steer))
        k_d0_r2 = np.asarray(kw.pop("k_d0_r2", cls.k_d0_r2), dtype=float)
        if np.any(k_d0_r2 >= 0):
            raise ValueError("k_d0_r2 must be <0 to stabilize the "
                             "lean/steer angle loop.")
        k_d1_r2 = np.asarray(kw.pop("k_d1_r2", cls.k_d1_r2), dtype=float)
        k_p_r1 = _chk_nonneg("k_p_r1", kw.pop("k_p_r1", cls.k_p_r1))
        k_i0_r1 = _chk_nonneg("k_i0_r1", kw.pop("k_i0_r1", cls.k_i0_r1))
        v_max_walk = _chk_nonneg("v_max_walk",
                                 kw.pop("v_max_walk", cls.v_max_walk))
        delta_max_walk = _chk_range(
            "delta_max_walk", kw.pop("delta_max_walk", cls.delta_max_walk),
            0.0, np.pi, lo_open=True)
        g = kw.get("g", cls.g)
        kw.setdefault("v_max_riding", cls.v_max_riding)
        kw.setdefault("a_max", cls.a_max)
        kw.setdefault("a_desired_default", cls.a_desired_default)
        tau_1_squared = (ibl + m * h**2) / (m * np.asarray(g) * h)
        p = super().create(
            calib_mode=calib_mode, verbose=verbose, h=h, m=m,
            i_bike_longlong=ibl, i_steer_vertvert=isv, c_steer=c_steer,
            k_d0_r2=k_d0_r2, k_d1_r2=k_d1_r2, k_p_r1=k_p_r1, k_i0_r1=k_i0_r1,
            v_max_walk=v_max_walk, delta_max_walk=delta_max_walk,
            tau_1_squared=tau_1_squared, **kw)
        if zoh_lut:
            p = p.replace(ip_zoh_lut=cls._build_zoh_lut(p, int(zoh_lut)))
        if zoh_poly:
            p = p.replace(ip_zoh_poly=cls._build_zoh_poly(p, int(zoh_poly)))
        return p

    @staticmethod
    def _build_zoh_lut(p, g: int):
        """Sample the closed-loop ZOH propagator on a uniform speed grid.

        The discretized riding dynamics (models/invpendulum._step_yaw_one,
        reference vehicle.py:1810-1848) are a pure, smooth function of the
        speed alone: Phi(v), Gamma(v) = rows [:5] of
        expm([[A(v) - B K_x(v), K_u(v) B] t_s, [0, 0]]). A one-time
        construction sweep (host CPU backend -- tracing through the remote
        TPU tunnel costs minutes for nothing) replaces the per-agent 6x6
        expm per step; linear interpolation error is pinned by
        tests/test_gains_lut.py::test_invpendulum_zoh_lut_error_bound.

        Rows near the v = 0 controllability singularity (the gain
        polynomial diverges as 1/v^3) can be non-finite; those speeds are
        walking-branch territory (the riding dynamics are never consumed
        below ~v_max_walk), so such rows are repaired by nearest-finite
        interpolation exactly like the BalancingRider gains LUT.
        """
        v_lo = float(pair_lo(p.v_max_riding))
        v_hi = float(pair_hi(p.v_max_riding))
        vs = np.linspace(v_lo, v_hi, g)
        tab = InvPendulumBicycleParams._zoh_sweep(p)(vs)
        bad = ~np.isfinite(tab).all(axis=1)
        if bad.any():
            good = np.where(~bad)[0]
            for j in np.where(bad)[0]:
                lo = good[good < j]
                hi = good[good > j]
                if len(lo) and len(hi):
                    a, b = lo[-1], hi[0]
                    t = (j - a) / (b - a)
                    tab[j] = (1 - t) * tab[a] + t * tab[b]
                else:
                    tab[j] = tab[lo[-1] if len(lo) else hi[0]]
        return (tab, np.float64(v_lo),
                np.float64((v_hi - v_lo) / (g - 1)))

    @staticmethod
    def _zoh_sweep(p):
        """Return ``vs [K] -> rows [K, 30]`` sampling the closed-loop ZOH
        propagator (25 Phi + 5 Gamma entries; see _build_zoh_lut) on the
        host CPU backend."""
        import jax
        import jax.numpy as jnp

        from cyclistsocialforce_tpu.models import invpendulum as IP
        from cyclistsocialforce_tpu.ops.smallmat import expm_small

        t_s = float(np.asarray(p.t_s))
        pb = {f: jnp.asarray(float(np.asarray(getattr(p, f))))
              for f in ("l", "l_2", "g", "tau_1_squared", "c_steer",
                        "i_steer_vertvert")}

        def e_at(v):
            K_x, K_u = p.fullstate_feedback_gains(v)
            A, B = IP.openloop_matrices(pb, v)
            Acl = A - B[:, None] * K_x[None, :]
            aug = jnp.zeros((6, 6), dtype=A.dtype)
            aug = (aug.at[:5, :5].set(Acl * t_s)
                   .at[:5, 5].set(K_u * B * t_s))
            E = expm_small(aug)
            return jnp.concatenate(
                [E[:5, :5].reshape(25), E[:5, 5]])

        def sweep(vs):
            with jax.default_device(jax.devices("cpu")[0]):
                return np.array(jax.vmap(e_at)(jnp.asarray(vs)))

        return sweep

    @staticmethod
    def _build_zoh_poly(p, n_seg: int):
        """Piecewise-quintic fit of the ZOH propagator entries over the
        riding speed band [IP_ZOH_POLY_V_LO, v_hi] (ops/piecewise.py; the
        gather-free counterpart of _build_zoh_lut -- the fit band excludes
        the v -> 0 gain divergence instead of repairing rows, and
        below-band speeds clamp to the edge, which only the masked
        walking branch ever consumes)."""
        from cyclistsocialforce_tpu.ops.piecewise import fit_piecewise_poly

        v_lo = float(InvPendulumBicycleParams.IP_ZOH_POLY_V_LO)
        v_hi = float(pair_hi(p.v_max_riding))
        if v_hi <= v_lo:
            raise ValueError(
                f"zoh_poly needs v_max_riding > {v_lo} m/s (the fit band "
                f"must clear the v -> 0 gain-schedule divergence)")
        return fit_piecewise_poly(
            InvPendulumBicycleParams._zoh_sweep(p), v_lo, v_hi, int(n_seg))

    # ---- speed-scheduled model/controller parameters ----

    def timevarying_combined_params(self, v):
        """Speed-dependent combined lean-dynamics parameters (K, K*tau_2,
        tau_3). Reference parameters.py:1832-1855."""
        K_tau_2 = (v * self.l_2) / (self.g * self.l)
        K = (v * v) / (self.g * self.l)
        tau_3 = self.l / v
        return K, K_tau_2, tau_3

    # Fitted polynomial-in-1/v full-state feedback gain schedule
    # (reference parameters.py:1857-1892).
    _KX_POLY = np.array([
        [3.48203226e02, -5.12057324e03, 1.58364873e04, -1.98073306e04],
        [-4.51700000e01, 0.00000000e00, 0.00000000e00, 0.00000000e00],
        [-9.16379250e02, 1.31769807e04, -6.57341643e04, 8.22163589e04],
        [3.20214069e02, -4.69953797e03, 1.66378680e04, -2.43114309e04],
        [2.87549256e-08, -2.27913445e03, 0.00000000e00, 0.00000000e00],
    ])
    _KU_POLY = np.array(
        [-3.38638984e-09, -2.27913445e03, 0.00000000e00, 0.00000000e00])

    def fullstate_feedback_gains(self, v):
        """Speed-scheduled full-state feedback gains K_x [.., 5], K_u [..].

        Polynomial in 1/v, reference parameters.py:1857-1892. Broadcasts over
        leading axes of v.
        """
        v = jnp.asarray(v)
        vdata = jnp.stack(
            [jnp.ones_like(v), v**-1.0, v**-2.0, v**-3.0], axis=-1)
        K_x = vdata @ jnp.asarray(self._KX_POLY, dtype=vdata.dtype).T
        K_u = vdata @ jnp.asarray(self._KU_POLY, dtype=vdata.dtype)
        return K_x, K_u

    def min_stable_speed_inner(self):
        """Minimum speed for inner-loop stability
        (reference parameters.py:1955-1970)."""
        x = self.k_d0_r2
        y = self.c_steer * self.g * (self.l_1 + self.l_2)
        z = y * self.k_d1_r2
        return (-y - jnp.sqrt(y**2 - 4 * x * z)) / (2 * x)


class BalancingRiderParams(BicycleParams):
    """Whipple-Carvallo balancing-rider bicycle parameters
    (reference parameters.py:1214-1412).

    The reference wraps the external `bicycleparameters` package and a
    sklearn GMM pole model and re-runs pole placement per step; here the
    physical model is reduced at construction time to the speed-structured
    state-space decomposition

        A(v) = br_A0 + v * br_A1 + v^2 * br_A2       (5-state, incl. yaw)

    and the rider behavior to linear-in-speed pole-feature functions
    `br_pole_lin` (the reference's component mean functions,
    controlbehavior.py:1601-1650) -- everything the per-step TPU kernel
    needs is a handful of small arrays.
    """

    v_desired_default: Any = 5.0
    m: Any = None          # total system mass (bike + rider + wheels)
    # state-space structure (built by `create`)
    br_A0: Any = None     # [5, 5]
    br_A1: Any = None     # [5, 5]
    br_A2: Any = None     # [5, 5]
    br_B: Any = None      # [5] steer-torque input column
    br_B_roll: Any = None  # [5] roll-torque input column (disturbances)
    # rider control behavior: pole features linear in speed [5, 2]
    # ([:, 0] intercept, [:, 1] slope), or fixed gains [5]
    br_pole_lin: Any = None
    br_gains_fixed: Any = None
    # Optional precomputed gains lookup table (deterministic mode only):
    # (table [G, 5], v_lo, dv) -- K(v) sampled on a uniform speed grid at
    # build time, linearly interpolated per step instead of running the
    # Ackermann placement per agent (see models/balancingrider.py).
    br_gains_lut: Any = None
    # Stochastic-mode equivalent: the Ackermann gain is LINEAR in the
    # characteristic-polynomial coefficients, K(v, c) = sum_k c_k M_k(v)
    # with the basis M_k(v) = (A(v)^T)^(n-k) y(v), y = ctrb(A,B)^-T e_n
    # (ops.control.ackermann's Horner recursion unrolled) -- so per-agent
    # pole FEATURES stay exact and only the speed axis is tabulated:
    # (table [G, 6, 5], v_lo, dv).
    br_ackermann_lut: Any = None
    # Optional piecewise-polynomial gain schedule (deterministic mode
    # only): STATIC (pytree_node=False) nested tuple
    # (coeffs[S][30], v_lo, seg_dv) with per-segment quintic
    # coefficients for the 5 gains (j = 6 * k + d: degree-d coefficient
    # of gain k, increasing powers of the local coordinate u in [0, 1]).
    # Because the field is static, the coefficients reach the compiled
    # step as LITERAL CONSTANTS -- the per-step gain evaluation is a
    # masked FMA + Horner chain with NO table in HBM and NO gathers
    # (the two gains_lut row gathers cost ~0.9 ms/step at N = 1e5,
    # BASELINE.md "Gather-free piecewise-polynomial gains"). The fit
    # band starts at GAINS_POLY_V_LO (2.0 m/s): K(v) has poles at
    # v = 0 and v ~ 1.25 (controllability losses), so speeds below the
    # band are clamped to the band edge -- document/test accordingly.
    br_gains_poly: Any = struct.field(pytree_node=False, default=None)
    # Stochastic-mode piecewise-polynomial counterpart (create
    # gains_poly=S with stochastic_control_behavior): the Ackermann
    # coefficient BASIS M(v) [6, 5] fitted per speed segment instead of
    # tabulated (br_ackermann_lut) -- per-agent pole features stay
    # exact (K = charpoly(feats) @ M(v)) and the two per-step [G, 30]
    # row gathers disappear (TPU gathers cost per ROW; BASELINE.md).
    # STATIC nested tuple (coeffs[S][180], v_lo, seg_dv), layout
    # j = 6 * m + d with m = 5 * c + k the row-major [6, 5] entry index.
    br_ackermann_poly: Any = struct.field(pytree_node=False, default=None)
    # lower edge of the gains_poly fit band (class constant, not a
    # field): below it K(v) is non-smooth (poles at v = 0 and ~1.25)
    GAINS_POLY_V_LO = 2.0
    # Optional precomputed midpoint-PROPAGATOR lookup table (deterministic
    # mode only): (table [G, 40], v_lo, dv). In deterministic mode the
    # whole closed-loop implicit-midpoint update is a pure smooth function
    # of the midpoint speed: with Acl(v) = A(v) - B K(v) and
    # M(v) = I - h/2 Acl(v), each row holds [P | Q | R | K] where
    # P = M^-1 (I + h/2 Acl) [25], Q = M^-1 h B [5],
    # R = M^-1 h B_roll [5], K = K(v) [5] -- so the per-agent 5x5 solve
    # in models/balancingrider.step collapses to one flat row gather plus
    # a broadcast 5x5 matvec (see the step() prop branch). Built with the
    # create()-time t_s; stale if t_s is later replaced.
    br_prop_lut: Any = None
    # Optional GATHER-FREE piecewise-quintic midpoint PROPAGATOR
    # (create prop_poly=S, deterministic mode only): the same 40
    # [P | Q | R | K] entries as br_prop_lut, fitted per speed segment
    # on the smooth band [GAINS_POLY_V_LO, v_hi] with the coefficients
    # baked into the program as literals (STATIC field) -- no HBM
    # table, no per-agent row gathers (the two br_prop_lut row gathers
    # are what made the LUT propagator a net loss, BASELINE.md
    # "Negative result: tabulated midpoint propagator"). Below-band
    # speeds clamp to the band edge like br_gains_poly. Built with the
    # create()-time t_s; stale if t_s is later replaced.
    br_prop_poly: Any = struct.field(pytree_node=False, default=None)
    # Fields that describe the (single) physical bicycle / behavior model
    # and stay shared across the population in `as_population`.
    POPULATION_SHARED = ("br_A0", "br_A1", "br_A2", "br_B", "br_B_roll",
                         "polemodel_rt", "br_gains_lut",
                         "br_ackermann_lut", "br_prop_lut")
    # stochastic control behavior (reference parameters.py:1376-1411)
    stochastic_control_behavior: bool = struct.field(
        pytree_node=False, default=False)
    controlparam_resampling_speedthresh: Any = 0.8333
    polemodel_rt: Any = None
    # Per-step cap on how many agents run the conditional-GMM resampler
    # (0 = no cap). The hysteresis gate admits only a trickle of agents
    # per step; with a budget the needy agents are compacted, sampled,
    # and scattered back instead of sampling the whole population and
    # masking (models/balancingrider._pole_features). Overflow defers to
    # later steps (deferred agents stay needy). Population-scale runs
    # want ~2-4x the expected per-step resample count.
    br_resample_budget: int = struct.field(pytree_node=False, default=0)
    # Resampling cadence: run the budget-compacted resampler only every
    # K-th global step (1 = every step). The speed-hysteresis semantics
    # absorb the <=(K-1)-step deferral; gating on t_glob keeps runs
    # bit-identical under sharding and sorted residency.
    br_resample_every: int = struct.field(pytree_node=False, default=1)
    # torque disturbances -- re-introduced feature (the reference removed
    # support: dynamics.py:317-318; params parameters.py:1319-1322)
    p_dist_roll: Any = 0.0
    p_dist_steer: Any = 0.0
    T_dist_roll: Any = 9000.0
    T_dist_steer: Any = 1000.0
    # STATIC "any disturbance probability nonzero" flag, set by create()
    # and kept fresh by the replace() override below: lets the compiled
    # step skip the per-agent Bernoulli draws entirely in the (default)
    # deterministic case instead of drawing against p = 0.
    br_disturb: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, bicycle_parameter_dict=None, poles=None, gains=None,
               controlparam_filename="BR1_ImRe5GivenV_pole-model-params"
                                     ".yaml",
               stochastic_control_behavior=False,
               controlparam_resampling_speedthresh=0.8333,
               controlparam_polemodel_component=0,
               p_dist_roll=0.0, p_dist_steer=0.0,
               T_dist_roll=9000.0, T_dist_steer=1000.0,
               gains_lut=0, prop_lut=0, prop_poly=0, gains_poly=0,
               resample_budget=0,
               resample_every=1,
               calib_mode=False, verbose=True, **kw):
        from cyclistsocialforce_tpu import behavior
        from cyclistsocialforce_tpu.ops import whipple

        p = dict(bicycle_parameter_dict
                 or whipple.BALANCEASSIST_WITH_RIDER)
        # wheelbase forced to the physical parameter set
        # (reference parameters.py:1290-1295)
        kw["l"] = p["w"]
        kw["l_1"] = p["w"] / 2.0
        kw.pop("l_2", None)
        kw["g"] = p["g"]
        kw["m"] = p["mB"] + p["mF"] + p["mH"] + p["mR"]

        # A(v) structure from the canonical matrices (Meijaard 2007):
        # A[2:4,0:2] = -Minv (g K0 + v^2 K2); A[2:4,2:4] = -Minv C1 v;
        # yaw rows A[4,1] = cos(lam)/w * v, A[4,3] = cos(lam) c / w
        # (reference dynamics.py:511-538).
        M, C1, K0, K2 = whipple.canonical_matrices(p)
        Minv = np.linalg.inv(M)
        cl, w, c = np.cos(p["lam"]), p["w"], p["c"]
        A0 = np.zeros((5, 5))
        A0[0:2, 2:4] = np.eye(2)
        A0[2:4, 0:2] = -Minv @ (p["g"] * K0)
        A0[4, 3] = cl * c / w
        A1 = np.zeros((5, 5))
        A1[2:4, 2:4] = -Minv @ C1
        A1[4, 1] = cl / w
        A2 = np.zeros((5, 5))
        A2[2:4, 0:2] = -Minv @ K2
        B = np.zeros(5)
        B[2:4] = Minv[:, 1]
        B_roll = np.zeros(5)
        B_roll[2:4] = Minv[:, 0]

        # rider control behavior
        pole_lin = None
        gains_fixed = None
        pm_rt = None
        if gains is not None:
            gains_fixed = np.asarray(gains, dtype=float).reshape(-1)
        elif poles is not None:
            # fixed poles in the reference ordering
            # [real, a+jb, a-jb, c+jd, c-jd] -> feature vector
            po = np.asarray(poles, dtype=complex).reshape(-1)
            feats = np.array([po[0].real, po[1].real, abs(po[1].imag),
                              po[3].real, abs(po[3].imag)])
            pole_lin = np.c_[feats, np.zeros(5)]
        else:
            pm = behavior.load_packaged_polemodel(controlparam_filename)
            if stochastic_control_behavior:
                if controlparam_polemodel_component >= pm.gmm.n_components:
                    raise ValueError(
                        f"pole model {controlparam_filename} has only "
                        f"{pm.gmm.n_components} components")
                pm_rt = behavior.PoleModelRT.from_polemodel(pm)
                # mean funcs double as the t=0 initialization
                pole_lin = pm.component_mean_function_params()[
                    controlparam_polemodel_component]
            else:
                pole_lin = pm.component_mean_function_params()[
                    controlparam_polemodel_component]

        # optional gains lookup table (speed-of-light per-step path for
        # the deterministic flagship model: K(v) is a smooth pure
        # function of speed when the pole features are the linear mean
        # functions, so precompute it on a uniform grid and interpolate;
        # max |K_lut - K_exact| ~ (dv)^2 -- pinned by tests)
        lut = None
        ack_lut = None
        if gains_lut and gains_fixed is None:
            import jax
            import jax.numpy as jnp

            vmr = kw.get("v_max_riding", cls.v_max_riding)
            v_lo, v_hi = float(pair_lo(vmr)), float(pair_hi(vmr))
            g = int(gains_lut)
            vs = np.linspace(v_lo, v_hi, g)

            def _A_at(v):
                return (jnp.asarray(A0 + 0.0) + v * jnp.asarray(A1)
                        + v * v * jnp.asarray(A2))

            _repair = _repair_lut_rows
            dv = np.float64((v_hi - v_lo) / (g - 1))
            # build on the host CPU backend: this is a one-time
            # construction sweep, and tracing/compiling it through a
            # remote-TPU connection costs minutes for zero benefit
            if stochastic_control_behavior:
                # stochastic mode: per-agent pole features vary, but the
                # Ackermann gain is LINEAR in the characteristic
                # coefficients -- tabulate the coefficient BASIS
                # M(v) [6, 5] so K = charpoly(feats) @ M(v_mid) stays
                # exact in the features (see ops.control.ackermann_basis)
                from cyclistsocialforce_tpu.ops.control import \
                    ackermann_basis

                def m_at(v):
                    return ackermann_basis(_A_at(v), jnp.asarray(B))

                with jax.default_device(jax.devices("cpu")[0]):
                    tabm = np.array(jax.vmap(m_at)(jnp.asarray(vs)))
                ack_lut = (_repair(tabm), np.float64(v_lo), dv)
            else:
                from cyclistsocialforce_tpu.ops.control import (
                    ackermann, charpoly_from_pole_features)

                def k_at(v):
                    feats = (jnp.asarray(pole_lin)[:, 0]
                             + jnp.asarray(pole_lin)[:, 1] * v)
                    return ackermann(_A_at(v), jnp.asarray(B),
                                     charpoly_from_pole_features(feats))

                with jax.default_device(jax.devices("cpu")[0]):
                    tab = np.array(jax.vmap(k_at)(jnp.asarray(vs)))
                lut = (_repair(tab), np.float64(v_lo), dv)

        # optional midpoint-PROPAGATOR table (see the br_prop_lut field
        # comment): deterministic mode only -- the stochastic model's
        # per-agent pole features make Acl(v) agent-dependent
        plut = None
        prop_pl = None
        if prop_lut and prop_poly:
            raise ValueError(
                "prop_lut and prop_poly are alternative propagator "
                "modes -- pass one (step() would silently prefer "
                "prop_poly)")
        if prop_lut or prop_poly:
            if stochastic_control_behavior:
                raise ValueError(
                    "prop_lut/prop_poly express the closed-loop "
                    "midpoint propagator over speed alone; with "
                    "stochastic control behavior Acl depends on "
                    "per-agent pole features (use gains_lut/gains_poly "
                    "for the Ackermann-basis forms instead)")
            h_ts = float(np.asarray(kw.get("t_s", cls.t_s)))

            def _prop_rows(vs_p, repair):
                gp = len(vs_p)
                if gains_fixed is not None:
                    Kg = np.broadcast_to(
                        np.asarray(gains_fixed, dtype=float),
                        (gp, 5)).copy()
                else:
                    import jax
                    import jax.numpy as jnp

                    from cyclistsocialforce_tpu.ops.control import (
                        ackermann, charpoly_from_pole_features)

                    def k_at_p(v):
                        feats = (jnp.asarray(pole_lin)[:, 0]
                                 + jnp.asarray(pole_lin)[:, 1] * v)
                        Av = (jnp.asarray(A0 + 0.0) + v * jnp.asarray(A1)
                              + v * v * jnp.asarray(A2))
                        return ackermann(Av, jnp.asarray(B),
                                         charpoly_from_pole_features(feats))

                    with jax.default_device(jax.devices("cpu")[0]):
                        Kg = np.array(jax.vmap(k_at_p)(jnp.asarray(vs_p)))
                    if repair:
                        Kg = _repair_lut_rows(Kg)
                Av = (A0[None] + vs_p[:, None, None] * A1[None]
                      + (vs_p ** 2)[:, None, None] * A2[None])
                Acl = Av - B[None, :, None] * Kg[:, None, :]
                eye = np.eye(5)[None]
                Minv = np.linalg.inv(eye - (h_ts / 2.0) * Acl)
                Pm = Minv @ (eye + (h_ts / 2.0) * Acl)
                Qv = Minv @ (h_ts * B)
                Rv = Minv @ (h_ts * B_roll)
                return np.concatenate(
                    [Pm.reshape(gp, 25), Qv, Rv, Kg], axis=1)

        if prop_lut:
            vmr = kw.get("v_max_riding", cls.v_max_riding)
            v_lo, v_hi = float(pair_lo(vmr)), float(pair_hi(vmr))
            gp = int(prop_lut)
            vs_p = np.linspace(v_lo, v_hi, gp)
            plut = (_repair_lut_rows(_prop_rows(vs_p, repair=True)),
                    np.float64(v_lo),
                    np.float64((v_hi - v_lo) / (gp - 1)))
        if prop_poly:
            from cyclistsocialforce_tpu.ops.piecewise import \
                fit_piecewise_poly

            vmr = kw.get("v_max_riding", cls.v_max_riding)
            v_hi = float(pair_hi(vmr))
            v_lo = float(cls.GAINS_POLY_V_LO)
            if v_hi <= v_lo:
                raise ValueError(
                    f"prop_poly needs v_max_riding > {v_lo} m/s (the "
                    f"K(v) pole at v ~ 1.25 bounds the fit band)")
            prop_pl = fit_piecewise_poly(
                lambda vs: _prop_rows(np.asarray(vs), repair=False),
                v_lo, v_hi, int(prop_poly))

        # optional GATHER-FREE piecewise-polynomial gain schedules (see
        # the br_gains_poly / br_ackermann_poly field comments):
        # deterministic mode fits K(v) directly; stochastic mode fits the
        # Ackermann coefficient BASIS M(v) so per-agent pole features
        # stay exact. Dense sweep on the smooth band [GAINS_POLY_V_LO,
        # v_hi], then per-segment quintic least squares in the local
        # coordinate u in [0, 1] (ops/piecewise.py).
        poly = None
        ack_poly = None
        if gains_poly and gains_fixed is None:
            import jax
            import jax.numpy as jnp

            from cyclistsocialforce_tpu.ops.piecewise import \
                fit_piecewise_poly

            S = int(gains_poly)
            vmr = kw.get("v_max_riding", cls.v_max_riding)
            v_hi = float(pair_hi(vmr))
            v_lo = float(cls.GAINS_POLY_V_LO)
            if v_hi <= v_lo:
                raise ValueError(
                    f"gains_poly needs v_max_riding > {v_lo} m/s (the "
                    f"K(v) pole at v ~ 1.25 bounds the fit band)")

            def _A_at_p(v):
                return (jnp.asarray(A0 + 0.0) + v * jnp.asarray(A1)
                        + v * v * jnp.asarray(A2))

            if stochastic_control_behavior:
                from cyclistsocialforce_tpu.ops.control import \
                    ackermann_basis

                def m_sweep(vs):
                    with jax.default_device(jax.devices("cpu")[0]):
                        return np.array(jax.vmap(
                            lambda v: ackermann_basis(
                                _A_at_p(v), jnp.asarray(B)).reshape(30)
                        )(jnp.asarray(vs)))

                ack_poly = fit_piecewise_poly(m_sweep, v_lo, v_hi, S)
            else:
                from cyclistsocialforce_tpu.ops.control import (
                    ackermann, charpoly_from_pole_features)

                def k_sweep(vs):
                    def k_at_s(v):
                        feats = (jnp.asarray(pole_lin)[:, 0]
                                 + jnp.asarray(pole_lin)[:, 1] * v)
                        return ackermann(_A_at_p(v), jnp.asarray(B),
                                         charpoly_from_pole_features(feats))

                    with jax.default_device(jax.devices("cpu")[0]):
                        return np.array(jax.vmap(k_at_s)(jnp.asarray(vs)))

                poly = fit_piecewise_poly(k_sweep, v_lo, v_hi, S)

        return super().create(
            calib_mode=calib_mode, verbose=verbose,
            br_A0=A0, br_A1=A1, br_A2=A2, br_B=B, br_B_roll=B_roll,
            br_pole_lin=pole_lin, br_gains_fixed=gains_fixed,
            br_gains_lut=lut, br_ackermann_lut=ack_lut, br_prop_lut=plut,
            br_prop_poly=prop_pl,
            br_gains_poly=poly, br_ackermann_poly=ack_poly,
            stochastic_control_behavior=bool(stochastic_control_behavior),
            controlparam_resampling_speedthresh=(
                controlparam_resampling_speedthresh),
            polemodel_rt=pm_rt,
            br_resample_budget=int(resample_budget),
            br_resample_every=int(resample_every),
            p_dist_roll=_chk_range("p_dist_roll", p_dist_roll, 0.0, 1.0),
            p_dist_steer=_chk_range("p_dist_steer", p_dist_steer, 0.0, 1.0),
            T_dist_roll=T_dist_roll, T_dist_steer=T_dist_steer,
            br_disturb=bool(np.any(np.asarray(p_dist_roll))
                            or np.any(np.asarray(p_dist_steer))), **kw)


# Keep the static br_disturb flag consistent when disturbance
# probabilities change through replace() (e.g. a calibration fitting
# p_dist_*): concrete values refresh the flag; traced values
# conservatively enable the draws (numerically correct -- the drawn
# Bernoullis are compared against the traced p -- just without the
# static skip). Installed after class creation because the flax struct
# transform overwrites `replace` defined in the class body.
_flax_br_replace = BalancingRiderParams.replace


def _br_replace(self, **changes):
    out = _flax_br_replace(self, **changes)
    if (("p_dist_roll" in changes or "p_dist_steer" in changes)
            and "br_disturb" not in changes):
        try:
            flag = bool(np.any(np.asarray(out.p_dist_roll))
                        or np.any(np.asarray(out.p_dist_steer)))
        except Exception:  # noqa: BLE001 - traced: keep draws on
            flag = True
        out = _flax_br_replace(out, br_disturb=flag)
    return out


_br_replace.__doc__ = _flax_br_replace.__doc__
BalancingRiderParams.replace = _br_replace


class RoadElementParams(struct.PyTreeNode):
    """Road-edge repulsion + drawing parameters
    (reference parameters.py:367-418)."""

    F_0: Any = 0.05
    sigma: Any = 3.0
    # drawing style (host-side metadata, reference defaults)
    roadsurface_color: Any = struct.field(pytree_node=False,
                                          default=(0.8, 0.8, 0.8))
    roadedge_color: Any = struct.field(pytree_node=False, default="white")
    roadedge_linewidth: float = struct.field(pytree_node=False,
                                             default=1.0)

    @classmethod
    def create(cls, F_0: float = 0.05, sigma: float = 3.0, **kw):
        return cls(F_0=_chk_nonneg("F_0", F_0),
                   sigma=_chk_nonneg("sigma", sigma), **kw)


def pair_lo(pair):
    """Lower element of a (min, max) limit pair.

    Pairs are stored as a length-2 trailing axis by `create`, but plain
    tuples (from direct dataclass construction) are accepted too.
    """
    if isinstance(pair, (tuple, list)):
        return pair[0]
    return jnp.asarray(pair)[..., 0]


def pair_hi(pair):
    """Upper element of a (min, max) limit pair."""
    if isinstance(pair, (tuple, list)):
        return pair[1]
    return jnp.asarray(pair)[..., 1]


def as_population(params, n: int):
    """Broadcast every numeric leaf of a params pytree to shape [n, ...].

    Use this to create per-agent parameter arrays that can afterwards be
    updated agent-by-agent (e.g. heterogeneous v_desired_default as in the
    reference standalone demo, demo/demoCSFstandalone.py:101-113).

    Fields named in the params class's ``POPULATION_SHARED`` tuple (e.g.
    the BalancingRider state-space structure matrices and the pole-model
    runtime) keep their population-shared shape.
    """
    import dataclasses

    import jax

    def bcast(leaf):
        arr = jnp.asarray(leaf)
        return jnp.broadcast_to(arr, (n,) + arr.shape)

    shared = getattr(type(params), "POPULATION_SHARED", ())
    if shared and dataclasses.is_dataclass(params):
        upd = {}
        for f in dataclasses.fields(params):
            if f.name in shared or not f.metadata.get("pytree_node", True):
                continue
            val = getattr(params, f.name)
            if val is None:
                continue
            upd[f.name] = jax.tree_util.tree_map(bcast, val)
        return params.replace(**upd)
    return jax.tree_util.tree_map(bcast, params)
