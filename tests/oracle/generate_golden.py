"""Generate golden trajectories by running the ACTUAL reference package
(/root/reference, read-only) through the API shims in tests/oracle/shims.

The golden .npz files are the parity oracle for the TPU framework: the
parity tests (tests/test_parity_*.py) require trajectories within 1e-3 m.

Usage: python tests/oracle/generate_golden.py [scenario ...]
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "..", "golden")
REF_SRC = "/root/reference/src"

REPO = os.path.join(HERE, "..", "..")
sys.path.insert(0, REPO)                       # cyclistsocialforce_tpu
sys.path.insert(0, os.path.join(HERE, "shims"))
sys.path.insert(0, REF_SRC)

import matplotlib

matplotlib.use("Agg")


class DummyDrawing:
    """No-op drawing so intersection.step()'s first-step add_drawing path
    (reference intersection.py:880-885) is bypassed headlessly."""

    def update(self, *a, **k):
        pass

    def set_animated(self, *a, **k):
        pass


def run_intersection(vehicles, n_steps):
    """Step the reference intersection; returns the number of completed
    steps. Stops early when the reference crashes (e.g. upstream bug:
    PlanarPointBicycle borrows TwoDBicycle.calcDestinationForce whose
    straight-line fallback calls zero-arg super() against the wrong class,
    reference vehicle.py:1556 + 2022-2024 -> TypeError near the final
    destination)."""
    from cyclistsocialforce.intersection import SocialForceIntersection

    for v in vehicles:
        v.drawing = DummyDrawing()
    ins = SocialForceIntersection(list(vehicles),
                                  activate_sumo_cosimulation=False,
                                  animate=False)
    for k in range(n_steps):
        try:
            ins.step()
        except Exception as e:
            print(f"  reference stopped at step {k}: "
                  f"{type(e).__name__}: {e}")
            return k
    return n_steps


def encroachment_vehicles(bike_type, n_states=8, save_forces=True,
                          construct=None):
    """The 3-cyclist encroachment scenario of demo/demoCSFstandalone.py
    (reference demo/demoCSFstandalone.py:94-136)."""
    s0 = [
        (-23 + 17, 0, 0, 5, 0, 0, 0, 0),
        (0 + 15, -20, np.pi / 2, 5, 0, 0, 0, 0),
        (-2 + 15, -20, np.pi / 2, 5, 0, 0, 0, 0),
    ]
    vels = [4.5, 5.0, 5.0]
    dests = [
        ((35, 64, 65), (0, 0, 0)),
        ((15, 15, 15), (20, 49, 50)),
        ((13, 13, 13), (20, 49, 50)),
    ]
    vehicles = []
    for s, vd, (dx, dy) in zip(s0, vels, dests):
        ctor = construct or bike_type
        b = ctor(s[:n_states], id=f"bike{len(vehicles)}",
                 saveForces=save_forces)
        b.params.v_desired_default = vd
        b.setDestinations(dx, dy)
        vehicles.append(b)
    return vehicles


def save(fname, vehicles, n_steps, extra=None):
    os.makedirs(GOLDEN, exist_ok=True)
    data = {}
    for k, v in enumerate(vehicles):
        data[f"traj_{k}"] = v.traj[:, : n_steps + 1]
        if getattr(v, "saveForces", False):
            data[f"forces_{k}"] = v.trajF[:, : n_steps + 1]
    if extra:
        data.update(extra)
    path = os.path.join(GOLDEN, fname)
    np.savez_compressed(path, **data)
    print(f"wrote {path}: " + ", ".join(
        f"{k}{v.shape}" for k, v in data.items()))


def gen_encroachment_bicycle2d(n_steps=700):
    from cyclistsocialforce.vehicle import Bicycle

    vehicles = encroachment_vehicles(Bicycle, n_states=5)
    n_steps = run_intersection(vehicles, n_steps)
    save("encroachment_bicycle2d.npz", vehicles, n_steps)


def gen_encroachment_planarpoint(n_steps=700):
    from cyclistsocialforce.vehicle import PlanarPointBicycle

    vehicles = encroachment_vehicles(PlanarPointBicycle, n_states=4)
    n_steps = run_intersection(vehicles, n_steps)
    save("encroachment_planarpoint.npz", vehicles, n_steps)


def gen_encroachment_invpendulum(n_steps=700):
    from cyclistsocialforce.vehicle import InvPendulumBicycle

    vehicles = encroachment_vehicles(
        InvPendulumBicycle, n_states=6,
        construct=lambda s0, **kw: construct_twod_family(
            InvPendulumBicycle, s0, **kw))
    n_steps = run_intersection(vehicles, n_steps)
    save("encroachment_invpendulum.npz", vehicles, n_steps)


def gen_encroachment_planarbicycle(n_steps=700):
    from cyclistsocialforce.vehicle import PlanarBicycle

    vehicles = encroachment_vehicles(PlanarBicycle, n_states=5)
    n_steps = run_intersection(vehicles, n_steps)
    save("encroachment_planarbicycle.npz", vehicles, n_steps)


def gen_encroachment_balancingrider(n_steps=700):
    from cyclistsocialforce.vehicle import BalancingRiderBicycle

    vehicles = encroachment_vehicles(BalancingRiderBicycle, n_states=8)
    n_steps = run_intersection(vehicles, n_steps)
    save("encroachment_balancingrider.npz", vehicles, n_steps)


def construct_twod_family(cls, s0, id="", saveForces=False):
    """Constructor workaround for an upstream bug: TwoDBicycle.__init__
    calls `Bicycle.__init__(self, s0, id, route, saveForces, 0)`
    positionally (reference vehicle.py:1359), but Bicycle.__init__ only
    accepts (s0, **kwargs) (vehicle.py:1021) -- so TwoDBicycle and
    InvPendulumBicycle raise TypeError on construction in v2.1.1. This
    reproduces the evident intent of those constructors (vehicle.py:1323-
    1364, 1690-1736) so their force/dynamics code can still be exercised
    as a golden oracle.
    """
    import numpy as np
    from cyclistsocialforce.dynamics import PIDcontroller
    from cyclistsocialforce.parameters import InvPendulumBicycleParameters
    from cyclistsocialforce.vehicle import (Bicycle, InvPendulumBicycle,
                                            TwoDBicycle)

    b = object.__new__(cls)
    b.params = InvPendulumBicycleParameters()
    Bicycle.__init__(b, s0, id=id, saveForces=saveForces, params=b.params)
    b.speed_controller = PIDcontroller(
        b.params.k_p_v, 0, 0, b.params.t_s, isangle=False)
    if cls is InvPendulumBicycle:
        b.init_dynamics_statespace()
        b.x = np.array([[b.s[4]], [0], [b.s[5]], [0], [b.s[2]]])
        b.zrid = np.zeros((2), dtype=bool)
        if s0[3] < b.params.v_max_walk:
            b.zrid[1] = True
        else:
            b.zrid[0] = True
    return b


def gen_encroachment_twod(n_steps=700):
    """3-agent encroachment on the TwoDBicycle: the BMD2023 repulsive
    field + spline destination force under multi-agent interaction."""
    from cyclistsocialforce.vehicle import TwoDBicycle

    vehicles = encroachment_vehicles(
        TwoDBicycle, n_states=5,
        construct=lambda s0, **kw: construct_twod_family(
            TwoDBicycle, s0, **kw))
    n_steps = run_intersection(vehicles, n_steps)
    save("encroachment_twod.npz", vehicles, n_steps)


def gen_walk_invpendulum(n_steps=1500):
    """InvPendulumBicycle starting below walking speed: exercises the
    riding/walking FSM transition (reference vehicle.py:1932-1950)."""
    from cyclistsocialforce.vehicle import InvPendulumBicycle

    b = construct_twod_family(InvPendulumBicycle,
                              (0, 0, 0, 0.5, 0, 0), id="w",
                              saveForces=True)
    b.setDestinations((30, 31), (0, 0))
    n_steps = run_intersection([b], n_steps)
    save("walk_invpendulum.npz", [b], n_steps)


def gen_kaths_single(n_steps=1200):
    """Single Kaths (2023) particle-model bicycle following destinations
    (reference external.py) -- forces via the model's own dest force, no
    repulsion (single agent)."""
    import numpy as np
    from cyclistsocialforce import external as ext
    from cyclistsocialforce.parameters import BicycleParameters
    from cyclistsocialforce.vehicle import Vehicle

    # Kaths_Bicycle.__init__ passes a `drawing_class` kwarg Vehicle does
    # not accept (upstream bug, external.py:160-166); reproduce the
    # evident intent manually.
    params = BicycleParameters(
        v_desired_default=4.0,
        rep_force=ext.get_kaths_veloaniso_paramset(),
        dest_force=ext.get_kaths_veloaniso_paramset())
    b = Vehicle((0.0, 0.0, 0.1, 2.0), id="k", saveForces=True,
                params=params,
                rep_force_func=ext.calc_kaths_veloaniso_repulsive_force,
                dest_force_func=ext.calc_kaths_veloaniso_destination_force)
    b.dyn_step_func = ext.step_kaths_particle_model
    # reset=True: the Kaths dest force takes arctan toward the CURRENT
    # dest, which defaults to the agent's own position (0/0 -> NaN in the
    # reference) until the queue is made current
    b.setDestinations((30, 30, 30), (5, 20, 21), reset=True)
    for k in range(n_steps):
        try:
            F1, F2 = b.dest_force_func(b)
            b.step(F1, F2)
        except Exception as e:
            print(f"  reference stopped at step {k}: "
                  f"{type(e).__name__}: {e}")
            n_steps = k
            break
    save("kaths_single.npz", [b], n_steps)


def gen_curve_balancingrider(n_steps=2500):
    """BalancingRiderBicycle on a curved road with edge repulsion: the
    curve scenario (reference scenarios/curve-scenario.py:25-105) --
    exercises road geometry builders + infrastructure forces end-to-end."""
    import numpy as np
    from cyclistsocialforce.intersection import (CurvedRoadSegment,
                                                 RoadSegmentCollection,
                                                 SocialForceIntersection,
                                                 StraightRoadSegment)
    from cyclistsocialforce.parameters import RoadElementParameters
    from cyclistsocialforce.vehicle import BalancingRiderBicycle

    roadparams = RoadElementParameters(sigma=2.0, F_0=0.15)
    x0 = np.array((0, -20, np.pi / 2))
    seg1 = StraightRoadSegment(x0, 5, 25, params=roadparams)
    seg2 = CurvedRoadSegment(seg1.x1, 5, 10, np.pi / 2, "right",
                             params=roadparams)
    seg3 = CurvedRoadSegment(seg2.x1, 5, 10, np.pi / 2, "left",
                             params=roadparams)
    seg4 = StraightRoadSegment(seg3.x1, 5, 20, params=roadparams)
    segs = RoadSegmentCollection((seg1, seg2, seg3, seg4))

    b = BalancingRiderBicycle((0, -5, np.pi / 2, 5, 0, 0, 0, 0), id="b",
                              saveForces=True)
    b.params.v_desired_default = 3.0
    destx, desty = segs.get_destinations_from_segments()
    for _ in range(3):
        destx.append(destx[-1])
        desty.append(desty[-1] + 1)
    b.setDestinations(destx, desty)
    b.drawing = DummyDrawing()
    ins = SocialForceIntersection([b], road_elements=[segs],
                                  activate_sumo_cosimulation=False,
                                  animate=False)
    for k in range(n_steps):
        try:
            ins.step()
        except Exception as e:
            print(f"  reference stopped at step {k}: "
                  f"{type(e).__name__}: {e}")
            n_steps = k
            break
    save("curve_balancingrider.npz", [b], n_steps,
         extra={"destx": np.asarray(destx), "desty": np.asarray(desty)})


PARCOURS_DESTS = ((10, 20, 30, 40, 50, 50, 50), (0, 4, -4, 0, 4, 30, 31))


def gen_parcours_planarpoint(n_steps=2800):
    """Single PlanarPointBicycle following a destination queue: exercises
    the TwoD spline destination force (reference vehicle.py:1416-1558,
    used by PlanarPointBicycle via vehicle.py:2022-2024) and the implicit-
    midpoint planar point dynamics, after scenarios/parcours-scenario.py."""
    from cyclistsocialforce.vehicle import PlanarPointBicycle

    b = PlanarPointBicycle((0, 0, 0, 5), id="t", saveForces=True)
    b.setDestinations(*PARCOURS_DESTS)
    n_steps = run_intersection([b], n_steps)
    save("parcours_planarpoint.npz", [b], n_steps)


def gen_parcours_twod(n_steps=2800):
    """Single TwoDBicycle on the parcours (constructed via
    `construct_twod_family` -- see upstream ctor bug note there)."""
    from cyclistsocialforce.vehicle import TwoDBicycle

    b = construct_twod_family(TwoDBicycle, (0, 0, 0, 5, 0), id="t",
                              saveForces=True)
    b.setDestinations(*PARCOURS_DESTS)
    n_steps = run_intersection([b], n_steps)
    save("parcours_twod.npz", [b], n_steps)


def gen_hm_single(n_steps=1500):
    """Single Bicycle driven by the Helbing-Molnar destination-force
    variant (reference vehicle.py:1196-1216). The reference cannot select
    HM through the intersection (Bicycle.calcDestinationForce is a hard
    override, vehicle.py:1189-1194), so this steps the vehicle directly --
    exactly what the framework's dest_force="hm" engine does for a
    population without repulsion."""
    from cyclistsocialforce.vehicle import Bicycle

    b = Bicycle((0, 0, 0, 3, 0), id="hm", saveForces=True)
    b.params.v_desired_default = 4.0
    b.setDestinations((20, 40, 40), (0, 10, 11))
    for k in range(n_steps):
        try:
            F1, F2 = b.calcDestinationForceHM()
            b.step(F1, F2)
        except Exception as e:
            print(f"  reference stopped at step {k}: "
                  f"{type(e).__name__}: {e}")
            n_steps = k
            break
    save("hm_single.npz", [b], n_steps)


def gen_field_legacy():
    """Legacy elliptic potential + repulsive force field of one Bicycle
    evaluated on a grid (reference Bicycle.calcPotential /
    calcRepulsiveForce, vehicle.py:1066-1147) -- the oracle for the
    field-evaluation/plot helpers."""
    import numpy as np
    from cyclistsocialforce.vehicle import Bicycle

    b = Bicycle((2.0, 3.0, 0.7, 4.0, 0.0), id="f")
    gx, gy = np.meshgrid(np.arange(-10.0, 15.0, 0.5),
                         np.arange(-8.0, 12.0, 0.5))
    P = b.calcPotential(gx, gy)
    Fx, Fy = b.calcRepulsiveForce(gx, gy)
    os.makedirs(GOLDEN, exist_ok=True)
    path = os.path.join(GOLDEN, "field_legacy.npz")
    np.savez_compressed(path, s=np.asarray(b.s[:5]), gx=gx, gy=gy,
                        P=P, Fx=Fx, Fy=Fy,
                        p_0=b.params.p_0, p_decay=b.params.p_decay,
                        v_max=b.params.v_max_riding[1])
    print(f"wrote {path}")


SCENARIOS = {
    "encroachment_bicycle2d": gen_encroachment_bicycle2d,
    "encroachment_planarpoint": gen_encroachment_planarpoint,
    "encroachment_invpendulum": gen_encroachment_invpendulum,
    "encroachment_balancingrider": gen_encroachment_balancingrider,
    "encroachment_planarbicycle": gen_encroachment_planarbicycle,
    "curve_balancingrider": gen_curve_balancingrider,
    "walk_invpendulum": gen_walk_invpendulum,
    "encroachment_twod": gen_encroachment_twod,
    "kaths_single": gen_kaths_single,
    "parcours_planarpoint": gen_parcours_planarpoint,
    "parcours_twod": gen_parcours_twod,
    "hm_single": gen_hm_single,
    "field_legacy": gen_field_legacy,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(SCENARIOS)
    for name in names:
        print(f"--- {name}")
        SCENARIOS[name]()
