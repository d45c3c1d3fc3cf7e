"""SUMO co-simulation bridge: intersections with dynamic populations.

Equivalent of the reference's SUMO-coupled `SocialForceIntersection` and
`SUMOScenario` (reference intersection.py:333-539, 660-688;
scenario.py:268-482): SUMO simulates road users on links; whenever one
enters a junction's internal lanes it is handed over to the social-force
engine, rides the intersection under social forces along a route-spline
destination prototype, and is handed back once SUMO maps its pushed
position onto the outgoing edge.

TPU-native adaptations:
  - each intersection owns a FIXED-CAPACITY slot population (AgentState
    rows + `active` mask) so the jitted step compiles once per
    intersection, instead of the reference's growing Python object list;
  - device<->host sync is BULK: one state pull per intersection per step
    feeding all moveToXY pushes (the reference crosses the TraCI socket
    per agent per step, intersection.py:680-688);
  - the transport is injected (traci / libsumo / FakeTraCI), making the
    whole co-simulation hermetically testable (SURVEY.md section 4).
"""

from __future__ import annotations

import time
import jax
import jax.numpy as jnp
import numpy as np

from cyclistsocialforce_tpu.engine import Engine
from cyclistsocialforce_tpu.models import MODELS
from cyclistsocialforce_tpu.params import (BalancingRiderParams,
                                           BicycleParams,
                                           InvPendulumBicycleParams,
                                           as_population)
from cyclistsocialforce_tpu.state import make_state, set_destinations
from cyclistsocialforce_tpu.sumo.net import SumoNetwork
from cyclistsocialforce_tpu.trajectory import generate_spline_prototype
from cyclistsocialforce_tpu.utils.angles import (angle_sfm_to_sumo,
                                                 angle_sumo_to_sfm)

# vehicle factory by bicycle_type string (reference scenario.py:416-429)
BICYCLE_TYPES = {
    "bicycle": ("bicycle2d", BicycleParams),
    "twowheeler": ("twod", InvPendulumBicycleParams),
    "invpendulum": ("invpendulum", InvPendulumBicycleParams),
    "balancingrider": ("balancingrider", BalancingRiderParams),
}


class SumoIntersection:
    """One junction's social-force space with SUMO handover
    (reference SocialForceIntersection SUMO branch,
    intersection.py:333-539)."""

    def __init__(self, net: SumoNetwork, junction, model_name="bicycle2d",
                 params=None, capacity=32, t_s=0.01, queue_size=16,
                 neighbors=None):
        self.net = net
        self.junction = junction
        self.id = junction.id
        self.capacity = capacity
        self.model = MODELS[model_name]
        if params is None:
            # default params must match the model: look the class up by
            # model name (e.g. balancingrider needs br_* fields that
            # BicycleParams lacks)
            by_model = {m: c for m, c in BICYCLE_TYPES.values()}
            params = by_model.get(model_name, BicycleParams).create(t_s=t_s)
        base = params
        self.params = as_population(base, capacity)

        self.internal_lane_ids = net.internal_lane_ids(junction.id)
        if not self.internal_lane_ids:
            raise ValueError(
                f"Intersection {self.id} does not have internal lanes! "
                f"The co-simulation requires internal lanes to allocate "
                f"SUMO road users to intersections.")
        self.in_edges = {e.id: net.lane_end_points(e, incoming=True)
                         for e in net.incoming_edges(junction.id)}
        self.out_edges = {e.id: net.lane_end_points(e, incoming=False)
                          for e in net.outgoing_edges(junction.id)}

        s0 = np.zeros((capacity, 8))
        st = make_state(s0, queue_size=queue_size, dtype=np.float64)
        self.state = st.replace(active=jnp.zeros((capacity,), dtype=bool))
        # optional block-sparse culled pair stage (NeighborConfig) for
        # high-capacity junctions; the default dense path is fine at the
        # reference's per-junction scales (tens of agents)
        self.engine = Engine.create(self.params, self.model,
                                    neighbors=neighbors)
        self._step_jit = jax.jit(lambda e, s: e.step(s))
        self._slots: dict[str, int] = {}
        self._rng = np.random.default_rng(0)
        # fresh per-agent RNG identity for each entrant (state.uid keys
        # the stochastic streams; a recycled slot must not resume the
        # previous occupant's stream)
        self._next_uid = capacity

    # ---- handover bookkeeping ----

    def road_user_ids(self):
        return list(self._slots)

    def find_entered_exited(self, transport):
        """Diff current internal-lane occupancy against tracked users
        (reference find_entered_exited_roadusers,
        intersection.py:429-453)."""
        current = []
        for lid in self.internal_lane_ids:
            current += list(transport.lane.getLastStepVehicleIDs(lid))
        prev = set(self._slots)
        cur = set(current)
        return sorted(cur - prev), sorted(prev - cur)

    def _free_slot(self):
        used = set(self._slots.values())
        for k in range(self.capacity):
            if k not in used:
                return k
        raise RuntimeError(
            f"Intersection {self.id}: capacity {self.capacity} exceeded.")

    def add_road_user(self, vid, transport):
        """Pull SUMO state, build the route-spline destination prototype,
        and activate a slot (reference add_road_user,
        intersection.py:458-539 + scenario.py:394-435)."""
        route = transport.vehicle.getRoute(vid)
        idx = transport.vehicle.getRouteIndex(vid)
        route = route[idx:]
        if len(route) < 2:
            raise ValueError(
                f"Road user {vid} does not have a valid remaining route "
                f"with more than one element: {route}")
        pos = transport.vehicle.getPosition(vid)
        psi = angle_sumo_to_sfm(transport.vehicle.getAngle(vid))
        v = transport.vehicle.getSpeed(vid)

        e_in, e_out = route[0], route[1]
        assert e_in in self.in_edges, \
            f"Road user {vid} arriving on junction {self.id} from " \
            f"unknown edge {e_in}!"
        assert e_out in self.out_edges, \
            f"Road user {vid} requesting to depart junction {self.id} " \
            f"on unknown edge {e_out}!"

        # closest incoming lane, random outgoing lane
        # (intersection.py:486-500)
        lanes_in = self.in_edges[e_in]
        if len(lanes_in) > 1:
            pts = np.array([(x[-1], y[-1]) for x, y in lanes_in])
            lane_in = int(np.argmin(np.hypot(pts[:, 0] - pos[0],
                                             pts[:, 1] - pos[1])))
        else:
            lane_in = 0
        lane_out = int(self._rng.integers(0, len(self.out_edges[e_out])))

        xi, yi = lanes_in[lane_in]
        xo, yo = self.out_edges[e_out][lane_out]
        px = np.concatenate([xi, xo])
        py = np.concatenate([yi, yo])
        xp, yp = generate_spline_prototype(px, py, 5)
        # drop prototype points already behind the user
        # (intersection.py:513-519)
        dp2f = np.hypot(xp - xp[-1], yp - yp[-1])
        du2f = np.hypot(pos[0] - xp[-1], pos[1] - yp[-1])
        keep = dp2f < du2f
        xp, yp = xp[keep], yp[keep]
        if xp.size == 0:
            xp, yp = np.array([xo[-1]]), np.array([yo[-1]])

        slot = self._free_slot()
        st = self.state
        row = jnp.zeros((8,), dtype=st.s.dtype)
        row = row.at[0].set(pos[0]).at[1].set(pos[1])
        row = row.at[2].set(float(psi)).at[3].set(float(v))
        st = st.replace(
            s=st.s.at[slot].set(row),
            active=st.active.at[slot].set(True),
            i=st.i.at[slot].set(0),
            pos_hist=st.pos_hist.at[slot].set(
                jnp.broadcast_to(row[:2], st.pos_hist.shape[1:])),
            znav=st.znav.at[slot].set(
                jnp.array([True, False, False])),
            znavparams=st.znavparams.at[slot].set(0.0),
            pid_e=st.pid_e.at[slot].set(0.0),
            pid_i=st.pid_i.at[slot].set(0.0),
            uid=st.uid.at[slot].set(self._next_uid),
        )
        self._next_uid += 1
        st = set_destinations(st, slot, xp, yp, reset=True)
        # model-specific latents for the new slot only
        prep = getattr(self.model, "prepare", None)
        if prep is not None:
            prepared = prep(self.params, st)
            st = st.replace(
                dyn_x=st.dyn_x.at[slot].set(prepared.dyn_x[slot]),
                dyn_v=st.dyn_v.at[slot].set(prepared.dyn_v[slot]),
                dyn_gains=st.dyn_gains.at[slot].set(
                    prepared.dyn_gains[slot]),
                zrid=st.zrid.at[slot].set(prepared.zrid[slot]),
                walk_ok_steps=st.walk_ok_steps.at[slot].set(
                    prepared.walk_ok_steps[slot]))
        self.state = st
        self._slots[vid] = slot

    def remove_road_users(self, vids):
        """Deactivate exited users (reference remove_road_users_by_id)."""
        if not vids:
            return
        st = self.state
        for vid in vids:
            slot = self._slots.pop(vid, None)
            if slot is not None:
                st = st.replace(active=st.active.at[slot].set(False))
        self.state = st

    # ---- stepping + push ----

    def step(self):
        if self._slots:
            self.state = self._step_jit(self.engine, self.state)

    def push_positions(self, transport):
        """Bulk pull device state once, push all positions to SUMO
        (reference update_road_user_positions, intersection.py:660-688)."""
        if not self._slots:
            return
        s = np.asarray(self.state.s)     # ONE device->host transfer
        for vid, slot in self._slots.items():
            transport.vehicle.moveToXY(
                vid, "", -1, float(s[slot, 0]), float(s[slot, 1]),
                angle=float(angle_sfm_to_sumo(s[slot, 2])), keepRoute=6)


class SumoCoSimulation:
    """The SUMOScenario equivalent (reference scenario.py:268-482)."""

    def __init__(self, net: SumoNetwork, transport, bicycle_type="bicycle",
                 t_s=0.01, capacity=32, run_time_factor=None,
                 params=None, neighbors=None):
        self.net = net
        self.transport = transport
        self.t_s = t_s
        self.run_time_factor = run_time_factor
        model_name, params_cls = BICYCLE_TYPES[bicycle_type]
        base = params or params_cls.create(t_s=t_s)
        self.intersections = [
            SumoIntersection(net, j, model_name=model_name, params=base,
                             capacity=capacity, t_s=t_s,
                             neighbors=neighbors)
            for j in net.non_dead_end_junctions()]
        self.hist_run_time: list[float] = []

    def allocate_road_users(self):
        """Hand users over at every intersection (reference
        allocate_road_users, scenario.py:376-435)."""
        for ins in self.intersections:
            entered, exited = ins.find_entered_exited(self.transport)
            ins.remove_road_users(exited)
            for vid in entered:
                ins.add_road_user(vid, self.transport)

    def step(self):
        t0 = time.perf_counter()
        self.allocate_road_users()
        for ins in self.intersections:
            ins.step()
            ins.push_positions(self.transport)
        self.transport.simulationStep()
        dt = time.perf_counter() - t0
        if self.run_time_factor is not None:
            budget = self.t_s * self.run_time_factor
            if dt < budget:
                time.sleep(budget - dt)
        self.hist_run_time.append(time.perf_counter() - t0)

    def run(self, n_steps=None):
        """Run until SUMO expects no more vehicles (reference
        scenario.py:468-482)."""
        i = 0
        try:
            while self.transport.simulation.getMinExpectedNumber() > 0:
                if n_steps is not None and i >= n_steps:
                    break
                self.step()
                i += 1
        finally:
            self.transport.close()
        return i
