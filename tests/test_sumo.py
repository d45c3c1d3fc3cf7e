"""SUMO co-simulation bridge: hermetic tests against FakeTraCI.

The reference's co-sim is only exercisable with a live SUMO process
(SURVEY.md section 4 gap); here the whole handover pipeline -- internal-
lane occupancy diffing, state pull, route-spline destinations, engine
stepping, bulk moveToXY push, exit mapping -- runs in-process."""

import numpy as np
import pytest

from cyclistsocialforce_tpu.sumo import (FakeTraCI, SumoCoSimulation,
                                         SumoNetwork)

# minimal 3-leg junction: west->east and south->east routes with internal
# lanes (the structure of demo/config/demoCSFxSUMO.net.xml)
NET_XML = """<?xml version="1.0" encoding="UTF-8"?>
<net version="1.16">
  <edge id=":J_0" function="internal">
    <lane id=":J_0_0" index="0" speed="10" length="16"
          shape="-8.00,0.00 8.00,0.00"/>
  </edge>
  <edge id=":J_1" function="internal">
    <lane id=":J_1_0" index="0" speed="8" length="13.5"
          shape="0.00,-8.00 1.00,-4.00 4.00,-1.00 8.00,0.00"/>
  </edge>
  <edge id="EW" from="JW" to="J" priority="1">
    <lane id="EW_0" index="0" speed="13.89" length="42"
          shape="-50.00,0.00 -8.00,0.00"/>
  </edge>
  <edge id="ES" from="JS" to="J" priority="1">
    <lane id="ES_0" index="0" speed="13.89" length="42"
          shape="0.00,-50.00 0.00,-8.00"/>
  </edge>
  <edge id="EE" from="J" to="JE" priority="1">
    <lane id="EE_0" index="0" speed="13.89" length="42"
          shape="8.00,0.00 50.00,0.00"/>
  </edge>
  <junction id="J" type="priority" x="0.00" y="0.00"
            incLanes="EW_0 ES_0" intLanes=":J_0_0 :J_1_0"
            shape="-8,2 8,2 8,-2 -8,-2"/>
  <junction id="JW" type="dead_end" x="-50" y="0" incLanes="" intLanes=""/>
  <junction id="JS" type="dead_end" x="0" y="-50" incLanes="" intLanes=""/>
  <junction id="JE" type="dead_end" x="50" y="0" incLanes="EE_0"
            intLanes=""/>
  <connection from="EW" to="EE" fromLane="0" toLane="0" via=":J_0_0"/>
  <connection from="ES" to="EE" fromLane="0" toLane="0" via=":J_1_0"/>
</net>
"""


@pytest.fixture
def net():
    return SumoNetwork.parse(NET_XML)


def test_net_parsing(net):
    assert set(net.junctions) == {"J", "JW", "JS", "JE"}
    assert [j.id for j in net.non_dead_end_junctions()] == ["J"]
    assert net.internal_lane_ids("J") == [":J_0_0", ":J_1_0"]
    assert [e.id for e in net.incoming_edges("J")] == ["EW", "ES"]
    assert [e.id for e in net.outgoing_edges("J")] == ["EE"]
    assert net.via_lane("EW", "EE") == ":J_0_0"
    ends = net.lane_end_points(net.edges["EW"], incoming=True)
    assert len(ends) == 1
    # incoming endpoints approach the junction from the west
    assert ends[0][0][-1] == pytest.approx(-8.0, abs=0.5)


def test_reference_demo_net_parses():
    """The parser handles the reference's shipped demo network."""
    import os

    path = "/root/reference/demo/config/demoCSFxSUMO.net.xml"
    if not os.path.exists(path):
        pytest.skip("reference demo net unavailable")
    net = SumoNetwork.parse(path)
    live = net.non_dead_end_junctions()
    assert [j.id for j in live] == ["J27"]
    assert len(net.internal_lane_ids("J27")) == 12
    assert len(net.incoming_edges("J27")) == 3
    assert len(net.outgoing_edges("J27")) == 3


def test_reference_large_net_multi_intersection():
    """The 4-intersection 'large' demo network constructs a working
    multi-intersection co-simulation (reference demoCSFxSUMO-large)."""
    import os

    path = "/root/reference/demo/config/demoCSFxSUMO-large.net.xml"
    if not os.path.exists(path):
        pytest.skip("reference large demo net unavailable")
    net = SumoNetwork.parse(path)
    live = net.non_dead_end_junctions()
    assert len(live) == 4
    t = FakeTraCI(net, step_length=0.01)
    cosim = SumoCoSimulation(net, t, bicycle_type="bicycle", capacity=8)
    assert len(cosim.intersections) == 4
    for ins in cosim.intersections:
        assert ins.internal_lane_ids
        assert ins.in_edges and ins.out_edges
    # steps cleanly with no traffic
    for _ in range(5):
        cosim.step()


def test_packaged_threeleg_net():
    """The SHIPPED 3-leg network (package data, no reference checkout
    needed) parses and runs a full handover roundtrip."""
    from cyclistsocialforce_tpu.sumo import load_packaged_net

    pnet = load_packaged_net("threeleg")
    assert [j.id for j in pnet.non_dead_end_junctions()] == ["J0"]
    assert len(pnet.internal_lane_ids("J0")) == 6
    assert len(pnet.incoming_edges("J0")) == 3
    assert len(pnet.outgoing_edges("J0")) == 3
    # all six turning movements have via lanes
    for a, b in (("WJ", "JE"), ("WJ", "JS"), ("SJ", "JE"),
                 ("SJ", "JW"), ("EJ", "JW"), ("EJ", "JS")):
        assert pnet.via_lane(a, b) is not None, (a, b)

    t = FakeTraCI(pnet, step_length=0.01)
    t.add_vehicle("b0", ("WJ", "JE"), speed=4.0, depart_pos=48.0)
    t.add_vehicle("b1", ("SJ", "JW"), speed=4.0, depart_pos=48.0)
    cosim = SumoCoSimulation(pnet, t, bicycle_type="bicycle", capacity=8)
    entered = set()
    for _ in range(6000):
        if t.simulation.getMinExpectedNumber() == 0:
            break
        cosim.step()
        entered |= set(cosim.intersections[0].road_user_ids())
    assert entered == {"b0", "b1"}
    assert t.simulation.getMinExpectedNumber() == 0


def test_packaged_grid_net_multi_intersection():
    """The shipped 2x2-grid network builds a 4-intersection co-sim and
    routes riders across two junctions each."""
    from cyclistsocialforce_tpu.sumo import load_packaged_net

    pnet = load_packaged_net("grid2x2")
    live = pnet.non_dead_end_junctions()
    assert sorted(j.id for j in live) == ["J00", "J01", "J10", "J11"]
    t = FakeTraCI(pnet, step_length=0.01)
    t.add_vehicle("a0", ("inA", "J00J10", "outA"), speed=5.0,
                  depart_pos=46.0)
    t.add_vehicle("b0", ("inB", "J10J11", "outB"), speed=5.0,
                  depart_pos=46.0)
    cosim = SumoCoSimulation(pnet, t, bicycle_type="bicycle", capacity=8)
    assert len(cosim.intersections) == 4
    visited = {i.id: set() for i in cosim.intersections}
    for _ in range(12000):
        if t.simulation.getMinExpectedNumber() == 0:
            break
        cosim.step()
        for ins in cosim.intersections:
            visited[ins.id] |= set(ins.road_user_ids())
    assert t.simulation.getMinExpectedNumber() == 0
    assert "a0" in visited["J00"] and "a0" in visited["J10"]
    assert "b0" in visited["J10"] and "b0" in visited["J11"]


class RecordingTransport:
    """Canned-session transport with the REAL TraCI call surface.

    Replays a recorded trace of SUMO-side responses (occupancy,
    kinematic state in SUMO conventions: position = lane centerline,
    angle = degrees clockwise from north) and records every call the
    bridge makes, so the traci/libsumo branch's call names, argument
    conventions, and angle conversions are pinned without a SUMO
    install (reference intersection.py:446,680, scenario.py:394-412).
    """

    def __init__(self, occupancy_trace, states):
        self.calls = []
        self._occ = occupancy_trace      # step -> {lane_id: (vids...)}
        self._states = states            # vid -> dict of canned state
        self._step = 0
        rec = self

        class _Lane:
            def getLastStepVehicleIDs(self, lane_id):
                rec.calls.append(("lane.getLastStepVehicleIDs", lane_id))
                k = min(rec._step, len(rec._occ) - 1)
                return rec._occ[k].get(lane_id, ())

        class _Vehicle:
            def getRoute(self, vid):
                rec.calls.append(("vehicle.getRoute", vid))
                return rec._states[vid]["route"]

            def getRouteIndex(self, vid):
                rec.calls.append(("vehicle.getRouteIndex", vid))
                return rec._states[vid]["route_index"]

            def getPosition(self, vid):
                rec.calls.append(("vehicle.getPosition", vid))
                return rec._states[vid]["position"]

            def getAngle(self, vid):
                rec.calls.append(("vehicle.getAngle", vid))
                return rec._states[vid]["angle"]

            def getSpeed(self, vid):
                rec.calls.append(("vehicle.getSpeed", vid))
                return rec._states[vid]["speed"]

            def moveToXY(self, vid, edge_id, lane_index, x, y,
                         angle=None, keepRoute=0):
                rec.calls.append(("vehicle.moveToXY", vid, edge_id,
                                  lane_index, x, y, angle, keepRoute))

        class _Simulation:
            def getMinExpectedNumber(self):
                rec.calls.append(("simulation.getMinExpectedNumber",))
                return 1 if rec._step < len(rec._occ) - 1 else 0

        self.lane = _Lane()
        self.vehicle = _Vehicle()
        self.simulation = _Simulation()

    def simulationStep(self):
        self.calls.append(("simulationStep",))
        self._step += 1

    def close(self):
        self.calls.append(("close",))


def test_recorded_trace_real_traci_surface(net):
    """Drive the co-sim bridge against a canned real-TraCI session:
    asserts the exact call surface crossed per step, the moveToXY
    argument convention (edgeID='', lane=-1, keepRoute=6), and the
    SUMO<->SFM angle conversion both ways."""
    # canned session: b0 sits on internal lane :J_0_0 for 5 steps
    occ = [{} for _ in range(8)]
    for k in range(1, 6):
        occ[k] = {":J_0_0": ("b0",)}
    states = {"b0": {"route": ("EW", "EE"), "route_index": 0,
                     "position": (-7.5, 0.0), "angle": 90.0,
                     "speed": 4.0}}
    t = RecordingTransport(occ, states)
    cosim = SumoCoSimulation(net, t, bicycle_type="bicycle", capacity=4)
    ins = cosim.intersections[0]
    for _ in range(6):
        cosim.step()

    # SUMO angle 90 deg (clockwise from north) == SFM heading 0 (east)
    slot = ins._slots["b0"]
    psi = float(np.asarray(ins.state.s)[slot, 2])
    assert abs(psi) < 0.2, psi

    names = [c[0] for c in t.calls]
    # occupancy is polled for every internal lane every step
    assert names.count("lane.getLastStepVehicleIDs") >= 2 * 6
    # the state pull on entry crosses exactly the reference's call set
    for pull in ("vehicle.getRoute", "vehicle.getRouteIndex",
                 "vehicle.getPosition", "vehicle.getAngle",
                 "vehicle.getSpeed"):
        assert names.count(pull) == 1, pull
    # the SUMO clock advances once per co-sim step
    assert names.count("simulationStep") == 6

    pushes = [c for c in t.calls if c[0] == "vehicle.moveToXY"]
    assert pushes, "no position pushes to SUMO"
    for (_, vid, edge_id, lane_index, x, y, angle, keep) in pushes:
        assert vid == "b0"
        assert edge_id == "" and lane_index == -1   # network mapping mode
        assert keep == 6                            # keepRoute=6
        assert np.isfinite([x, y]).all()
        # pushed angle is in SUMO convention: east ~ 90 deg
        assert 0.0 <= angle < 360.0
        assert abs(angle - 90.0) < 30.0


def test_fake_traci_moves_vehicles(net):
    t = FakeTraCI(net, step_length=0.1)
    t.add_vehicle("b0", ("EW", "EE"), speed=4.0)
    assert t.simulation.getMinExpectedNumber() == 1
    x0 = t.vehicle.getPosition("b0")[0]
    for _ in range(10):
        t.simulationStep()
    x1 = t.vehicle.getPosition("b0")[0]
    assert x1 == pytest.approx(x0 + 4.0, abs=1e-6)
    assert t.vehicle.getAngle("b0") == pytest.approx(90.0)  # east in SUMO
    # runs to completion and despawns
    for _ in range(400):
        t.simulationStep()
    assert t.simulation.getMinExpectedNumber() == 0


def test_fake_traci_internal_lane_occupancy(net):
    t = FakeTraCI(net, step_length=0.1)
    t.add_vehicle("b0", ("EW", "EE"), speed=4.0, depart_pos=41.9)
    t.simulationStep()
    assert t.lane.getLastStepVehicleIDs(":J_0_0") == ("b0",)


def test_cosimulation_handover_roundtrip(net):
    """A bike is handed to the social-force engine on the junction and
    back to SUMO on exit; it finishes its route."""
    t = FakeTraCI(net, step_length=0.01)
    t.add_vehicle("b0", ("EW", "EE"), speed=4.0, depart_pos=40.0)
    cosim = SumoCoSimulation(net, t, bicycle_type="bicycle", capacity=4)
    ins = cosim.intersections[0]

    entered = False
    positions = []
    for _ in range(3000):
        if t.simulation.getMinExpectedNumber() == 0:
            break
        cosim.step()
        if ins.road_user_ids():
            entered = True
            s = np.asarray(ins.state.s)
            positions.append(s[ins._slots["b0"], :2].copy())
    assert entered, "bike never handed over to the social-force engine"
    assert t.simulation.getMinExpectedNumber() == 0, \
        "bike never finished its route"
    assert not ins.road_user_ids(), "bike not removed after exit"
    positions = np.array(positions)
    # while on the intersection the bike crossed from x~-8 to x~+8
    assert positions[0, 0] < -5
    assert positions[-1, 0] > 5
    # motion is continuous (no teleports)
    steps = np.linalg.norm(np.diff(positions, axis=0), axis=1)
    assert steps.max() < 0.2


def test_cosimulation_two_routes_interact(net):
    """Two bikes on crossing routes meet on the junction; both finish and
    the repulsive interaction perturbs the straight-through rider."""
    def run(two):
        t = FakeTraCI(net, step_length=0.01)
        t.add_vehicle("b0", ("EW", "EE"), speed=4.0, depart_pos=38.0)
        if two:
            t.add_vehicle("b1", ("ES", "EE"), speed=4.0, depart_pos=38.0)
        cosim = SumoCoSimulation(net, t, bicycle_type="bicycle",
                                 capacity=4)
        ins = cosim.intersections[0]
        ys = []
        for _ in range(4000):
            if t.simulation.getMinExpectedNumber() == 0:
                break
            cosim.step()
            if "b0" in ins._slots:
                ys.append(float(np.asarray(
                    ins.state.s)[ins._slots["b0"], 1]))
        assert t.simulation.getMinExpectedNumber() == 0
        return np.array(ys)

    solo = run(False)
    both = run(True)
    assert len(solo) > 10 and len(both) > 10
    # the crossing rider pushes b0 off the centerline
    assert np.max(np.abs(both)) > np.max(np.abs(solo)) + 1e-4


def test_cosim_with_neighbor_culling(net):
    """High-capacity co-sim junctions can run the block-sparse culled
    pair stage (NeighborConfig passthrough): same handover trajectories
    as the dense default (domain-covering cutoff => exact)."""
    from cyclistsocialforce_tpu.engine import NeighborConfig

    def run(nb):
        t = FakeTraCI(net, step_length=0.01)
        t.add_vehicle("b0", ("EW", "EE"), speed=4.0, depart_pos=38.0)
        t.add_vehicle("b1", ("ES", "EE"), speed=4.0, depart_pos=38.0)
        # "twowheeler" = the twod force family (homogeneous-Engine
        # culling supports twod; legacy crowds go through MixedEngine)
        cosim = SumoCoSimulation(net, t, bicycle_type="twowheeler",
                                 capacity=8, neighbors=nb)
        ins = cosim.intersections[0]
        pos = []
        for _ in range(4000):
            if t.simulation.getMinExpectedNumber() == 0:
                break
            cosim.step()
            if "b0" in ins._slots:
                pos.append(np.asarray(ins.state.s)[ins._slots["b0"], :2]
                           .copy())
        assert t.simulation.getMinExpectedNumber() == 0
        return np.asarray(pos)

    p_dense = run(None)
    p_culled = run(NeighborConfig(cutoff=1e3, block=8, kb=2,
                                  backend="xla"))
    assert len(p_dense) == len(p_culled) > 0
    np.testing.assert_allclose(p_culled, p_dense, atol=1e-9)
