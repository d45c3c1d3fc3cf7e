"""Road infrastructure force parity vs the reference geometry classes."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests/oracle/shims")
sys.path.insert(0, "/root/reference/src")


@pytest.fixture(scope="module")
def ref_classes():
    import matplotlib
    matplotlib.use("Agg")
    from cyclistsocialforce.intersection import (CurvedRoadSegment,
                                                 RoadSegmentCollection,
                                                 StraightRoadSegment)
    return StraightRoadSegment, CurvedRoadSegment, RoadSegmentCollection


def _grid():
    gx, gy = np.meshgrid(np.linspace(-2, 25, 12), np.linspace(-6, 18, 11))
    return gx.flatten(), gy.flatten()


def test_straight_segment_force_parity(ref_classes):
    import jax.numpy as jnp

    from cyclistsocialforce_tpu.ops.forces import road_edge_force
    from cyclistsocialforce_tpu.road import (build_road_elements,
                                             straight_segment)

    Straight, _, _ = ref_classes
    x0 = (0.0, 0.0, 0.3)
    ref = Straight(list(x0), 4.0, 20.0)
    seg = straight_segment(x0, 4.0, 20.0)
    np.testing.assert_allclose(seg.vertices_right,
                               ref.edges[0].vertices, atol=1e-12)
    np.testing.assert_allclose(seg.vertices_left,
                               ref.edges[1].vertices, atol=1e-12)
    np.testing.assert_allclose(seg.x1[:2], ref.x1[:2], atol=1e-12)

    x, y = _grid()
    rfx, rfy = ref.calcRepulsiveForce(x, y)
    road = build_road_elements([seg])
    fx, fy = road_edge_force(jnp.asarray(x), jnp.asarray(y),
                             road.vertices, road.weights, road.F_0,
                             road.sigma)
    np.testing.assert_allclose(np.asarray(fx), rfx, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fy), rfy, atol=1e-10)


@pytest.mark.parametrize("direction", ["left", "right"])
def test_curved_segment_force_parity(ref_classes, direction):
    import jax.numpy as jnp

    from cyclistsocialforce_tpu.ops.forces import road_edge_force
    from cyclistsocialforce_tpu.road import (build_road_elements,
                                             curved_segment)

    _, Curved, _ = ref_classes
    x0 = (1.0, -2.0, 0.7)
    ref = Curved(np.array(x0), 4.0, 10.0, np.pi / 2, direction)
    seg = curved_segment(x0, 4.0, 10.0, np.pi / 2, direction)
    np.testing.assert_allclose(seg.vertices_right,
                               ref.edges[0].vertices, atol=1e-12)
    np.testing.assert_allclose(seg.vertices_left,
                               ref.edges[1].vertices, atol=1e-12)
    np.testing.assert_allclose(seg.x1, ref.x1, atol=1e-12)

    x, y = _grid()
    rfx, rfy = ref.calcRepulsiveForce(x, y)
    road = build_road_elements([seg])
    fx, fy = road_edge_force(jnp.asarray(x), jnp.asarray(y),
                             road.vertices, road.weights, road.F_0,
                             road.sigma)
    np.testing.assert_allclose(np.asarray(fx), rfx, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fy), rfy, atol=1e-10)


def test_collection_chain_and_destinations(ref_classes):
    """A chained collection matches manually chained reference segments
    (the curve-scenario pattern, scenarios/curve-scenario.py)."""
    import jax.numpy as jnp

    from cyclistsocialforce_tpu.ops.forces import road_edge_force
    from cyclistsocialforce_tpu.road import (RoadSegmentCollection,
                                             build_road_elements)

    Straight, Curved, RefColl = ref_classes
    s1 = Straight((0, 0, 0), 4.0, 10.0)
    s2 = Curved(s1.x1, 4.0, 8.0, np.pi / 2, "left")
    s3 = Straight(s2.x1, 4.0, 5.0)
    ref = RefColl([s1, s2, s3])

    coll = RoadSegmentCollection.chain(
        (0, 0, 0), [("straight", 10.0), ("curve", 8.0, np.pi / 2, "left"),
                    ("straight", 5.0)], width=4.0)
    dx, dy = coll.destinations()
    rx, ry = ref.get_destinations_from_segments()
    np.testing.assert_allclose(dx, rx, atol=1e-12)
    np.testing.assert_allclose(dy, ry, atol=1e-12)

    x, y = _grid()
    rfx, rfy = ref.calcRepulsiveForce(x, y)
    road = build_road_elements([coll])
    fx, fy = road_edge_force(jnp.asarray(x), jnp.asarray(y),
                             road.vertices, road.weights, road.F_0,
                             road.sigma)
    np.testing.assert_allclose(np.asarray(fx), rfx, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fy), rfy, atol=1e-10)


def test_engine_with_road_keeps_agent_on_road():
    """End-to-end: a rider on a curved road is pushed away from the edges
    (the curve-scenario integration pattern)."""
    import jax

    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.models import MODELS, prepare
    from cyclistsocialforce_tpu.params import (BicycleParams,
                                               RoadElementParams,
                                               as_population)
    from cyclistsocialforce_tpu.road import (RoadSegmentCollection,
                                             build_road_elements)
    from cyclistsocialforce_tpu.state import set_destinations

    coll = RoadSegmentCollection.chain(
        (0, 0, 0), [("straight", 30.0)], width=6.0,
        params=RoadElementParams.create(F_0=1.0, sigma=2.0))
    road = build_road_elements([coll])

    # start off-center; destination straight ahead
    st = make_state(np.array([[2.0, 1.8, 0.0, 4.0, 0.0]]),
                    dtype=np.float64)
    st = set_destinations(st, 0, (28.0,), (1.8,))
    p = as_population(BicycleParams.create(), 1)
    model = MODELS["bicycle2d"]
    st = prepare(model, p, st)
    eng = Engine.create(p, model, road=road)
    _, traj = jax.jit(lambda e, s: e.simulate(s, 500))(eng, st)
    traj = np.asarray(traj)
    assert np.all(np.isfinite(traj))
    # edge repulsion pushes the rider toward the centerline (y < start)
    assert np.mean(traj[300:, 0, 1]) < 1.8
    assert np.all(np.abs(traj[:, 0, 1]) < 3.0)   # stays on the road


def test_spline_prototype_matches_reference():
    """trajectory.generate_spline_prototype vs the reference's
    generateSplinePrototype (trajectory.py:11-41) on the same points."""
    from cyclistsocialforce.trajectory import generateSplinePrototype

    from cyclistsocialforce_tpu.trajectory import generate_spline_prototype

    x = np.array([0.0, 3.0, 7.0, 12.0, 15.0])
    y = np.array([0.0, 2.0, 1.0, -1.5, 0.5])
    rx, ry = generateSplinePrototype(x, y, 9)
    mx, my = generate_spline_prototype(x, y, 9)
    np.testing.assert_allclose(mx, rx, atol=1e-12)
    np.testing.assert_allclose(my, ry, atol=1e-12)
