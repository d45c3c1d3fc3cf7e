"""Golden-trajectory parity: the curve scenario -- BalancingRider on a
curved road with edge repulsion (reference scenarios/curve-scenario.py).
Exercises road geometry builders + infrastructure forces + the flagship
dynamics end-to-end against the reference."""

import numpy as np

from parity_common import load_golden


def test_curve_balancingrider():
    import jax

    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.models import MODELS, prepare
    from cyclistsocialforce_tpu.params import (BalancingRiderParams,
                                               RoadElementParams,
                                               as_population)
    from cyclistsocialforce_tpu.road import (RoadSegmentCollection,
                                             build_road_elements)
    from cyclistsocialforce_tpu.state import set_destinations

    golden = load_golden("curve_balancingrider.npz")

    coll = RoadSegmentCollection.chain(
        (0.0, -20.0, np.pi / 2),
        [("straight", 25.0), ("curve", 10.0, np.pi / 2, "right"),
         ("curve", 10.0, np.pi / 2, "left"), ("straight", 20.0)],
        width=5.0, params=RoadElementParams.create(F_0=0.15, sigma=2.0))
    road = build_road_elements([coll])

    st = make_state(np.array([[0.0, -5, np.pi / 2, 5, 0, 0, 0, 0]]),
                    dtype=np.float64)
    st = set_destinations(st, 0, golden["destx"], golden["desty"])
    params = as_population(
        BalancingRiderParams.create(v_desired_default=3.0), 1)
    model = MODELS["balancingrider"]
    st = prepare(model, params, st)
    eng = Engine.create(params, model, road=road)

    n_steps = 2500
    final, out = jax.jit(
        lambda e, s: e.simulate(s, n_steps, record_forces=True))(eng, st)
    traj, fx, fy = (np.asarray(a) for a in out)

    ref = golden["traj_0"]
    perr = np.hypot(traj[:, 0, 0] - ref[0, 1:n_steps + 1],
                    traj[:, 0, 1] - ref[1, 1:n_steps + 1])
    # The road-force vertex sum differs from numpy's accumulation order at
    # the 1e-13 level; the rider's oscillation in the road-edge potential
    # channel amplifies that float noise over time (measured: identical to
    # 1e-12 for 8.6 s, 1e-9 at 15 s, 0.06 m at 25 s -- the same growth any
    # reordering of the reference's own sums produces). Assert exactness
    # over the north-star horizon and boundedness beyond.
    assert np.max(perr[:1500]) < 1e-8, f"15 s err {np.max(perr[:1500])}"
    assert np.max(perr) < 0.2, f"end-to-end err {np.max(perr)}"
    np.testing.assert_allclose(fx[:1500, 0],
                               golden["forces_0"][0, 1:1501], atol=1e-8)
    np.testing.assert_allclose(fy[:1500, 0],
                               golden["forces_0"][1, 1:1501], atol=1e-8)
    # ends where the reference ends (same point on the curve)
    d_end = np.hypot(traj[-1, 0, 0] - ref[0, n_steps],
                     traj[-1, 0, 1] - ref[1, n_steps])
    assert d_end < 0.2, f"endpoint differs by {d_end} m"
