"""FOV / priority masking properties and stop/go maneuvers.

Property tests for get_untracked_foes semantics (reference
intersection.py:690-745, incl. the source-indexed hfov quirk) and the
Vehicle.stop()/go() maneuver API (reference vehicle.py:459-535)."""

import jax
import jax.numpy as jnp
import numpy as np

from cyclistsocialforce_tpu import Engine, make_state
from cyclistsocialforce_tpu.models import MODELS, prepare
from cyclistsocialforce_tpu.ops.forces import untracked_foes
from cyclistsocialforce_tpu.params import BicycleParams, as_population
from cyclistsocialforce_tpu.state import go, set_destinations, stop


def test_fov_masks_sources_behind():
    """Receiver facing +x with hfov = 2pi/3 ignores a source behind it and
    tracks one ahead."""
    x = jnp.asarray([0.0, 10.0, -10.0])     # receiver, ahead, behind
    y = jnp.zeros(3)
    psi = jnp.zeros(3)
    u = np.asarray(untracked_foes(x, y, psi, hfov=2 * np.pi / 3))
    # u[i, j]: receiver j does not react to source i
    assert not u[1, 0]   # ahead -> tracked
    assert u[2, 0]       # behind -> untracked
    assert u[0, 0]       # self


def test_hfov_indexed_by_source_quirk():
    """The FOV threshold is the SOURCE's hfov (reference quirk,
    intersection.py:723-739): a narrow-fov source is ignored even when
    the receiver has full vision."""
    x = jnp.asarray([0.0, -10.0])
    y = jnp.zeros(2)
    psi = jnp.zeros(2)
    # receiver 0 has full fov, source 1 (behind) carries a narrow fov
    u = np.asarray(untracked_foes(x, y, psi,
                                  hfov=jnp.asarray([2 * np.pi, 0.5])))
    assert u[1, 0]       # source 1's narrow fov masks it for receiver 0
    u2 = np.asarray(untracked_foes(x, y, psi,
                                   hfov=jnp.asarray([2 * np.pi,
                                                     2 * np.pi])))
    assert not u2[1, 0]  # with full fov it is tracked


def test_priority_to_the_right():
    """Under p2r, sources to the LEFT of the receiver's heading are
    untracked (priority to the right, intersection.py:741-743)."""
    x = jnp.asarray([0.0, 5.0, 5.0])
    y = jnp.asarray([0.0, 5.0, -5.0])     # ahead-left, ahead-right
    psi = jnp.zeros(3)
    u = np.asarray(untracked_foes(x, y, psi, hfov=2 * np.pi,
                                  priority_p2r=True))
    assert u[1, 0]       # left -> has priority -> not reacted to
    assert not u[2, 0]   # right -> tracked


def _rider(stop_flag=0.0):
    st = make_state(np.array([[0.0, 0, 0, 4, 0]]), dtype=np.float64)
    st = set_destinations(st, 0, (60.0,), (0.0,), stop=(stop_flag,))
    p = as_population(BicycleParams.create(), 1)
    model = MODELS["bicycle2d"]
    st = prepare(model, p, st)
    return Engine.create(p, model), st


def test_stop_flag_transient():
    """stop(type 0) flags the CURRENT destination; like the reference, the
    flag is transient -- updateDestination's queue reassignment overwrites
    it (reference vehicle.py:459-470 + 545-594)."""
    eng, st = _rider()
    st = stop(st, 0, stoptype=0)
    assert float(st.dest[0, 2]) == 1.0


def test_stop_destination_halts_with_arrived_state():
    """A stop-flagged QUEUE destination (setDestinations stop=1) makes
    the rider brake through the stopping FSM state and latch 'arrived'."""
    eng, st = _rider(stop_flag=1.0)
    final, traj = jax.jit(lambda e, s: e.simulate(s, 2500))(eng, st)
    traj = np.asarray(traj)
    assert traj[-1, 0, 3] < 0.05                       # v -> 0
    assert bool(np.asarray(final.znav)[0, 2])          # arrived state
    d = np.hypot(traj[-1, 0, 0] - 60.0, traj[-1, 0, 1])
    assert d < 2.0 + 0.5                                # at the stop point
    # the stopping state was traversed on the way (braking profile)
    assert np.min(traj[:, 0, 3]) < 4.0


def test_stop_type1_emergency_brake_point():
    """stop(type 1) redirects to the projected braking point (with the
    reference's swapped sin/cos quirk, vehicle.py:491-492)."""
    eng, st = _rider()
    a_brake = -10.0
    st2 = stop(st, 0, stoptype=1, a_brake=a_brake)
    v = 4.0
    tstop = abs(v / a_brake)
    dstop = 1.1 * (v * tstop + 0.5 * a_brake * tstop**2)
    np.testing.assert_allclose(float(st2.dest[0, 0]),
                               0.0 + dstop * np.sin(0.0), atol=1e-12)
    np.testing.assert_allclose(float(st2.dest[0, 1]),
                               0.0 + dstop * np.cos(0.0), atol=1e-12)
    assert float(st2.dest[0, 2]) == 1.0


def test_stop_then_go_resumes():
    """After halting at a stop destination, go() clears the stop flag
    (un-latching 'arrived' in the FSM) and a fresh destination gets the
    rider moving again (the reference's stop-and-go maneuver,
    vehicle.py:505-535)."""
    eng, st = _rider(stop_flag=1.0)
    mid, _ = jax.jit(lambda e, s: e.simulate(s, 2500))(eng, st)
    assert float(mid.s[0, 3]) < 0.1                    # stopped
    assert bool(np.asarray(mid.znav)[0, 2])
    resumed = go(mid, 0, gotype=0)
    assert float(resumed.dest[0, 2]) == 0.0
    resumed = set_destinations(resumed, 0, (120.0,), (0.0,), reset=True)
    final, traj = jax.jit(lambda e, s: e.simulate(s, 600))(eng, resumed)
    traj = np.asarray(traj)
    assert traj[-1, 0, 3] > 3.0                        # moving again
    assert not bool(np.asarray(final.znav)[0, 2])      # un-arrived


def test_set_spline_destinations():
    """Port of Vehicle.setSplineDestinations (reference vehicle.py:649):
    waypoints densified along a cubic spline, optional stop at the end."""
    from cyclistsocialforce_tpu.state import set_spline_destinations

    _, st = _rider()
    st2 = set_spline_destinations(st, 0, (10.0, 20.0, 30.0),
                                  (5.0, -5.0, 0.0), npoints=8, stop=True,
                                  reset=True)
    q = np.asarray(st2.destqueue[0])
    assert int(st2.nq[0]) == 8
    # spline starts at the rider and ends at the last waypoint
    np.testing.assert_allclose(q[0, :2], [0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(q[7, :2], [30.0, 0.0], atol=1e-9)
    assert q[7, 2] == 1.0 and np.all(q[:7, 2] == 0.0)
    # intermediate points interpolate the waypoints smoothly (monotone x)
    assert np.all(np.diff(q[:8, 0]) > 0)
