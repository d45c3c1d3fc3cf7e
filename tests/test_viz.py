"""Visualization smoke tests (headless Agg): drawings render, video writes."""

import os
import tempfile

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest


def _scenario(chunk=20):
    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.models import MODELS, prepare
    from cyclistsocialforce_tpu.params import BicycleParams, as_population
    from cyclistsocialforce_tpu.scenario import Scenario
    from cyclistsocialforce_tpu.state import set_destinations

    s0 = np.array([[-6.0, 0, 0, 5, 0], [15.0, -20, np.pi / 2, 5, 0]])
    st = make_state(s0, dtype=np.float64)
    st = set_destinations(st, 0, (35,), (0,))
    st = set_destinations(st, 1, (15,), (20,))
    p = as_population(BicycleParams.create(), 2)
    model = MODELS["bicycle2d"]
    st = prepare(model, p, st)
    return Scenario(Engine.create(p, model), st, chunk=chunk)


def test_bike_drawing_keypoints_pose():
    from cyclistsocialforce_tpu.viz import BicycleDrawing2D

    d = BicycleDrawing2D()
    kp = d.keypoints(2.0, 3.0, np.pi / 2, 0.3)
    # front wheel center sits one wheelbase ahead along psi
    fc = kp["front_wheel"].mean(axis=0)
    np.testing.assert_allclose(fc, [2.0, 3.0 + d.wheelbase], atol=1e-9)
    # handlebar rotated by psi + delta relative to front center
    hb = kp["handlebar"]
    v = hb[1] - hb[0]
    ang = np.arctan2(v[1], v[0])
    np.testing.assert_allclose(ang % np.pi,
                               (np.pi / 2 + 0.3 + np.pi / 2) % np.pi,
                               atol=1e-9)


def test_scene_render_and_roll_warning():
    from cyclistsocialforce_tpu.viz import BicycleDrawing2D, SceneDrawing

    sc = _scenario()
    _, ax = plt.subplots()
    scene = SceneDrawing(ax, labels=["a", "b"])
    artists = scene.render(sc.state)
    assert len(artists) > 10
    # roll warning path executes
    d = BicycleDrawing2D()
    arts = d.draw(ax, 0, 0, 0.0, 0.0, roll=1.0)
    assert len(arts) > 0
    plt.close("all")


def test_car_drawing():
    from cyclistsocialforce_tpu.viz import CarDrawing2D

    _, ax = plt.subplots()
    arts = CarDrawing2D().draw(ax, 1.0, 2.0, 0.5)
    assert len(arts) == 1
    plt.close("all")


def test_plot_states_and_forces():
    import jax

    from cyclistsocialforce_tpu.viz import plot_forces, plot_states

    sc = _scenario()
    final, out = jax.jit(
        lambda e, s: e.simulate(s, 50, record_forces=True))(sc.engine,
                                                            sc.state)
    traj, fx, fy = (np.asarray(a) for a in out)
    plot_states(traj, agent=0)
    plot_forces(fx, fy, agent=1)
    plt.close("all")


def test_write_video():
    from cyclistsocialforce_tpu.viz import write_video

    sc = _scenario(chunk=25)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "run.mp4")
        write_video(sc, 50, path, fps=10, dpi=60,
                    xlim=(-10, 40), ylim=(-25, 25))
        assert os.path.exists(path)
        assert os.path.getsize(path) > 1000
    plt.close("all")


def test_animate_steps_scenario():
    from cyclistsocialforce_tpu.viz import animate

    sc = _scenario(chunk=10)
    anim = animate(sc, 30, xlim=(-10, 40), ylim=(-25, 25))
    # draw all frames headlessly
    anim._init_draw()
    for f in range(3):
        anim._draw_frame(f)
    assert sc.i == 40   # 1 init frame + 3 frames x 10 steps
    plt.close("all")


def test_potential_and_field_golden_parity():
    """eval_potential_field / eval_force_field match the ACTUAL reference
    Bicycle.calcPotential / calcRepulsiveForce on a grid (golden
    field_legacy.npz; reference vehicle.py:1066-1147)."""
    import pytest

    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams, as_population
    from cyclistsocialforce_tpu.viz import (eval_force_field,
                                            eval_potential_field)

    path = os.path.join(os.path.dirname(__file__), "golden",
                        "field_legacy.npz")
    if not os.path.exists(path):
        pytest.skip("golden field_legacy.npz missing")
    g = np.load(path)

    s0 = np.zeros((1, 5))
    s0[0, :5] = g["s"]
    st = make_state(s0, dtype=np.float64)
    p = as_population(BicycleParams.create(), 1)
    eng = Engine.create(p, MODELS["bicycle2d"])   # legacy field

    P = eval_potential_field(g["gx"], g["gy"], st, p, agent=0)
    ok = np.isfinite(g["P"])   # reference NaNs at rho = 0 (no guard)
    np.testing.assert_allclose(P[ok], g["P"][ok], atol=1e-12)

    fx, fy = eval_force_field(g["gx"], g["gy"], engine=eng, state=st)
    ok = np.isfinite(g["Fx"])
    np.testing.assert_allclose(fx[ok], g["Fx"][ok], atol=1e-12)
    np.testing.assert_allclose(fy[ok], g["Fy"][ok], atol=1e-12)


def test_plot_force_field_renders():
    """The curve-scenario-style field figure (contourf + quiver + slice)
    renders headlessly over road + agents."""
    import numpy as np

    from cyclistsocialforce_tpu.params import RoadElementParams
    from cyclistsocialforce_tpu.road import (RoadSegmentCollection,
                                             build_road_elements)
    from cyclistsocialforce_tpu.viz import plot_force_field

    coll = RoadSegmentCollection.chain(
        (0.0, 0.0, 0.0), [("straight", 10.0)], width=4.0,
        params=RoadElementParams.create(F_0=0.5, sigma=2.5))
    road = build_road_elements([coll])
    sc = _scenario()
    axes = plot_force_field((-5, 10), (-5, 10), engine=sc.engine,
                            state=sc.state, road=road, grid_step=0.5,
                            quiver_step=2.0, slice_y=0.0)
    assert len(np.atleast_1d(axes)) == 2
    plt.close("all")


def test_arrow2d_2d_and_3d_projection():
    """Arrow2D draws in 2D axes and in the ground plane of 3D axes, and
    (unlike the reference's WIP version, vizualisation.py:866-1020) can
    be updated in place for animation."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cyclistsocialforce_tpu.viz import Arrow2D

    fig, ax = plt.subplots()
    a = Arrow2D(ax, 1.0, 2.0, 3.0, 0.0, headlength=0.5, headwidth=0.3,
                color="C0")
    # head tip sits at (x+dx, y+dy); head base behind it along the arrow
    head = np.asarray(a.head.get_xy())
    np.testing.assert_allclose(head[0], [4.0, 2.0], atol=1e-12)
    assert np.all(head[1:3, 0] <= 4.0 - 0.5 + 1e-12)  # [3] closes the polygon
    a.update(0.0, 0.0, 0.0, 2.0)
    head = np.asarray(a.head.get_xy())
    np.testing.assert_allclose(head[0], [0.0, 2.0], atol=1e-12)
    fig.canvas.draw()
    plt.close(fig)

    fig = plt.figure()
    ax3 = fig.add_subplot(projection="3d")
    a3 = Arrow2D(ax3, 0.0, 0.0, 1.0, 1.0, headlength=0.3, headwidth=0.2,
                 proj_3d=True, color="C1")
    a3.update(1.0, 1.0, -1.0, 0.5)
    fig.canvas.draw()
    plt.close(fig)


def test_draw_road_renders():
    """Road geometry rendering: surface polygon + edge polylines with the
    reference's styling (reference RoadSegment.draw_element,
    intersection.py:96-116), accepted as collection / list / segment."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cyclistsocialforce_tpu.road import RoadSegmentCollection
    from cyclistsocialforce_tpu.params import RoadElementParams
    from cyclistsocialforce_tpu.viz import SceneDrawing, draw_road

    coll = RoadSegmentCollection.chain(
        (0.0, 0.0, 0.0),
        [("straight", 10.0), ("curve", 5.0, np.pi / 2, "left")],
        width=4.0, params=RoadElementParams.create())
    fig, ax = plt.subplots()
    artists = draw_road(ax, coll)
    # per segment: 1 surface patch + 2 edge lines
    assert len(artists) == 3 * len(coll)
    from matplotlib.patches import Polygon
    assert sum(isinstance(a, Polygon) for a in artists) == len(coll)
    # edge lines sit above the surface fill
    lines = [a for a in artists if not isinstance(a, Polygon)]
    assert all(ln.get_zorder() == 10 for ln in lines)
    plt.close(fig)

    # SceneDrawing underlay survives render() clears
    from cyclistsocialforce_tpu import make_state
    st = make_state(np.zeros((2, 5)))
    fig, ax = plt.subplots()
    sd = SceneDrawing(ax=ax, road_segments=coll)
    n_road = len(sd.road_artists)
    assert n_road == 3 * len(coll)
    sd.render(st)
    sd.render(st)
    assert all(a.axes is ax for a in sd.road_artists)
    plt.close(fig)


def test_fft_img_clear_helpers():
    """plot_fft / fig_to_img / clear_axes (reference utils.py:15-111)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    import pytest

    from cyclistsocialforce_tpu.viz import (clear_axes, fig_to_img,
                                            plot_fft)

    t_s = 0.01
    t = np.arange(0, 2.0, t_s)
    x = np.sin(2 * np.pi * 5.0 * t)          # 5 Hz tone
    axes = plot_fft(t_s, x)                  # scalar t_s form
    line = axes[1].get_lines()[0]
    freqs, mag = line.get_xdata(), line.get_ydata()
    assert freqs[np.argmax(mag)] == pytest.approx(5.0, abs=0.5)
    axes2 = plot_fft(t, x)                   # time-array form
    assert len(axes2) == 2

    fig = axes[0].figure
    img = fig_to_img(fig)
    assert img.ndim == 3 and img.shape[2] == 4 and img.dtype == np.uint8

    clear_axes(axes[0])
    assert not axes[0].get_lines()
    plt.close("all")


@pytest.mark.slow
def test_gridsearch_and_marginal_plots():
    """plot_gridsearch / plot_marginals (reference PoleModel plotting,
    controlbehavior.py:1653-1830) render headless from fit_optimize
    output and a known mixture."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from cyclistsocialforce_tpu.behavior import GMMData
    from cyclistsocialforce_tpu.gmm_fit import fit_optimize
    from cyclistsocialforce_tpu.viz import plot_gridsearch, plot_marginals

    rng = np.random.default_rng(2)
    gmm = GMMData(means=np.array([[0.0, 0.0], [4.0, 2.0]]),
                  covariances=np.stack([np.eye(2), 0.3 * np.eye(2)]),
                  weights=np.array([0.5, 0.5]))
    X, _ = gmm.sample(120, rng)

    _, info = fit_optimize(X, range_components=(1, 3),
                           covariance_types=("full", "diag"),
                           k_crossval=3, n_init=3, n_iter=40)
    axes = plot_gridsearch(info)
    assert len(axes) == 3
    assert axes[0].get_lines()               # one line per cov type

    figs = plot_marginals(gmm, X_train=X[:80], X_test=X[80:], n_grid=24)
    assert len(figs) == 2                    # 2D + 1D panels
    plt.close("all")


def test_density_map_counts_and_means():
    """density_map: exact per-cell counts, per-cell mean of values,
    inactive/outside agents excluded; plot_density renders headless."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from cyclistsocialforce_tpu import make_state
    from cyclistsocialforce_tpu.viz import density_map, plot_density

    # 4x4 grid over [0,4)x[0,4): three agents in cell (0,0), one in
    # (3,2) [x cell 2, y cell 3], one inactive and one outside dropped
    x = np.array([0.1, 0.2, 0.9, 2.5, 0.5, 9.0])
    y = np.array([0.1, 0.8, 0.2, 3.5, 0.5, 1.0])
    active = np.array([True, True, True, True, False, True])
    v = np.array([1.0, 2.0, 3.0, 5.0, 100.0, 100.0])

    H, extent = density_map(x, y, (0, 4), (0, 4), bins=4, active=active)
    assert extent == (0.0, 4.0, 0.0, 4.0)
    assert H.shape == (4, 4)
    assert H[0, 0] == 3.0 and H[3, 2] == 1.0
    assert H.sum() == 4.0                      # inactive + outside dropped

    M, _ = density_map(x, y, (0, 4), (0, 4), bins=4, values=v,
                       active=active)
    np.testing.assert_allclose(M[0, 0], 2.0)   # mean(1, 2, 3)
    np.testing.assert_allclose(M[3, 2], 5.0)
    assert M[1, 1] == 0.0                      # empty cells are 0

    # anisotropic bins: nx=8, ny=2
    H2, _ = density_map(x, y, (0, 4), (0, 4), bins=(8, 2), active=active)
    assert H2.shape == (2, 8)
    assert H2.sum() == 4.0

    st = make_state(np.array([[0.5, 0.5, 0.0, 3.0, 0.0],
                              [2.5, 3.5, 0.0, 5.0, 0.0]]))
    im = plot_density(st, bins=16)
    assert im.get_array().sum() == 2.0
    im2 = plot_density(st, xlim=(0, 4), ylim=(0, 4), bins=4,
                       quantity="speed")
    np.testing.assert_allclose(np.asarray(im2.get_array()).max(), 5.0)
    plt.close("all")
