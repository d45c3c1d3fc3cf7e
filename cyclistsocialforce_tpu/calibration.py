"""Model calibration against observed trajectories.

TPU-native re-design of the reference calibration stack
(reference calibration.py:27-624): `CalibrationData` holds observed tracks
(initial state, per-step input forces, objective states); calibration
replays each track through a vehicle model driven by the RECORDED forces
and minimizes a trajectory error over model parameters with Nelder-Mead
(`scipy.optimize.fmin`, reference calibration.py:472-526).

Where the reference re-simulates every track in a nested Python loop PER
SIMPLEX CANDIDATE (calibration.py:397-470), here all K tracks advance
simultaneously as one [K]-agent population under one `lax.scan`, the
objective is a single jitted call, and `evaluate_population` vmaps the
whole replay over a candidate axis -- the embarrassing parallelism noted
in SURVEY.md section 3.5 made explicit.

Error functions match the reference exactly (SSE over timesteps,
calibration.py:27-51; MAE-SSE over samples, calibration.py:53-77), with
padding masks replacing the ragged per-track lists. `fix_speed` clamps the
model speed to the observed desired speed before every step
(calibration.py:448-452).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from cyclistsocialforce_tpu.params import as_population
from cyclistsocialforce_tpu.state import V, make_state


@dataclass
class CalibrationData:
    """Stacked observed tracks (reference CalibrationData,
    calibration.py:111-240).

    s0 : [K, <=8] initial states
    inputs : [K, T, 2] recorded input forces (padded)
    objectives : [K, T, F] objective state observations (padded)
    lengths : [K] valid steps per track
    """

    s0: np.ndarray
    inputs: np.ndarray
    objectives: np.ndarray
    lengths: np.ndarray

    @classmethod
    def from_tracks(cls, tracks):
        """tracks: iterable of (s0, inputs [T_k, 2], objectives [T_k, F])."""
        tracks = [(np.asarray(s, dtype=float), np.asarray(i, dtype=float),
                   np.asarray(o, dtype=float)) for s, i, o in tracks]
        t_max = max(i.shape[0] for _, i, _ in tracks)
        k = len(tracks)
        f = tracks[0][2].shape[1]
        d = max(s.shape[0] for s, _, _ in tracks)
        s0 = np.zeros((k, d))
        inputs = np.zeros((k, t_max, 2))
        objectives = np.zeros((k, t_max, f))
        lengths = np.zeros((k,), dtype=np.int32)
        for j, (s, i, o) in enumerate(tracks):
            s0[j, :s.shape[0]] = s
            inputs[j, :i.shape[0]] = i
            objectives[j, :o.shape[0]] = o
            lengths[j] = i.shape[0]
        return cls(s0, inputs, objectives, lengths)

    def __len__(self):
        return self.s0.shape[0]

    def split(self, train_fraction=0.8, rng=None):
        """Random train/test partition (reference random partitioning,
        calibration.py:200-240)."""
        rng = rng or np.random.default_rng()
        k = len(self)
        perm = rng.permutation(k)
        n_train = max(1, int(round(train_fraction * k)))
        tr, te = perm[:n_train], perm[n_train:]

        def take(idx):
            return CalibrationData(self.s0[idx], self.inputs[idx],
                                   self.objectives[idx], self.lengths[idx])

        return take(tr), take(te)


# --------------------------------------------------------------------------
# error functions (reference calibration.py:27-77), masked
# --------------------------------------------------------------------------


def sse_timesteps(outputs, objectives, mask):
    """Sum of squared errors over all valid timesteps and tracks."""
    return jnp.sum(((outputs - objectives) ** 2) * mask[..., None])


def maesse_samples(outputs, objectives, mask):
    """Sum over tracks of (mean absolute error per track)^2."""
    ae = jnp.abs(outputs - objectives) * mask[..., None]
    n = jnp.maximum(jnp.sum(mask, axis=1), 1) * outputs.shape[-1]
    mae = jnp.sum(ae, axis=(1, 2)) / n
    return jnp.sum(mae ** 2)


ERROR_FUNCS = {"sse": sse_timesteps, "maesse": maesse_samples}


# --------------------------------------------------------------------------
# the calibration
# --------------------------------------------------------------------------


@dataclass
class Calibration:
    """Nelder-Mead parameter calibration (reference
    DownhillSimplexCalibration, calibration.py:243-624).

    Parameters
    ----------
    model : model module (models.MODELS[...])
    params : base params pytree; fitted fields are replaced per candidate.
    params_keys : list of param field names to fit.
    train_data / test_data : CalibrationData
    objective_features : state-vector indices compared against the
        objectives (e.g. (0, 1) for x/y -- the reference's boolean
        indicator over traj rows, calibration.py:345-350).
    error : "sse" | "maesse" | callable(outputs, objectives, mask).
    fix_speed : clamp speed to |input force| before each step
        (calibration.py:448-452).
    params_auxfuncs : optional per-key callables mapping the FULL optimizer
        vector to that field's value (reference calibration.py:364-395),
        e.g. assembling a complex pole set from real/imag entries. Must be
        jax-traceable.
    """

    model: Any
    params: Any
    params_keys: list
    train_data: CalibrationData
    test_data: CalibrationData | None = None
    objective_features: tuple = (0, 1)
    error: Any = "sse"
    fix_speed: bool = True
    maxiter: int = 100
    params_auxfuncs: list | None = None
    verbose: bool = True
    result: dict = field(default_factory=dict)

    def __post_init__(self):
        self._err = (ERROR_FUNCS[self.error]
                     if isinstance(self.error, str) else self.error)
        self._objective_jit = {}

    # ---- core replay ----

    def _candidate_params(self, vals):
        vals = jnp.asarray(vals)
        upd = {}
        for j, key in enumerate(self.params_keys):
            if self.params_auxfuncs is not None:
                upd[key] = self.params_auxfuncs[j](vals)
            else:
                upd[key] = vals[j]
        return self.params.replace(**upd)

    def simulate(self, params, data: CalibrationData):
        """Replay all tracks of `data` under `params`; returns outputs
        [K, T, F] aligned with the objectives (output row t = state after
        t steps; row 0 = initial state, matching the reference's
        traj[:, :n] comparison, calibration.py:466-468)."""
        k = len(data)
        state = make_state(jnp.asarray(data.s0), dtype=jnp.float64)
        pop = as_population(params, k)
        prep = getattr(self.model, "prepare", None)
        if prep is not None:
            state = prep(pop, state)
        inputs = jnp.asarray(data.inputs)          # [K, T, 2]
        feats = jnp.asarray(self.objective_features)

        def body(st, u):
            if self.fix_speed:
                vfix = jnp.sqrt(u[:, 0] ** 2 + u[:, 1] ** 2)
                st = st.replace(s=st.s.at[:, V].set(vfix),
                                dyn_v=vfix)
            st2 = self.model.step(pop, st, u[:, 0], u[:, 1])
            return st2, st2.s[:, feats]

        _, out = jax.lax.scan(body, state, jnp.swapaxes(inputs, 0, 1))
        out = jnp.swapaxes(out, 0, 1)               # [K, T, F]
        first = state.s[:, feats][:, None, :]
        return jnp.concatenate([first, out[:, :-1]], axis=1)

    def _objective(self, data: CalibrationData):
        key = id(data)
        fn = self._objective_jit.get(key)
        if fn is None:
            objectives = jnp.asarray(data.objectives)
            mask = (jnp.arange(data.inputs.shape[1])[None, :]
                    < jnp.asarray(data.lengths)[:, None]).astype(
                        objectives.dtype)

            def obj(vals):
                p = self._candidate_params(vals)
                out = self.simulate(p, data)
                return self._err(out, objectives, mask)

            fn = jax.jit(obj)
            self._objective_jit[key] = fn
        return fn

    def objective(self, vals, test=False):
        data = self.test_data if test else self.train_data
        return float(self._objective(data)(jnp.asarray(vals,
                                                       dtype=jnp.float64)))

    def evaluate_population(self, candidates):
        """Errors for a [C, P] candidate batch in one vmapped call --
        the batched replacement for the reference's per-candidate Python
        re-simulation (calibration.py:438-460)."""
        fn = self._objective(self.train_data)
        return np.asarray(jax.vmap(fn)(jnp.asarray(candidates,
                                                   dtype=jnp.float64)))

    # ---- optimize ----

    def run(self, guess):
        """Nelder-Mead from `guess` (reference run, calibration.py:472-526:
        scipy.optimize.fmin with maxiter)."""
        from scipy.optimize import fmin

        fn = self._objective(self.train_data)

        def f(v):
            return float(fn(jnp.asarray(v, dtype=jnp.float64)))

        xopt, fopt, n_iter, n_calls, flag = fmin(
            f, np.asarray(guess, dtype=float), maxiter=self.maxiter,
            full_output=True, disp=self.verbose)
        self.result = {"x": xopt, "error": float(fopt), "iters": int(n_iter),
                       "calls": int(n_calls), "converged": flag == 0}
        if self.verbose:
            print(f"calibration: error={fopt:.6g} after {n_iter} "
                  f"iterations ({n_calls} evaluations)")
        return xopt, self.result

    def per_track_errors(self, vals=None, test=True):
        """Per-track errors over the valid steps, using the calibration's
        configured error function applied track-by-track: the reference
        prints / plots per-test-sample results (calibration.py:528-623);
        this is the tabular half. For the shipped error functions (sse,
        maesse) the per-track values sum to the full objective. Returns
        (errors [K], outputs [K, T, F])."""
        data = self.test_data if test else self.train_data
        if data is None:
            raise ValueError("no test data")
        if vals is None:
            vals = self.result["x"]
        p = self._candidate_params(jnp.asarray(vals, dtype=jnp.float64))
        out = self.simulate(p, data)
        objectives = jnp.asarray(data.objectives)
        mask = (jnp.arange(data.inputs.shape[1])[None, :]
                < jnp.asarray(data.lengths)[:, None]).astype(
                    objectives.dtype)
        errs = np.asarray([
            float(self._err(out[j:j + 1], objectives[j:j + 1],
                            mask[j:j + 1]))
            for j in range(len(data))])
        return errs, np.asarray(out)

    def test(self, vals=None, plot=False, color="blue", axes=None,
             name=None, plot_inref=True):
        """Error on the test partition for `vals` (default: the optimum),
        reference test (calibration.py:528-623).

        With `plot=True`, also draws the reference's result diagnostic --
        one subplot per test track overlaying the measured objective
        (gray), the simulated trajectory under the calibrated parameters
        (`color`), and, for a heading objective with `plot_inref`, the
        input-force direction (gray dashed) -- and returns
        (error, figure). Angle features (state index 2, psi) are shown
        in degrees relative to the track's initial heading, exactly like
        the reference's `to_deg(traj - s0[2])`; other features are shown
        raw vs step index. `axes` (length K) plots into an existing
        figure so several calibrations can be compared (the reference's
        color/name/axes reuse)."""
        if self.test_data is None:
            raise ValueError("no test data")
        if vals is None:
            vals = self.result["x"]
        # ONE replay serves the table, the total, and the plot; for the
        # shipped additive error functions the per-track values sum to
        # the objective (a custom non-additive callable falls back to
        # one extra objective() evaluation)
        errs, out = self.per_track_errors(vals)
        err = (float(errs.sum()) if isinstance(self.error, str)
               else self.objective(vals, test=True))
        label = self.error if isinstance(self.error, str) else "error"
        if self.verbose:
            for j, e in enumerate(errs):
                print(f"    test track {j}: {label} {e:.4f} "
                      f"({int(self.test_data.lengths[j])} steps)")
            print(f"    {label}: {err:.4f}")
        if not plot:
            return err
        import matplotlib.pyplot as plt

        data = self.test_data
        k = len(data)
        feats = tuple(self.objective_features)
        if axes is None:
            fig, axes = plt.subplots(1, k, sharey=True, squeeze=False,
                                     figsize=(3 * k, 3))
            axes = axes[0]
        else:
            fig = axes[0].figure
        for j, ax in enumerate(axes[:k]):
            t = int(data.lengths[j])
            for fi, feat in enumerate(feats):
                if feat == 2:   # heading: degrees relative to psi_0
                    ref0 = float(data.s0[j, 2])
                    scale = 180.0 / np.pi
                    obj = (data.objectives[j, :t, fi] - ref0) * scale
                    sim = (out[j, :t, fi] - ref0) * scale
                    if plot_inref:
                        uin = data.inputs[j, :t]
                        ax.plot((np.arctan2(uin[:, 1], uin[:, 0]) - ref0)
                                * scale, color="gray", linestyle="--",
                                label="reference input" if fi == 0
                                else None)
                else:
                    obj = data.objectives[j, :t, fi]
                    sim = out[j, :t, fi]
                ax.plot(obj, color="gray",
                        label="measurement" if fi == 0 else None)
                ax.plot(sim, color=color,
                        label=name if fi == 0 else None)
            ax.set_title(f"track {j}")
            ax.set_xlabel("step")
        if name or plot_inref:
            axes[0].legend(fontsize=7)
        return err, fig
