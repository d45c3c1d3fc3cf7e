"""InvPendulum yaw step-response vs an independently constructed system.

Port of the reference's in-package unit test
(reference src/cyclistsocialforce/test.py:15-170): simulate a 30 deg yaw
step at constant speed through the model's yaw propagation and compare
against an INDEPENDENTLY built closed-loop state-space system integrated
with scipy -- implementation vs control-theory oracle."""

import numpy as np
import pytest
from scipy.linalg import expm


@pytest.mark.slow
def test_yaw_stepresponse_invpendulum():
    import jax.numpy as jnp

    from cyclistsocialforce_tpu.models import invpendulum
    from cyclistsocialforce_tpu.params import InvPendulumBicycleParams

    params = InvPendulumBicycleParams.create()
    v = 5.0
    t_s = 0.01
    psi_d = np.radians(30.0)
    n_steps = 700

    # ---- independent construction (numpy/scipy only) ----
    l, l_2, g = (float(np.asarray(params.l)), float(np.asarray(params.l_2)),
                 float(np.asarray(params.g)))
    tau1sq = float(np.asarray(params.tau_1_squared))
    c_st = float(np.asarray(params.c_steer))
    i_sv = float(np.asarray(params.i_steer_vertvert))
    K = v * v / (g * l)
    K_tau_2 = v * l_2 / (g * l)
    A = np.zeros((5, 5))
    A[0, 1] = 1.0
    A[1, 1] = -c_st / i_sv
    A[2, 3] = 1.0
    A[3, 0] = -K / tau1sq
    A[3, 1] = -K_tau_2 / tau1sq
    A[3, 2] = 1.0 / tau1sq
    A[4, 0] = v / l
    B = np.zeros(5)
    B[1] = 1.0 / i_sv
    K_x, K_u = params.fullstate_feedback_gains(jnp.asarray(v))
    K_x, K_u = np.asarray(K_x, dtype=float), float(np.asarray(K_u))
    Acl = A - np.outer(B, K_x)
    Bcl = K_u * B
    # exact ZOH discretization via scipy expm
    aug = np.zeros((6, 6))
    aug[:5, :5] = Acl * t_s
    aug[:5, 5] = Bcl * t_s
    e = expm(aug)
    Ad, Bd = e[:5, :5], e[:5, 5]

    x_ref = np.zeros(5)
    ref = []
    for _ in range(n_steps):
        x_ref = Ad @ x_ref + Bd * psi_d
        ref.append(x_ref.copy())
    ref = np.array(ref)

    # ---- the model's propagation ----
    params_b = {f: jnp.asarray(float(np.asarray(getattr(params, f))))
                for f in ("l", "l_2", "g", "tau_1_squared", "c_steer",
                          "i_steer_vertvert")}
    import jax

    def step(x, _):
        x = invpendulum._step_yaw_one(
            params_b, jnp.asarray(K_x), jnp.asarray(K_u),
            jnp.asarray(v), x, jnp.asarray(psi_d), jnp.asarray(t_s))
        return x, x

    # one jitted scan instead of n_steps eager dispatches (the eager
    # loop was 55 s of pure dispatch overhead on this 1-CPU box)
    _, got = jax.jit(lambda x0: jax.lax.scan(step, x0, None,
                                             length=n_steps))(
        jnp.zeros(5, dtype=jnp.float64))
    got = np.asarray(got)

    try:
        np.testing.assert_allclose(got, ref, atol=1e-9)
        # the closed loop actually tracks the commanded yaw
        assert abs(got[-1, 4] - psi_d) < 0.02
        # and the lean returns to upright
        assert abs(got[-1, 2]) < 0.01
    except AssertionError:
        # plot-on-failure diagnostic (reference test.py:120-165): write
        # the steer/roll/yaw comparison figure + the system matrices so
        # a failing oracle is debuggable from the artifact alone
        _dump_failure_diagnostic(got, ref, psi_d, t_s, v, Acl, Bcl,
                                 K_x, K_u)
        raise


def _dump_failure_diagnostic(got, ref, psi_d, t_s, v, Acl, Bcl, K_x, K_u,
                             out_path="/tmp/invpendulum_stepresponse_fail"
                                      ".png"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = np.arange(got.shape[0]) * t_s
    fig, ax = plt.subplots(3, 1, sharex=True, figsize=(7, 8))
    ax[0].set_title("Error in yaw dynamics test!")
    for k, (idx, name) in enumerate(((0, "steer angle"),
                                     (2, "roll angle"),
                                     (4, "yaw angle"))):
        ax[k].plot(t, ref[:, idx], label="reference")
        ax[k].plot(t, got[:, idx], label="implementation")
        ax[k].set_ylabel(name)
    ax[2].plot(t, np.full_like(t, psi_d), "k", label="input")
    ax[2].legend()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    print(f"-- IMPLEMENTATION vs ORACLE diagnostic: {out_path} --")
    print(f"speed: {v}\nAcl =\n{Acl}\nBcl = {Bcl}")
    print(f"gains: K_x = {K_x}  K_u = {K_u}")
