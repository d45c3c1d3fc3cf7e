"""Meijaard2007Model shim backed by our validated Whipple implementation
(cyclistsocialforce_tpu.ops.whipple, tested against the published benchmark
matrices and eigenvalues)."""

import numpy as np

from cyclistsocialforce_tpu.ops.whipple import canonical_matrices


class Meijaard2007Model:
    def __init__(self, parameter_set):
        self.parameter_set = parameter_set

    def form_reduced_canonical_matrices(self):
        M, C1, K0, K2 = canonical_matrices(self.parameter_set.parameters)
        return M, C1, K0, K2

    def form_state_space_matrices(self, v=1.0):
        """4-state model x = [phi, delta, phidot, deltadot],
        u = [T_phi, T_delta]; returns (A, B) as numpy arrays."""
        p = self.parameter_set.parameters
        M, C1, K0, K2 = canonical_matrices(p)
        Minv = np.linalg.inv(M)
        A = np.zeros((4, 4))
        A[0:2, 2:4] = np.eye(2)
        A[2:4, 0:2] = -Minv @ (p["g"] * K0 + v**2 * K2)
        A[2:4, 2:4] = -Minv @ C1 * v
        B = np.zeros((4, 2))
        B[2:4, :] = Minv
        return A, B
