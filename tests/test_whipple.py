"""Validate the Whipple-Carvallo implementation against the published
benchmark values of Meijaard et al. (2007), Proc. R. Soc. A 463:1955-1982.

Table 2 of the paper gives the canonical matrices for the benchmark bicycle
to 14 significant digits -- an oracle fully independent of the reference
repo and of the `bicycleparameters` package.
"""

import numpy as np

from cyclistsocialforce_tpu.ops.whipple import (
    MEIJAARD_BENCHMARK,
    canonical_matrices,
    state_space_4,
)

# Meijaard et al. (2007), Table 2 (benchmark canonical matrices).
M_REF = np.array([
    [80.81722, 2.31941332208709],
    [2.31941332208709, 0.29784188199686],
])
K0_REF = np.array([
    [-80.95, -2.59951685249872],
    [-2.59951685249872, -0.80329488458618],
])
K2_REF = np.array([
    [0.0, 76.59734589573222],
    [0.0, 2.65431523794604],
])
def test_benchmark_canonical_matrices():
    M, C1, K0, K2 = canonical_matrices(MEIJAARD_BENCHMARK)
    np.testing.assert_allclose(M, M_REF, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(K0, K0_REF, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(K2, K2_REF, rtol=1e-12, atol=1e-12)
    # C1 is validated indirectly through the eigenvalue benchmarks below
    # (the damping matrix enters every eigenvalue).
    assert C1[0, 0] == 0.0


def test_benchmark_eigenvalues_v5():
    """Meijaard et al. (2007) Table 2: eigenvalues at v = 5 m/s."""
    A, _ = state_space_4(MEIJAARD_BENCHMARK, 5.0)
    eigs = np.sort_complex(np.linalg.eigvals(np.asarray(A)))
    want = np.sort_complex(np.array([
        -14.078388992317794 + 0.0j,
        -0.775341882195845 - 4.464867713788023j,
        -0.775341882195845 + 4.464867713788023j,
        -0.322866429004087 + 0.0j,
    ]))
    np.testing.assert_allclose(eigs, want, atol=1e-6)


def test_benchmark_stability_speeds():
    """The benchmark bicycle is self-stable between the weave speed
    (~4.292 m/s) and the capsize speed (~6.024 m/s) -- Meijaard et al.
    (2007) section 5."""
    def max_real_eig(v):
        A, _ = state_space_4(MEIJAARD_BENCHMARK, v)
        return np.max(np.real(np.linalg.eigvals(np.asarray(A))))

    assert max_real_eig(3.0) > 1e-3       # below weave speed: unstable
    assert max_real_eig(5.0) < 0.0        # in the stable range
    assert max_real_eig(8.0) > 0.0        # above capsize speed: unstable
    # bisect the weave speed and compare with the published value
    lo, hi = 3.0, 5.0
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        if max_real_eig(mid) > 0:
            lo = mid
        else:
            hi = mid
    assert abs(0.5 * (lo + hi) - 4.29238253634111) < 1e-4
