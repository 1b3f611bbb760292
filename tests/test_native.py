"""Native C++ periodic-kNN vs the numpy reference implementation."""
import numpy as np
import pytest

from cgat_tpu.data.featurizer import periodic_neighbors

native = pytest.importorskip("cgat_tpu.native")
if not native.available():
    pytest.skip("no C++ toolchain", allow_module_level=True)


def test_native_matches_numpy_random_lattices(rng):
    for trial in range(8):
        n = int(rng.integers(2, 16))
        L = np.eye(3) * rng.uniform(3, 6) + rng.standard_normal((3, 3)) * 0.3
        F = rng.random((n, 3))
        nat = native.periodic_knn_native(L, F, radius=18.0, max_nbr=12)
        py = periodic_neighbors(L, F, radius=18.0, max_nbr=12,
                                use_native=False)
        assert (nat is None) == (py is None)
        if nat is None:
            continue
        np.testing.assert_array_equal(nat[1], py[1])       # shells
        np.testing.assert_allclose(nat[2], py[2], atol=1e-9)  # distances
        np.testing.assert_array_equal(nat[0], py[0])       # neighbor ids


def test_native_rejects_sparse_crystal():
    L = np.eye(3) * 40.0
    F = np.zeros((1, 3))
    assert native.periodic_knn_native(L, F, radius=18.0, max_nbr=6) is None


def test_featurizer_dispatches_to_native():
    L = np.eye(3) * 3.0
    F = np.asarray([[0, 0, 0], [0.5, 0.5, 0.5]])
    auto = periodic_neighbors(L, F, radius=18.0, max_nbr=8)
    manual = periodic_neighbors(L, F, radius=18.0, max_nbr=8,
                                use_native=False)
    np.testing.assert_array_equal(auto[0], manual[0])
    np.testing.assert_array_equal(auto[1], manual[1])
