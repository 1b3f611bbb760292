"""Brute-force differential oracle for the periodic neighbor finder.

The sc/bcc/fcc goldens (test_featurizer_golden.py) pin tie semantics on
orthogonal cells only; nothing there exercises skewed / triclinic lattices
where ``_candidate_images``' image bound (featurizer.py:35-40) or the C++
port (native/neighbors.cc) could silently miss periodic images. This is the
pymatgen differential we can run WITHOUT pymatgen (reference behavior:
CGAT/prepare_data.py:146-169, ``get_all_neighbors(radius)`` + 24-NN sort):

* a brute-force oracle enumerates ALL periodic images inside an inflated,
  self-validated image bound (results must be identical at bound+3 and
  bound+6 — a bound bug in the oracle itself fails the test);
* random triclinic lattices — including near-degenerate, high-shear cells
  with interaxial angles far from 90° — times random multi-atom bases;
* compares ``periodic_neighbors`` (numpy AND C++ when built) against the
  oracle on distances, shell indices, and the per-shell neighbor multiset
  (order within an exact tie is free, membership is not);
* hand-built worst-case shear cells where naive cubic image bounds are
  wrong by construction.

Degenerate boundary cases (a distance gap within ~1e-7 of the 1e-8 shell
threshold at the 24-NN cutoff) are resampled: there the selected SET is
floating-point-order dependent in any implementation, and the goldens
already pin exact-tie behavior.
"""
import numpy as np
import pytest

from cgat_tpu.data.featurizer import periodic_neighbors


def _native_available():
    try:
        from cgat_tpu import native
        return native.available()
    except Exception:
        return False


BACKENDS = [False] + ([True] if _native_available() else [])


def brute_force_neighbors(lattice, frac, *, radius=18.0, max_nbr=24,
                          extra=3):
    """Exhaustive full-radius periodic neighbor search (the oracle).

    Enumerates every image in a box inflated ``extra`` cells beyond the
    analytic requirement, independently of the production code path.
    Returns (nbr_idx, shell, dist) like periodic_neighbors, or None when
    some atom has < max_nbr neighbors within the radius.
    """
    A = np.asarray(lattice, np.float64)
    frac = np.asarray(frac, np.float64) % 1.0
    n = len(frac)
    cart = frac @ A
    G = np.linalg.inv(A)
    # images whose ORIGIN CORNER lies within radius + one cell diagonal of
    # any point in the home cell — a deliberately loose bound
    bounds = np.ceil(radius * np.linalg.norm(G, axis=0)).astype(int) + 1 + extra
    ax = [np.arange(-b, b + 1) for b in bounds]
    images = np.stack(np.meshgrid(*ax, indexing="ij"), -1).reshape(-1, 3)
    offsets = images @ A

    nbr_idx = np.empty((n, max_nbr), np.int64)
    shells = np.empty((n, max_nbr), np.int64)
    dists = np.empty((n, max_nbr), np.float64)
    for i in range(n):
        diff = cart[None, :, :] + offsets[:, None, :] - cart[i]
        d = np.sqrt(np.sum(diff * diff, axis=-1)).reshape(-1)
        j_of = np.broadcast_to(np.arange(n)[None, :],
                               (len(offsets), n)).reshape(-1)
        sel = (d <= radius) & (d > 1e-8)
        if sel.sum() < max_nbr:
            return None
        d_sel, j_sel = d[sel], j_of[sel]
        order = np.argsort(d_sel, kind="stable")[:max_nbr]
        dd, jj = d_sel[order], j_sel[order]
        sh = np.empty(max_nbr, np.int64)
        index, prev = 1, dd[0]
        for k in range(max_nbr):
            if dd[k] > prev + 1e-8:
                prev = dd[k]
                index += 1
            sh[k] = index
        nbr_idx[i], shells[i], dists[i] = jj, sh, dd
    return nbr_idx, shells, dists


def _cutoff_is_clean(lattice, frac, *, radius=18.0, max_nbr=24, eps=1e-7):
    """True when the gap at the 24-NN boundary is either an exact tie
    (< 1e-12, handled by the multiset comparison) or decisively above the
    shell threshold — i.e. the selected set is well-defined."""
    out = brute_force_neighbors(lattice, frac, radius=radius,
                                max_nbr=max_nbr + 1, extra=3)
    if out is None:
        return False
    dist = out[2]
    gap = dist[:, max_nbr] - dist[:, max_nbr - 1]
    return bool(np.all((gap < 1e-12) | (gap > eps)))


def _assert_matches_oracle(lattice, frac, use_native, *, radius=18.0,
                           max_nbr=24):
    oracle = brute_force_neighbors(lattice, frac, radius=radius,
                                   max_nbr=max_nbr, extra=3)
    # the oracle validates its own image bound: +3 and +6 must agree
    oracle6 = brute_force_neighbors(lattice, frac, radius=radius,
                                    max_nbr=max_nbr, extra=6)
    if oracle is None or oracle6 is None:
        assert (oracle is None) == (oracle6 is None)
    else:
        np.testing.assert_allclose(oracle[2], oracle6[2], rtol=0, atol=1e-10)

    got = periodic_neighbors(np.asarray(lattice, float),
                             np.asarray(frac, float),
                             radius=radius, max_nbr=max_nbr,
                             use_native=use_native)
    if oracle is None:
        assert got is None
        return
    assert got is not None
    nbr_o, shell_o, dist_o = oracle
    nbr_g, shell_g, dist_g = got
    np.testing.assert_allclose(dist_g, dist_o, rtol=0, atol=1e-9)
    np.testing.assert_array_equal(shell_g, shell_o)
    # neighbor multiset per (atom, shell); order inside a tie is free
    for i in range(len(frac)):
        for s in np.unique(shell_o[i]):
            m = shell_o[i] == s
            assert sorted(nbr_g[i][m]) == sorted(nbr_o[i][m]), (
                f"atom {i} shell {s}: membership differs")


def _random_triclinic(rng, *, min_det=6.0, max_tries=100):
    """Random triclinic cell with bounded conditioning (so the image box
    stays enumerable) but deliberately skewed axes."""
    for _ in range(max_tries):
        A = rng.uniform(-4.0, 4.0, (3, 3))
        det = abs(np.linalg.det(A))
        if det < min_det:
            continue
        lengths = np.linalg.norm(A, axis=1)
        if lengths.min() < 1.5 or lengths.max() > 7.0:
            continue
        if np.linalg.cond(A) > 40.0:
            continue
        return A
    raise RuntimeError("could not sample a usable lattice")


@pytest.mark.parametrize("use_native", BACKENDS)
def test_random_triclinic_matches_brute_force(use_native):
    rng = np.random.default_rng(20260820)
    done = 0
    attempts = 0
    while done < 6 and attempts < 60:
        attempts += 1
        A = _random_triclinic(rng)
        n = int(rng.integers(1, 4))
        frac = rng.uniform(0.0, 1.0, (n, 3))
        # shrink the search radius so the oracle's image box stays small
        # while still spanning many image shells of these ~2-7 A cells
        if not _cutoff_is_clean(A, frac, radius=9.0):
            continue
        _assert_matches_oracle(A, frac, use_native, radius=9.0)
        done += 1
    assert done == 6, f"only {done} clean random cases in {attempts} tries"


@pytest.mark.parametrize("use_native", BACKENDS)
def test_high_shear_cell_matches_brute_force(use_native):
    """Rows nearly parallel: a naive per-axis-length image bound under-counts
    here because the cell is a thin sliver — inv(A) norms blow up and many
    more images carry neighbors than for a cube of equal volume."""
    A = np.array([[3.0, 0.0, 0.0],
                  [2.7, 0.9, 0.0],
                  [2.5, 0.8, 1.1]])
    frac = np.array([[0.0, 0.0, 0.0], [0.37, 0.61, 0.22]])
    assert _cutoff_is_clean(A, frac, radius=9.0)
    _assert_matches_oracle(A, frac, use_native, radius=9.0)


@pytest.mark.parametrize("use_native", BACKENDS)
def test_near_degenerate_sliver_cell(use_native):
    """Extreme anisotropy: one axis 8x shorter than the in-plane extent, a
    stress case for the growing-radius start heuristic AND the image bound."""
    A = np.array([[6.5, 0.0, 0.0],
                  [3.1, 5.8, 0.0],
                  [0.9, 0.7, 0.8]])
    frac = np.array([[0.1, 0.2, 0.3]])
    assert _cutoff_is_clean(A, frac, radius=9.0)
    _assert_matches_oracle(A, frac, use_native, radius=9.0)


@pytest.mark.parametrize("use_native", BACKENDS)
def test_rejection_parity_sparse_crystal(use_native):
    """A cell so large that < 24 neighbors fit inside the radius must be
    rejected by both the oracle and the production path (the reference
    rejects these crystals, prepare_data.py:152-157)."""
    A = np.eye(3) * 25.0
    frac = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    _assert_matches_oracle(A, frac, use_native, radius=9.0)


@pytest.mark.parametrize("use_native", BACKENDS)
def test_shear_equivalent_of_cubic(use_native):
    """A unimodular shear of simple cubic is the SAME crystal (identical
    neighbor distances) in a very skewed description — distances must match
    the cubic goldens exactly even though the cell looks triclinic."""
    a = 3.0
    cub = np.eye(3) * a
    shear = np.array([[1, 0, 0], [2, 1, 0], [5, 3, 1]], np.float64)
    A = shear @ cub                       # same lattice, skewed basis
    out_c = periodic_neighbors(cub, np.zeros((1, 3)), radius=9.0,
                               use_native=use_native)
    out_s = periodic_neighbors(A, np.zeros((1, 3)), radius=9.0,
                               use_native=use_native)
    assert out_c is not None and out_s is not None
    np.testing.assert_allclose(out_s[2], out_c[2], rtol=0, atol=1e-9)
    np.testing.assert_array_equal(out_s[1], out_c[1])
    _assert_matches_oracle(A, np.zeros((1, 3)), use_native, radius=9.0)
