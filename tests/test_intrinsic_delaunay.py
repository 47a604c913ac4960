import numpy as np

from intrinsic_neural_fields_tpu.geometry.intrinsic_delaunay import intrinsic_delaunay
from intrinsic_neural_fields_tpu.geometry.laplacian import (
    _edge_lengths,
    cotan_laplacian,
    robust_laplacian,
)
from intrinsic_neural_fields_tpu.geometry.mesh import Mesh
from intrinsic_neural_fields_tpu.geometry.primitives import grid_mesh, icosphere


def _bad_quad():
    """A planar quad triangulated against the Delaunay criterion: the long
    diagonal splits two skinny triangles -> a negative cotan weight."""
    v = np.array([
        [0.0, 0.0, 0.0],
        [1.0, 0.05, 0.0],
        [2.0, 0.0, 0.0],
        [1.0, -0.05, 0.0],
    ])
    f = np.array([[0, 1, 3], [1, 2, 3]])  # shares the short edge? no: edge (1,3)
    # edge (1,3) is SHORT here; make the shared edge the LONG one (0,2):
    f = np.array([[0, 1, 2], [0, 2, 3]])
    return v, f


def test_flip_fixes_non_delaunay_edge():
    v, f = _bad_quad()
    lengths = _edge_lengths(v, f)
    f2, l2, flips = intrinsic_delaunay(f, lengths)
    assert flips == 1
    # the new triangulation uses the short diagonal (1,3)
    edges = {tuple(sorted((a, b))) for tri in f2 for a, b in
             [(tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])]}
    assert (1, 3) in edges and (0, 2) not in edges
    # intrinsic lengths of the new diagonal match the planar geometry
    d13 = np.linalg.norm(v[1] - v[3])
    found = [l2[i, j] for i in range(2) for j in range(3)
             if tuple(sorted((f2[i, (j + 1) % 3], f2[i, (j + 2) % 3]))) == (1, 3)]
    np.testing.assert_allclose(found, d13, rtol=1e-10)


def test_delaunay_mesh_untouched():
    m = grid_mesh(8)
    lengths = _edge_lengths(m.vertices, m.faces)
    f2, l2, flips = intrinsic_delaunay(m.faces.astype(np.int64), lengths)
    assert flips == 0
    np.testing.assert_array_equal(f2, m.faces)


def test_robust_laplacian_is_m_matrix():
    """After iDT, every off-diagonal of the cotan Laplacian is <= 0 — the
    defining improvement over the raw cotan operator on bad triangulations."""
    rng = np.random.default_rng(0)
    # a jittered, partly skinny planar triangulation
    m = grid_mesh(10)
    v = m.vertices.copy()
    v[:, :2] += rng.normal(scale=0.03, size=(v.shape[0], 2))
    mesh = Mesh(v, m.faces)

    import scipy.sparse as sparse

    L_raw = cotan_laplacian(mesh.vertices, mesh.faces)
    L_idt, M = robust_laplacian(mesh.vertices, mesh.faces)

    off_raw = (L_raw - sparse.diags(L_raw.diagonal())).toarray()
    off_idt = (L_idt - sparse.diags(L_idt.diagonal())).toarray()
    assert off_raw.max() > 1e-6, "fixture should violate Delaunay pre-flip"
    assert off_idt.max() < 1e-10, "iDT operator must be an M-matrix"
    # rows still sum to zero; PSD preserved
    np.testing.assert_allclose(L_idt @ np.ones(v.shape[0]), 0.0, atol=1e-10)
    assert M.diagonal().min() > 0


def test_sphere_spectrum_preserved_under_idt():
    m = icosphere(2)
    from intrinsic_neural_fields_tpu.geometry.laplacian import build_laplacian
    from intrinsic_neural_fields_tpu.spectral.eigensolver import (
        solve_generalized_eigenproblem,
    )

    L, M = build_laplacian(m, "robust")
    evals, _ = solve_generalized_eigenproblem(L, M, 9, method="shift_invert")
    analytic = [0.0] + [2.0] * 3 + [6.0] * 5
    np.testing.assert_allclose(evals, analytic, atol=0.3)


def test_native_backend_matches_python():
    """The C++ flip core must produce the same triangulation (same assembled
    operator) as the Python reference implementation."""
    import pytest

    from intrinsic_neural_fields_tpu.geometry.laplacian import (
        _edge_lengths,
        _mollify_lengths,
        cotan_laplacian_from_lengths,
    )
    from intrinsic_neural_fields_tpu.geometry.intrinsic_delaunay import (
        build_double_cover,
    )
    from intrinsic_neural_fields_tpu.native import load_idt

    if load_idt() is None:
        pytest.skip("no compiler available for the native backend")

    rng = np.random.default_rng(0)
    m = grid_mesh(20)
    v = m.vertices.copy()
    v[:, :2] += rng.normal(scale=0.01, size=(v.shape[0], 2))
    l = _mollify_lengths(_edge_lengths(v, m.faces))
    fc, lc = build_double_cover(m.faces.astype(np.int64), l)

    f_py, l_py, n_py = intrinsic_delaunay(fc, lc, backend="python")
    f_na, l_na, n_na = intrinsic_delaunay(fc, lc, backend="native")
    assert n_py == n_na
    n = v.shape[0]
    L_py = cotan_laplacian_from_lengths(f_py, l_py, n)
    L_na = cotan_laplacian_from_lengths(f_na, l_na, n)
    assert abs(L_py - L_na).max() < 1e-9


def test_robust_laplacian_on_bowtie_nonmanifold():
    """The regime Sharp & Crane exists for: a nonmanifold vertex+edge 'bowtie'
    of two triangle fans sharing geometry. The robust operator must stay an
    M-matrix with positive mass and a sane spectrum (lambda_0 ~ 0, then
    positive, no NaNs); the raw cotan operator need not."""
    import scipy.sparse as sparse
    from intrinsic_neural_fields_tpu.spectral.eigensolver import (
        solve_generalized_eigenproblem,
    )

    # two squares meeting only at vertex 0 (nonmanifold vertex), plus a fin
    # face re-using edge (0,1) a third time (nonmanifold edge)
    v = np.array(
        [
            [0, 0, 0],
            [1, 0, 0], [1, 1, 0], [0, 1, 0],          # square A
            [-1, 0, 0], [-1, -1, 0], [0, -1, 0],      # square B
            [0.5, 0.2, 0.8],                          # fin apex
        ],
        dtype=np.float64,
    )
    f = np.array(
        [[0, 1, 2], [0, 2, 3], [0, 4, 5], [0, 5, 6], [0, 1, 7]],
        dtype=np.int64,
    )
    L, M = robust_laplacian(v, f)
    off = (L - sparse.diags(L.diagonal())).toarray()
    assert off.max() < 1e-10, "M-matrix property must survive nonmanifold input"
    np.testing.assert_allclose(L @ np.ones(len(v)), 0.0, atol=1e-10)
    assert M.diagonal().min() > 0

    evals, evecs = solve_generalized_eigenproblem(L, M, 4, method="dense")
    assert np.all(np.isfinite(evals)) and np.all(np.isfinite(evecs))
    assert abs(evals[0]) < 1e-8
    assert np.all(np.diff(evals) >= -1e-10) and evals[-1] > 1e-6


def test_robust_laplacian_on_open_grid_boundary():
    """Open (boundary) mesh: the tufted double cover makes boundary edges
    interior, so the operator is an M-matrix and the spectrum matches the
    flat square's Neumann eigenvalues pi^2 (m^2+n^2)."""
    import scipy.sparse as sparse
    from intrinsic_neural_fields_tpu.spectral.eigensolver import (
        solve_generalized_eigenproblem,
    )

    m = grid_mesh(24)
    L, M = robust_laplacian(m.vertices, m.faces)
    off = (L - sparse.diags(L.diagonal())).toarray()
    assert off.max() < 1e-10
    assert M.diagonal().min() > 0
    # total mass ~ area 1 (cover is halved back)
    np.testing.assert_allclose(M.diagonal().sum(), 1.0, rtol=1e-6)

    evals, _ = solve_generalized_eigenproblem(L, M, 5, method="shift_invert")
    pi2 = np.pi ** 2
    np.testing.assert_allclose(
        evals, [0.0, pi2, pi2, 2 * pi2, 4 * pi2], rtol=0.03, atol=0.05
    )
