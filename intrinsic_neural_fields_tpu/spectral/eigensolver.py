"""Laplace-Beltrami eigendecomposition: L phi = lambda M phi.

Three solver paths, all producing M-orthonormal eigenvectors sorted by
ascending eigenvalue (matching scipy's generalized `eigsh` output that the
reference uses, reference mesh.py:140):

  - "shift_invert": scipy ARPACK with sigma=0 on the host. This is the
    semantics oracle and the default for large k (the reference path).
    Retries with L + 1e-10 I when the factorization is exactly singular
    (reference mesh.py:141-149).
  - "dense": on-device `jnp.linalg.eigh` of the symmetrically normalized
    operator C = M^{-1/2} L M^{-1/2} (M is diagonal for every Laplacian this
    framework builds), then phi = M^{-1/2} u. Exact, feasible for meshes up
    to a few 10^4 vertices; all eigenpairs come out of one factorization.
  - "lobpcg": on-device blocked LOBPCG (jax.experimental.sparse) on the
    spectrally shifted operator sigma I - C, whose LARGEST eigenpairs are the
    SMALLEST of C. Sparse matvec via BCOO; suited to moderate k on large
    meshes without leaving the device.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sparse
import scipy.sparse.linalg as sla


def _as_diag_array(M):
    d = np.asarray(M.diagonal() if sparse.issparse(M) else np.diag(M), dtype=np.float64)
    offdiag = (M - sparse.diags(d)) if sparse.issparse(M) else (M - np.diag(d))
    nrm = abs(offdiag).sum() if sparse.issparse(M) else np.abs(offdiag).sum()
    if nrm > 1e-12 * abs(d).sum():
        raise ValueError("mass matrix must be diagonal for the on-device solver paths")
    return d


def _arpack_start_vector(n, seed=0):
    """Deterministic, generic ARPACK starting vector.

    ARPACK without v0 starts from a random vector, so the computed eigenbasis
    (a preprocessing artifact) differs run to run, and on degenerate spectra
    (sphere multiplicities) an unlucky start occasionally misconverges to a
    duplicated eigenvalue. A seeded dense random vector is deterministic and
    generic (nonzero component along every eigendirection with probability 1).
    Note all-ones would be the WORST choice here: it is M-orthogonal to every
    non-constant LBO eigenfunction.
    """
    return np.random.RandomState(seed).uniform(-1.0, 1.0, n)


def _shift_invert(L, M, k):
    n = L.shape[0]
    v0 = _arpack_start_vector(n)
    # Raise the Lanczos-basis floor from ARPACK's default 20 so small-k solves
    # on degenerate spectra have room to resolve eigenvalue multiplicities.
    ncv = min(n, max(2 * k + 1, 64))
    try:
        evals, evecs = sla.eigsh(L, k, M, sigma=0, which="LM", v0=v0, ncv=ncv)
    except RuntimeError as e:
        if len(e.args) == 1 and e.args[0] == "Factor is exactly singular":
            # Badly conditioned stiffness matrix: nudge the diagonal
            # (reference mesh.py:141-149).
            L = L + 1e-10 * sparse.eye(L.shape[0])
            evals, evecs = sla.eigsh(L, k, M, sigma=0, which="LM", v0=v0, ncv=ncv)
        else:
            raise
    order = np.argsort(evals)
    return evals[order], evecs[:, order]


def _dense_device(L, M, k):
    import jax.numpy as jnp

    d = _as_diag_array(M)
    inv_sqrt = 1.0 / np.sqrt(d)
    Ld = L.toarray() if sparse.issparse(L) else np.asarray(L)
    C = Ld * inv_sqrt[:, None] * inv_sqrt[None, :]
    # Symmetrize against assembly round-off; f64 only matters on host so we
    # run the device eigh in f32 and fall back to host LAPACK for parity when
    # the matrix is small (f32 eigh loses too much accuracy for tight spectra).
    C = 0.5 * (C + C.T)
    n = C.shape[0]
    # Device eigh (QDWH) needs ~45 n^2 floats of HBM scratch — OOMs beyond
    # ~6-8k on a 16GB chip — and f32 accuracy suffices only for well-separated
    # spectra; host LAPACK covers the small (fast, f64) and the large
    # (memory-safe) regimes.
    if 4096 < n <= 6000:
        evals_j, u_j = jnp.linalg.eigh(jnp.asarray(C, dtype=jnp.float32))
        evals, u = np.asarray(evals_j, dtype=np.float64), np.asarray(u_j, dtype=np.float64)
    else:
        evals, u = np.linalg.eigh(C)
    evals, u = evals[:k], u[:, :k]
    phi = u * inv_sqrt[:, None]
    return evals, phi


def _lobpcg_device(L, M, k, tol=1e-6, maxiter=400, seed=0):
    import jax
    import jax.numpy as jnp
    from jax.experimental import sparse as jsparse
    from jax.experimental.sparse.linalg import lobpcg_standard

    d = _as_diag_array(M)
    inv_sqrt = 1.0 / np.sqrt(d)
    Lcoo = L.tocoo()
    # C = D^{-1/2} L D^{-1/2}, built sparse on the host, shipped as BCOO.
    vals = Lcoo.data * inv_sqrt[Lcoo.row] * inv_sqrt[Lcoo.col]
    C = jsparse.BCOO(
        (jnp.asarray(vals, dtype=jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32),
         jnp.stack([jnp.asarray(Lcoo.row), jnp.asarray(Lcoo.col)], axis=1)),
        shape=L.shape,
    )
    # Gershgorin upper bound on lambda_max(C); sigma I - C flips the spectrum
    # so LOBPCG's largest-eigenpair iteration finds C's smallest.
    row_abs = np.zeros(L.shape[0])
    np.add.at(row_abs, Lcoo.row, np.abs(vals))
    sigma = float(row_abs.max()) * 1.01 + 1e-6

    n = L.shape[0]
    X0 = jax.random.normal(jax.random.PRNGKey(seed), (n, k), dtype=C.data.dtype)

    def A(x):
        return sigma * x - C @ x

    theta, u, _ = lobpcg_standard(A, X0, m=maxiter, tol=tol)
    evals = sigma - np.asarray(theta, dtype=np.float64)
    u = np.asarray(u, dtype=np.float64)
    order = np.argsort(evals)
    evals, u = evals[order], u[:, order]
    phi = u * inv_sqrt[:, None]
    return evals, phi


def solve_generalized_eigenproblem(L, M, k, method="shift_invert", **kwargs):
    """k smallest eigenpairs of L phi = lambda M phi, M-orthonormal phi."""
    if method == "shift_invert":
        return _shift_invert(L, M, k)
    if method == "dense":
        return _dense_device(L, M, k)
    if method == "lobpcg":
        return _lobpcg_device(L, M, k, **kwargs)
    raise ValueError(f"Unknown eigensolver method: {method}")


def compute_first_k_eigenfunctions(
    mesh,
    k,
    laplacian_type="cotan",
    skip_first_efunc=True,
    return_evalues=False,
    method="shift_invert",
):
    """First k LBO eigenfunctions of a mesh (reference mesh.py:120-168).

    Solves for k+1 pairs and drops the constant first eigenfunction by
    default, so k useful functions remain (reference mesh.py:137-163).
    """
    from ..geometry.laplacian import build_laplacian

    L, M = build_laplacian(mesh, laplacian_type)
    evals, efuncs = solve_generalized_eigenproblem(L, M, k + 1, method=method)

    # Non-degeneracy: downstream "standard" rescaling divides by max-min
    # (reference mesh.py:152).
    assert np.all(np.max(efuncs, axis=0) != np.min(efuncs, axis=0))

    if skip_first_efunc:
        efuncs = efuncs[:, 1:]
        evals = evals[1:]
    else:
        efuncs = efuncs[:, :-1]
        evals = evals[:-1]

    if return_evalues:
        return efuncs, evals
    return efuncs


class EigenfuncsProcessor:
    """Offline eigenfunction preprocessing (reference mesh.py:573-587)."""

    def __init__(self, path_to_mesh, k, laplacian_type="cotan", skip_first_efunc=True,
                 method="shift_invert"):
        from ..geometry.mesh import load_mesh

        self.mesh = load_mesh(path_to_mesh)
        self.k = k
        self.laplacian_type = laplacian_type
        efuncs, evalues = compute_first_k_eigenfunctions(
            self.mesh, self.k, laplacian_type, skip_first_efunc=skip_first_efunc,
            return_evalues=True, method=method,
        )
        self.E = efuncs.astype(np.float32)
        self.evalues = evalues.astype(np.float32)

    def get_eigenfunctions(self):
        return self.E

    def get_eigenvalues(self):
        return self.evalues
