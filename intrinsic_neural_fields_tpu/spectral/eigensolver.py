"""Laplace-Beltrami eigendecomposition: L phi = lambda M phi.

Three solver paths, all producing M-orthonormal eigenvectors sorted by
ascending eigenvalue (matching scipy's generalized `eigsh` output that the
reference uses, reference mesh.py:140):

  - "shift_invert": scipy ARPACK with sigma=0 on the host. This is the
    semantics oracle and the default for large k (the reference path).
    Retries with L + 1e-10 I when the factorization is exactly singular
    (reference mesh.py:141-149).
  - "dense": eigh of the symmetrically normalized operator
    C = M^{-1/2} L M^{-1/2} (M is diagonal for every Laplacian this
    framework builds), then phi = M^{-1/2} u. Exact; all eigenpairs from one
    factorization. Honest framing: this routes to HOST LAPACK (f64) except
    in a narrow 4096<n<=6000 window where the device f32 eigh is used — the
    device QDWH scratch OOMs beyond ~6-8k rows and f32 accuracy only
    suffices for well-separated spectra. The at-scale device path is
    "chefsi", not "dense".
  - "lobpcg": on-device blocked LOBPCG (jax.experimental.sparse) on the
    spectrally shifted operator sigma I - C, whose LARGEST eigenpairs are the
    SMALLEST of C. Sparse matvec via BCOO; converges for SMALL k only (the
    flipped spectrum has poor gap ratios) — kept as the simple option.
  - "chefsi": Chebyshev-filtered subspace iteration — the at-scale
    on-device path (k in the hundreds to thousands): f32 blocked filter +
    QR + Rayleigh-Ritz on device, a budgeted f64 filter+RR polish on the
    host. Measured in its claimed regime (RESULTS.md "163k vertices"):
    at n=163,842 / k=529 it reaches oracle-grade parity vs ARPACK
    (1.6e-9 eigenvalues, 0.0004 deg subspace angle) but ARPACK's sparse
    LU still wins on wall time there (914 s vs 4010 s on a 1-core host
    — the gap is the host f64 polish, not the device loop). Use it where
    a host LU cannot run (memory/SciPy-less environments) or determinism
    on-device matters; shift_invert stays the default otherwise.
    See _chefsi_device for the measured f32/f64 behavior.
"""
from __future__ import annotations

import os

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


def _ell_arrays(L, inv_sqrt):
    """C = D^{-1/2} L D^{-1/2} in padded-ELL layout: per-row neighbor index
    and weight matrices [n, dmax] (pad: self-index, weight 0). A sparse
    matvec then lowers to one row gather + a small weighted reduction —
    the TPU-friendly formulation (BCOO scatter-adds are much slower)."""
    Lcsr = L.tocsr()
    n = Lcsr.shape[0]
    deg = np.diff(Lcsr.indptr)
    dmax = int(deg.max())
    idx = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, dmax))
    w = np.zeros((n, dmax), dtype=np.float32)
    coo = Lcsr.tocoo()
    order = np.argsort(coo.row, kind="stable")
    rows, cols, vals = coo.row[order], coo.col[order], coo.data[order]
    pos = np.concatenate([[0], np.cumsum(deg)])
    within = np.arange(len(rows)) - pos[rows]
    idx[rows, within] = cols.astype(np.int32)
    w[rows, within] = (vals * inv_sqrt[rows] * inv_sqrt[cols]).astype(np.float32)
    return idx, w


def _chefsi_device(
    L, M, k,
    tol=1e-3, degree=40, buffer_frac=0.2, max_iter=30, seed=0,
    refine=True, refine_degree=60, refine_rounds=12, spmv_bytes_budget=2 << 30,
    refine_filter="device",
):
    """Chebyshev-filtered subspace iteration (CheFSI) on the device, f32,
    with one float64 filter + Rayleigh-Ritz polish on the host.

    Replaces ARPACK shift-invert (reference mesh.py:140) at preprocessing
    scale (k in the hundreds-to-thousands) without factorizing anything:
    every operation is TPU-shaped — blocked sparse matvecs (padded-ELL row
    gathers), tall-skinny QR, and a small dense eigh for the Rayleigh-Ritz
    step. A degree-p Chebyshev polynomial of the normalized operator
    C = M^{-1/2} L M^{-1/2}, scaled to damp [lambda_cut, lambda_max],
    amplifies the wanted low end of the spectrum; iterating
    filter -> QR -> Rayleigh-Ritz converges the k+buffer lowest pairs.

    f32 note (measured, sphere n=10242/k=529): the device iteration stalls
    at relative residual ~1e-3 — the filter's dynamic range across the
    wanted window exceeds f32 — while the IDENTICAL iteration in f64
    converges to machine precision in 3 rounds. So the device does the bulk
    of the work in f32 and the host applies ONE f64 filter application +
    Rayleigh-Ritz to the returned subspace (a few seconds: ~refine_degree
    sparse matvecs + one tall QR), after which eigenvalues/subspace are
    accurate to ~1e-9 relative. Deterministic: seeded start, fixed
    iteration counts given the same inputs.

    refine_filter: where the polish rounds' chained Chebyshev PRE-FILTER
    runs. "device" (default) reuses the f32 device filter kernel between
    the f64 host Rayleigh-Ritz steps; the f32 filter re-injects rounding
    noise into the subspace every round, but the f64 Rayleigh-Ritz resolves
    it — and because each round is then cheap, the budget affords MORE
    rounds, ending at better parity than the all-f64 polish: measured at
    n=163,842/k=529 (RESULTS.md at-scale table), 877.6 s wall with
    eigenvalue parity 1.4e-11 / principal angle < 1e-4 deg — 4.6x faster
    AND more accurate than refine_filter="host" (4010 s, 1.6e-9 / 0.0004
    deg), and faster than ARPACK shift-invert itself at this scale
    (924.1 s). At SMALL n the f32 noise floor binds instead: per-eigenvalue
    parity ~3e-8 relative (tests/test_spectral.py) vs the host path's
    ~1e-9 — use "host" when chasing per-eigenvalue oracle parity below
    preprocessing scale. "host" keeps the chained pre-filter f64 on the
    host — the conservative all-f64 path, roughly half the polish's
    single-core BLAS cost at scale.
    """
    import jax
    import jax.numpy as jnp

    d = _as_diag_array(M)
    inv_sqrt = 1.0 / np.sqrt(d)
    n = L.shape[0]
    m = k + max(int(k * buffer_frac), 16)
    assert m <= n, (k, m, n)
    idx_np, w_np = _ell_arrays(L, inv_sqrt)
    dmax = idx_np.shape[1]

    # The one-shot spmv materializes an [n, dmax, m] gather intermediate
    # (n=400k, dmax~30, m~614 would be ~29GB). Above the HBM budget, chunk
    # the OUTPUT rows with lax.map: each block gathers from the full X but
    # only materializes [chunk, dmax, m]. Row padding uses index 0 with
    # weight 0, and the pad rows are sliced off after.
    one_shot = n * dmax * m * 4
    if one_shot <= spmv_bytes_budget:
        idx, w = jnp.asarray(idx_np), jnp.asarray(w_np)

        def spmv(X):
            # [n, dmax] gather of X rows + weighted reduction over neighbors
            return jnp.einsum("nd,ndm->nm", w, X[idx])
    else:
        chunk = max(1024, int(spmv_bytes_budget // (dmax * m * 4) // 1024 * 1024))
        n_pad = -(-n // chunk) * chunk
        idx_p = np.zeros((n_pad, dmax), np.int32)
        w_p = np.zeros((n_pad, dmax), np.float32)
        idx_p[:n], w_p[:n] = idx_np, w_np
        idx_b = jnp.asarray(idx_p.reshape(-1, chunk, dmax))
        w_b = jnp.asarray(w_p.reshape(-1, chunk, dmax))

        def spmv(X):
            def blk(args):
                ib, wb = args
                return jnp.einsum("nd,ndm->nm", wb, X[ib])

            out = jax.lax.map(blk, (idx_b, w_b))
            return out.reshape(n_pad, -1)[:n]

    key = jax.random.PRNGKey(seed)

    @jax.jit
    def lam_max_fn(v):
        def body(v, _):
            u = spmv(v)
            return u / jnp.linalg.norm(u), None
        v, _ = jax.lax.scan(body, v, None, length=50)
        u = spmv(v)
        return jnp.vdot(v, u) / jnp.vdot(v, v)

    lam_max = float(lam_max_fn(jax.random.normal(key, (n, 1), jnp.float32))) * 1.05

    @jax.jit
    def rayleigh_ritz(Y):
        Q, _ = jnp.linalg.qr(Y)
        H = Q.T @ spmv(Q)
        theta, U = jnp.linalg.eigh(0.5 * (H + H.T))
        X = Q @ U
        R = spmv(X) - X * theta[None, :]
        return X, theta, jnp.linalg.norm(R, axis=0)

    import functools

    @functools.partial(jax.jit, static_argnames=("deg",))
    def cheb_filter(X, lam_cut, deg):
        # Scaled three-term recurrence (Zhou et al. / PARSEC): the polynomial
        # is normalized at lambda=0 so wanted components stay O(1) while
        # [lam_cut, lam_max] is damped.
        e = (lam_max - lam_cut) / 2.0
        c = (lam_max + lam_cut) / 2.0
        sigma1 = e / c
        Y = (spmv(X) - c * X) * (sigma1 / e)

        def body(carry, _):
            Xm1, Yc, sig = carry
            sig_new = 1.0 / (2.0 / sigma1 - sig)
            Yn = 2.0 * (sig_new / e) * (spmv(Yc) - c * Yc) - (sig * sig_new) * Xm1
            return (Yc, Yn, sig_new), None

        (_, Y, _), _ = jax.lax.scan(body, (X, Y, sigma1), None, length=deg - 1)
        # scale-normalize: wanted components grow exp(deg*2*sqrt(cut/max))
        # per application, and badly-conditioned operators need MANY chained
        # applications (see _filter_applications) — keep f32 finite. The
        # subspace is scale-invariant, so this is free.
        return Y / jnp.max(jnp.abs(Y))

    def _filter_applications(lam_cut):
        # A degree-p Chebyshev pass amplifies the wanted end by roughly
        # exp(p * 2 * sqrt(lam_cut / lam_max)) relative to the damped band.
        # Point-cloud Laplacians (tiny Voronoi masses from sampling
        # clusters) reach lam_max/lam_cut ~ 1e4-1e5, where one degree-40
        # pass amplifies by only ~2x — useless. Chain enough applications
        # of the SAME compiled kernel (equivalent to one degree 40*T
        # filter; no recompilation) to reach a fixed per-iteration
        # amplification target of ~e^4.
        per_pass = degree * 2.0 * np.sqrt(max(lam_cut / lam_max, 1e-12))
        return int(np.clip(np.ceil(4.0 / per_pass), 1, 12))

    X = jax.random.normal(jax.random.fold_in(key, 1), (n, m), jnp.float32)
    X, theta, res = rayleigh_ritz(X)
    # Exit when the wanted residuals are small RELATIVE TO THE WANTED
    # EIGENVALUES (res/lam_cut): normalizing by lam_max instead would let a
    # badly-conditioned operator (point-cloud Laplacians reach
    # lam_max/lam_cut ~ 1e4) "converge" while the low pairs are still
    # noise. The f32 iteration can also stall above that target (filter
    # dynamic range beyond f32) — two non-improving rounds hand off to the
    # f64 host polish rather than burning max_iter.
    prev = np.inf
    stalled = 0
    for _ in range(max_iter):
        lam_cut = float(theta[k])
        lam_cut = min(max(lam_cut, 1e-6 * lam_max), 0.9 * lam_max)
        Y = X
        for _ in range(_filter_applications(lam_cut)):
            Y = cheb_filter(Y, lam_cut, degree)
        X, theta, res = rayleigh_ritz(Y)
        r = float(jnp.max(res[:k]))
        if os.environ.get("INF_TPU_EIG_VERBOSE"):
            import sys
            import time as _time

            print(f"[chefsi device] t={_time.time():.0f} res={r:.3e} "
                  f"cut={lam_cut:.3e} target={tol * lam_cut:.3e}",
                  file=sys.stderr, flush=True)
        if r < tol * lam_cut:
            break
        stalled = stalled + 1 if r > 0.9 * prev else 0
        if stalled >= 2:
            break
        prev = min(prev, r)

    X_host = np.asarray(X, dtype=np.float64)
    if refine:
        # f64 polish rounds on the host (filter + Rayleigh-Ritz). The f32
        # subspace can be RANK-DEFICIENT inside near-degenerate clusters
        # (directions lost below the f32 stall floor); filtering alone can
        # never re-create a missing direction (p(C) acts diagonally in the
        # eigenbasis), so the start is re-seeded with small noise and rounds
        # repeat until the wanted residuals hit f64 scale. Typically 1-2
        # rounds; each costs refine_degree sparse matvecs + one tall QR.
        C = (sparse.diags(inv_sqrt) @ L @ sparse.diags(inv_sqrt)).tocsr()
        rng = np.random.RandomState(seed + 1)
        X_host = X_host + 1e-5 * rng.standard_normal(X_host.shape)
        lam_cut = min(max(float(theta[k]), 1e-6 * lam_max), 0.9 * lam_max)

        def cheb_f64(Xh, cut, deg):
            e = (lam_max - cut) / 2.0
            c = (lam_max + cut) / 2.0
            sig = sig1 = e / c
            Y = (C @ Xh - c * Xh) * (sig1 / e)
            Xm1 = Xh
            for _ in range(deg - 1):
                sig_new = 1.0 / (2.0 / sig1 - sig)
                Y, Xm1 = 2.0 * (sig_new / e) * (C @ Y - c * Y) - (sig * sig_new) * Xm1, Y
                sig = sig_new
            return Y

        from scipy.linalg import solve_triangular

        def chol_qr2(X):
            """CholeskyQR2: two rounds of Q = X (chol(X^T X))^-T. All the
            flops are BLAS-3 matmuls — ~2-3x faster than Householder QR on
            the single-core host at tall-skinny [n>=1e5, ~600] shapes, and
            two rounds give Householder-grade orthogonality in f64 as long
            as cond(X) << 1e8 (the filtered iterates are normalized).
            Falls back to np.linalg.qr if the Gram factorization fails."""
            for _ in range(2):
                G = X.T @ X
                try:
                    R = np.linalg.cholesky(G)
                except np.linalg.LinAlgError:
                    return np.linalg.qr(X)[0]
                X = np.ascontiguousarray(
                    solve_triangular(R, X.T, lower=True).T
                )
            return X

        # refine_rounds bounds the f64 polish: each round at n~1e5 costs
        # ~600 GFLOP of single-core host BLAS (~15 min) and contracts the
        # worst wanted residual by ~5-20x — at large n, budget rounds
        # explicitly instead of chasing 1e-8 parity (see RESULTS.md's
        # at-scale table; ARPACK is the right tool when a host LU fits).
        evals = None
        prev_r = np.inf
        stalls = 0
        for _ in range(refine_rounds):
            # same conditioning-adaptive chaining as the device loop, but
            # with a HIGHER amplification target (e^8/round): host rounds
            # pay a large fixed cost (CholQR2 + two [n,m]x[m,m] matmuls ~
            # 250 GFLOP at 163k) on top of the matvecs, so trading matvecs
            # for fewer rounds is a straight win at scale
            per_pass = refine_degree * 2.0 * np.sqrt(max(lam_cut / lam_max, 1e-12))
            passes = int(np.clip(np.ceil(8.0 / per_pass), 1, 12))
            if refine_filter == "device":
                Xf32 = jnp.asarray(X_host, jnp.float32)
                cut32 = jnp.float32(lam_cut)
                for _ in range(passes):
                    Xf32 = cheb_filter(Xf32, cut32, refine_degree)
                Xf = np.asarray(Xf32, dtype=np.float64)
            else:
                Xf = X_host
                for _ in range(passes):
                    Xf = cheb_f64(Xf, lam_cut, refine_degree)
                    Xf = Xf / np.abs(Xf).max()
            Q = chol_qr2(Xf)
            H = Q.T @ (C @ Q)
            theta_h, U = np.linalg.eigh(0.5 * (H + H.T))
            X_host = Q @ U
            evals = theta_h[:k]
            R = C @ X_host[:, :k] - X_host[:, :k] * evals[None, :]
            # wanted-scale relative target (lam_max-relative would declare
            # victory on badly-conditioned operators while the low pairs
            # are still wrong — same reasoning as the device loop); stop
            # early once rounds stop buying anything
            r = np.linalg.norm(R, axis=0).max()
            if os.environ.get("INF_TPU_EIG_VERBOSE"):
                import sys
                import time as _time

                print(f"[chefsi refine] t={_time.time():.0f} res={r:.3e} "
                      f"target={1e-8 * max(np.abs(evals).max(), 1e-12 * lam_max):.3e}",
                      file=sys.stderr, flush=True)
            if r < 1e-8 * max(np.abs(evals).max(), 1e-12 * lam_max):
                break
            # Refresh the Chebyshev window from the current Ritz values
            # BEFORE judging a stall: a round can contract <10% purely
            # because it filtered with a mis-estimated lam_cut inherited
            # from the f32 device loop, and the refresh is what fixes that.
            # Two-strike rule like the device loop — one refreshed retry
            # before concluding rounds stopped buying anything.
            lam_cut = min(max(float(theta_h[k]), 1e-6 * lam_max), 0.9 * lam_max)
            if r > 0.9 * prev_r:
                stalls += 1
                if stalls >= 2:
                    break
            else:
                stalls = 0
            prev_r = min(prev_r, r)
    else:
        evals = np.asarray(theta, dtype=np.float64)[:k]

    phi = X_host[:, :k] * inv_sqrt[:, None]
    return evals, phi


def solve_generalized_eigenproblem(L, M, k, method="shift_invert", **kwargs):
    """k smallest eigenpairs of L phi = lambda M phi, M-orthonormal phi."""
    if method == "shift_invert":
        return _shift_invert(L, M, k)
    if method == "dense":
        return _dense_device(L, M, k)
    if method == "lobpcg":
        return _lobpcg_device(L, M, k, **kwargs)
    if method == "chefsi":
        return _chefsi_device(L, M, k, **kwargs)
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
