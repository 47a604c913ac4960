"""Native (C++) local-triangulation core vs the Python reference path.

The core (native/localtri.cpp) replaces the per-point qhull loop of
geometry/pointcloud.local_triangulation — the analog of the reference's C++
potpourri3d PointCloudLocalTriangulation (reference mesh.py:19-36). Both
produce per-patch Delaunay triangulations; for points in general position
they agree exactly (cocircular ties may differ), so parity is asserted as
near-identical face sets plus downstream-operator agreement.
"""
import numpy as np
import pytest

from intrinsic_neural_fields_tpu.geometry.pointcloud import (
    local_triangulation,
    point_cloud_laplacian,
)
from intrinsic_neural_fields_tpu.native import load_localtri

pytestmark = pytest.mark.skipif(
    load_localtri() is None, reason="native build unavailable"
)


def _face_set(faces):
    return {tuple(sorted(f)) for f in faces.tolist()}


def _sphere_cloud(n, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.normal(size=(n, 3))
    return p / np.linalg.norm(p, axis=1, keepdims=True)


def test_native_matches_python_face_sets():
    p = _sphere_cloud(2000)
    sn = _face_set(local_triangulation(p, native=True))
    sp = _face_set(local_triangulation(p, native=False))
    jac = len(sn & sp) / len(sn | sp)
    # general-position points: identical up to a handful of cocircular ties
    assert jac > 0.999, jac


def test_native_matches_python_on_anisotropic_patch():
    # noisy torus: curved, anisotropic patches where the tangent-plane choice
    # matters more than on a sphere
    rng = np.random.default_rng(3)
    n = 3000
    th, ph = rng.uniform(0, 2 * np.pi, n), rng.uniform(0, 2 * np.pi, n)
    p = np.stack(
        [
            (2 + 0.7 * np.cos(ph)) * np.cos(th),
            (2 + 0.7 * np.cos(ph)) * np.sin(th),
            0.7 * np.sin(ph),
        ],
        axis=1,
    )
    p += rng.normal(scale=2e-3, size=p.shape)
    sn = _face_set(local_triangulation(p, native=True))
    sp = _face_set(local_triangulation(p, native=False))
    jac = len(sn & sp) / len(sn | sp)
    assert jac > 0.995, jac


def test_downstream_laplacian_spectrum_agrees():
    # the operator consumer: pc Laplacian spectra from the two triangulations
    # must match to tie-breaking noise. The handful of differently-resolved
    # cocircular ties make these DIFFERENT (both valid) discretizations of
    # the same surface, so eigenvalues agree to discretization noise (~1%),
    # not machine precision — the strict parity check is the face-set test.
    import scipy.sparse.linalg as sla

    p = _sphere_cloud(800, seed=1)
    faces_n = local_triangulation(p, native=True)
    faces_p = local_triangulation(p, native=False)
    from intrinsic_neural_fields_tpu.geometry.laplacian import robust_laplacian

    evs = []
    for faces in (faces_n, faces_p):
        L, M = robust_laplacian(p, faces)
        w = sla.eigsh(L, 8, M, sigma=0, which="LM", v0=np.ones(len(p)))[0]
        evs.append(np.sort(w))
    np.testing.assert_allclose(evs[0], evs[1], rtol=2e-2, atol=1e-9)


def test_edge_cases():
    # fewer than 3 points: no faces
    assert local_triangulation(np.zeros((2, 3))).shape == (0, 3)
    # exact duplicates don't crash and produce a triangulation over the
    # distinct locations
    rng = np.random.default_rng(2)
    base = _sphere_cloud(60, seed=2)
    dup = np.repeat(base, 3, axis=0)
    faces = local_triangulation(dup)
    assert len(faces) > 0
    assert (faces >= 0).all() and (faces < len(dup)).all()
    # collinear cloud: degenerate patches yield no faces rather than slivers
    line = np.stack([np.linspace(0, 1, 100), np.zeros(100), np.zeros(100)], 1)
    assert len(local_triangulation(line)) == 0


def test_point_cloud_laplacian_uses_native_by_default():
    p = _sphere_cloud(500, seed=4)
    L, M = point_cloud_laplacian(p)
    # PSD up to roundoff, diagonal mass positive
    assert M.diagonal().min() > 0
    x = np.random.default_rng(0).normal(size=len(p))
    assert x @ (L @ x) > -1e-8
