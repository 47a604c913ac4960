import os
import tempfile

import numpy as np
import pytest

from intrinsic_neural_fields_tpu.geometry import (
    Mesh,
    load_mesh,
    write_obj,
    write_ply,
)
from intrinsic_neural_fields_tpu.geometry.laplacian import (
    barycentric_mass_matrix,
    cotan_laplacian,
    voronoi_mass_matrix,
)
from intrinsic_neural_fields_tpu.geometry.primitives import cube, grid_mesh, icosphere
from intrinsic_neural_fields_tpu.geometry import cameras


def test_obj_roundtrip(tmp_path):
    m = icosphere(1)
    p = os.path.join(tmp_path, "m.obj")
    write_obj(p, m.vertices, m.faces)
    m2 = load_mesh(p)
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-6)
    np.testing.assert_array_equal(m2.faces, m.faces)


def test_ply_roundtrip(tmp_path):
    m = cube()
    p = os.path.join(tmp_path, "m.ply")
    write_ply(p, m.vertices, m.faces)
    m2 = load_mesh(p)
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-6)
    np.testing.assert_array_equal(m2.faces, m.faces)


def test_obj_polygon_fan(tmp_path):
    p = os.path.join(tmp_path, "quad.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
        f.write("f 1/1 2/2 3/3 4/4\n")
    m = load_mesh(p)
    assert m.num_faces == 2
    np.testing.assert_array_equal(m.faces, [[0, 1, 2], [0, 2, 3]])


def test_face_normals_and_areas():
    m = cube(2.0)
    areas = m.face_areas
    np.testing.assert_allclose(areas, 2.0)  # each half of a 2x2 square face
    norms = np.linalg.norm(m.face_normals, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-12)


def test_mass_matrix_total_area():
    m = icosphere(3)
    total_area = m.face_areas.sum()
    for M in (voronoi_mass_matrix(m.vertices, m.faces), barycentric_mass_matrix(m.vertices, m.faces)):
        assert M.diagonal().min() > 0
        np.testing.assert_allclose(M.diagonal().sum(), total_area, rtol=1e-10)


def test_cotan_laplacian_basic_properties():
    m = icosphere(2)
    L = cotan_laplacian(m.vertices, m.faces)
    # Symmetric, rows sum to zero (constants in the kernel), PSD.
    d = np.abs((L - L.T)).sum()
    assert d < 1e-10
    np.testing.assert_allclose(L @ np.ones(m.num_vertices), 0.0, atol=1e-10)
    x = np.random.default_rng(0).normal(size=(m.num_vertices, 4))
    quad = np.einsum("vi,vi->i", x, L @ x)
    assert np.all(quad > -1e-9)


def test_cotan_laplacian_linear_precision_flat():
    # On an interior vertex of a flat mesh, L applied to a linear function is 0.
    m = grid_mesh(10)
    L = cotan_laplacian(m.vertices, m.faces)
    lin = 2.0 * m.vertices[:, 0] - 3.0 * m.vertices[:, 1] + 1.0
    r = L @ lin
    interior = []
    n = 10
    for row in range(1, n - 1):
        for col in range(1, n - 1):
            interior.append(row * n + col)
    np.testing.assert_allclose(r[interior], 0.0, atol=1e-10)


def test_cam_resize_preserves_center_offset():
    cam = {"K": np.array([[100.0, 0, 31.5, 0], [0, 100.0, 23.5, 0], [0, 0, 1, 0]]),
           "height": 48, "width": 64}
    out = cam_resized = cameras.cam_resize(cam, 24, 32)
    K = out["K"]
    assert out["height"] == 24 and out["width"] == 32
    np.testing.assert_allclose(K[0, 0], 50.0)
    np.testing.assert_allclose(K[1, 1], 50.0)
    # principal point was exactly at the center -> stays at the new center
    np.testing.assert_allclose(K[0, 2], 0.5 * (32 - 1))
    np.testing.assert_allclose(K[1, 2], 0.5 * (24 - 1))


def test_undistort_identity_when_no_distortion():
    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    p = np.array([[10.0, 20.0], [320.0, 240.0], [600.0, 400.0]])
    out = cameras.undistort_pixels_meshroom_radial_k3(p, K, [0.0, 0.0, 0.0])
    np.testing.assert_allclose(out, p, atol=1e-3)


def test_undistort_inverts_distortion():
    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    dist = [-0.1, 0.02, 0.0]
    rng = np.random.default_rng(1)
    p_undist_gt = rng.uniform([100, 100], [540, 380], size=(50, 2))
    # Apply forward distortion in the camera plane, then check we recover.
    pc = (p_undist_gt - K[:2, 2]) / K[0, 0]
    r2 = (pc ** 2).sum(-1)
    factor = 1 + r2 * (dist[0] + r2 * (dist[1] + r2 * dist[2]))
    p_dist = pc * factor[:, None] * K[0, 0] + K[:2, 2]
    rec = cameras.undistort_pixels_meshroom_radial_k3(p_dist, K, dist)
    np.testing.assert_allclose(rec, p_undist_gt, atol=5e-2)
