import numpy as np
import pytest
import jax.numpy as jnp

from intrinsic_neural_fields_tpu.geometry.primitives import cube, icosphere
from intrinsic_neural_fields_tpu.ops import (
    hit_points_xyz,
    intersect_rays,
    intersect_rays_numpy,
    interpolate_vertex_features,
    pixel_grid_coords,
    ray_origins_and_directions,
)


def _look_at_cam(eye, target=np.zeros(3), up=np.array([0.0, 0.0, 1.0])):
    """OpenCV-convention camera-to-world: +z forward, +x right, +y down."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-8:
        right = np.array([1.0, 0.0, 0.0])
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=-1)
    return np.concatenate([R, eye[:, None]], axis=-1).astype(np.float32)  # 3x4


def _simple_K(H, W, f=1.2):
    return np.array(
        [[f * W, 0, (W - 1) / 2.0], [0, f * W, (H - 1) / 2.0], [0, 0, 1.0]],
        dtype=np.float32,
    )


def test_ray_gen_center_pixel_points_forward():
    H = W = 33
    cam = _look_at_cam(np.array([0.0, -3.0, 0.0]))
    K = _simple_K(H, W)
    coords = pixel_grid_coords(H, W)
    o, d = ray_origins_and_directions(cam, K, coords)
    o, d = np.asarray(o), np.asarray(d)
    center = (H // 2) * W + W // 2
    np.testing.assert_allclose(o[center], [0, -3, 0], atol=1e-6)
    np.testing.assert_allclose(d[center], [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_sphere_hit_distance_analytic():
    m = icosphere(4)  # fine sphere, radius 1
    eye = np.array([0.0, -3.0, 0.0])
    cam = _look_at_cam(eye)
    K = _simple_K(65, 65)
    coords = pixel_grid_coords(65, 65)
    o, d = ray_origins_and_directions(cam, K, coords)
    hits = intersect_rays(
        jnp.asarray(m.vertices, jnp.float32), jnp.asarray(m.faces), o, d
    )
    t = np.asarray(hits.t)
    valid = np.asarray(hits.valid)
    center = (65 // 2) * 65 + 65 // 2
    assert valid[center]
    # center ray hits the sphere head-on at distance |eye| - 1
    assert abs(t[center] - 2.0) < 5e-3
    assert valid.sum() > 0.2 * valid.size


def test_xla_intersection_matches_numpy_oracle(rng):
    m = icosphere(2)
    R = 500
    origins = rng.normal(size=(R, 3)) * 0.1 + np.array([0, -4.0, 0])
    targets = rng.normal(size=(R, 3)) * 0.5
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    t0, f0, b0, v0 = intersect_rays_numpy(m.vertices, m.faces, origins, dirs)
    hits = intersect_rays(
        jnp.asarray(m.vertices, jnp.float32),
        jnp.asarray(m.faces),
        jnp.asarray(origins, jnp.float32),
        jnp.asarray(dirs, jnp.float32),
    )
    v1 = np.asarray(hits.valid)
    # Hit/miss agreement except possibly on razor-edge grazing rays
    assert (v0 != v1).mean() < 0.01
    both = v0 & v1
    np.testing.assert_allclose(np.asarray(hits.t)[both], t0[both], rtol=1e-3, atol=1e-4)
    same_face = np.asarray(hits.face_idx)[both] == f0[both]
    # ties along shared edges can pick either face; positions must still agree
    p_xla = hit_points_xyz(
        jnp.asarray(m.vertices, jnp.float32),
        jnp.asarray(m.faces)[np.asarray(hits.face_idx)[both]],
        jnp.asarray(hits.bary)[both],
    )
    p_np = np.einsum(
        "bj,bjk->bk", b0[both], m.vertices[m.faces[f0[both]]]
    )
    np.testing.assert_allclose(np.asarray(p_xla), p_np, atol=2e-4)
    assert same_face.mean() > 0.99


def test_cube_face_and_barycentric_exactness():
    m = cube(2.0)  # faces at +-1
    # ray along +x hitting the x=+1 face at a known point
    origins = np.array([[-5.0, 0.2, 0.3]], dtype=np.float32)
    dirs = np.array([[1.0, 0.0, 0.0]], dtype=np.float32)
    hits = intersect_rays(
        jnp.asarray(m.vertices, jnp.float32), jnp.asarray(m.faces), origins, dirs
    )
    assert bool(hits.valid[0])
    np.testing.assert_allclose(float(hits.t[0]), 4.0, rtol=1e-5)
    p = hit_points_xyz(
        jnp.asarray(m.vertices, jnp.float32),
        jnp.asarray(m.faces)[hits.face_idx],
        hits.bary,
    )
    np.testing.assert_allclose(np.asarray(p)[0], [-1.0, 0.2, 0.3], atol=1e-5)


def test_interpolation_exact_at_vertices():
    m = icosphere(1)
    E = np.random.default_rng(0).normal(size=(m.num_vertices, 7)).astype(np.float32)
    vids = jnp.asarray(m.faces[:5])
    bary = jnp.asarray(np.eye(3)[np.array([0, 1, 2, 0, 1])], jnp.float32)
    out = interpolate_vertex_features(jnp.asarray(E), vids, bary)
    expected = E[m.faces[:5][np.arange(5), np.array([0, 1, 2, 0, 1])]]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_miss_rays_flagged_invalid():
    m = icosphere(2)
    origins = np.array([[0.0, -5.0, 0.0]], dtype=np.float32)
    dirs = np.array([[0.0, -1.0, 0.0]], dtype=np.float32)  # points away
    hits = intersect_rays(
        jnp.asarray(m.vertices, jnp.float32), jnp.asarray(m.faces), origins, dirs
    )
    assert not bool(hits.valid[0])
    assert int(hits.face_idx[0]) == -1


@pytest.mark.slow
def test_shared_origin_and_mxu_variants_match_base():
    """shared_origin hoists the origin contractions (renderer/preprocess fast
    path); mxu moves the direction contractions onto the matrix unit. Both
    must reproduce the base path: identical hit decisions, t bit-equal for
    shared_origin (same arithmetic), bary within f32 re-association error."""
    from intrinsic_neural_fields_tpu.ops.ray_gen import (
        pixel_grid_coords,
        ray_origins_and_directions,
    )

    m = icosphere(3)
    H = W = 48
    cam = np.eye(4, dtype=np.float32)[:3]
    cam[2, 3] = -3.0
    K = np.array([[1.2 * W, 0, W / 2], [0, 1.2 * W, H / 2], [0, 0, 1]], np.float32)
    o, d = ray_origins_and_directions(cam, K, pixel_grid_coords(H, W))
    o, d = np.asarray(o), np.asarray(d)
    v, f = jnp.asarray(m.vertices, jnp.float32), jnp.asarray(m.faces)

    base = intersect_rays(v, f, o, d)
    shared = intersect_rays(v, f, o, d, shared_origin=True)
    assert np.array_equal(np.asarray(base.valid), np.asarray(shared.valid))
    assert np.array_equal(np.asarray(base.face_idx), np.asarray(shared.face_idx))
    assert np.array_equal(np.asarray(base.t), np.asarray(shared.t))
    assert np.abs(np.asarray(base.bary) - np.asarray(shared.bary)).max() < 1e-5

    for kw in ({"mxu": True}, {"shared_origin": True, "mxu": True}):
        alt = intersect_rays(v, f, o, d, **kw)
        both = np.asarray(base.valid) & np.asarray(alt.valid)
        assert (np.asarray(base.valid) == np.asarray(alt.valid)).mean() > 0.999
        assert (
            np.asarray(base.face_idx)[both] == np.asarray(alt.face_idx)[both]
        ).mean() > 0.999
        assert np.abs(np.asarray(base.t)[both] - np.asarray(alt.t)[both]).max() < 1e-4


def test_native_bvh_matches_numpy_oracle(rng):
    """The C++ BVH host tracer must reproduce the numpy oracle: identical
    hit/miss and face selection (incl. lowest-face-index tie-breaks), t and
    barycentrics to f64 reassociation tolerance (~1e-13)."""
    from intrinsic_neural_fields_tpu.ops import HostBVH

    m = icosphere(3)
    R = 4000
    origins = rng.normal(size=(R, 3))
    origins = 3.0 * origins / np.linalg.norm(origins, axis=1, keepdims=True)
    targets = rng.normal(size=(R, 3)) * 0.7  # mix of hits and misses
    dirs = targets - origins

    t0, f0, b0, v0 = intersect_rays_numpy(m.vertices, m.faces, origins, dirs)
    bvh = HostBVH(m.vertices, m.faces)
    t1, f1, b1, v1 = bvh.trace(origins, dirs)

    np.testing.assert_array_equal(v0, v1)
    assert v0.sum() > 0.3 * R
    np.testing.assert_array_equal(f0[v0], f1[v0])
    np.testing.assert_allclose(t1[v0], t0[v0], rtol=1e-12, atol=0)
    np.testing.assert_allclose(b1[v0], b0[v0], atol=1e-11)
    # misses keep the oracle's conventions
    assert np.all(np.isinf(t1[~v0])) and np.all(f1[~v0] == -1)
    assert np.all(b1[~v0] == 0.0)


def test_native_bvh_degenerate_faces_and_reuse(rng):
    """Zero-area faces are skipped exactly like the oracle's det guard, and
    one HostBVH instance serves multiple trace calls."""
    from intrinsic_neural_fields_tpu.ops import HostBVH

    m = icosphere(1)
    V = np.asarray(m.vertices)
    F = np.asarray(m.faces)
    # append degenerate faces: repeated vertex and collinear sliver
    F_bad = np.concatenate(
        [F, np.array([[0, 0, 1], [2, 2, 2]], F.dtype)], axis=0
    )
    R = 500
    origins = np.tile(np.array([[0.0, -3.0, 0.0]]), (R, 1))
    dirs = rng.normal(size=(R, 3)) * 0.2 + np.array([0.0, 1.0, 0.0])

    t0, f0, b0, v0 = intersect_rays_numpy(V, F_bad, origins, dirs)
    bvh = HostBVH(V, F_bad)
    for _ in range(2):  # reuse across calls
        t1, f1, b1, v1 = bvh.trace(origins, dirs)
        np.testing.assert_array_equal(v0, v1)
        np.testing.assert_array_equal(f0[v0], f1[v0])
        np.testing.assert_allclose(t1[v0], t0[v0], rtol=1e-12, atol=0)


def test_intersect_rays_host_fallback_contract(rng):
    """intersect_rays_host returns the oracle contract whether or not the
    native core is available."""
    from intrinsic_neural_fields_tpu.ops import intersect_rays_host

    m = icosphere(2)
    origins = np.array([[0.0, -3.0, 0.0]] * 3)
    dirs = np.array([[0.0, 1.0, 0.0], [0.0, 1.0, 0.1], [1.0, 0.0, 0.0]])
    t, f, b, v = intersect_rays_host(m.vertices, m.faces, origins, dirs)
    t0, f0, b0, v0 = intersect_rays_numpy(m.vertices, m.faces, origins, dirs)
    np.testing.assert_array_equal(v, v0)
    np.testing.assert_array_equal(f[v], f0[v])
    np.testing.assert_allclose(t[v], t0[v], rtol=1e-12)


def test_native_bvh_axis_parallel_ray_on_box_bound():
    """Slab-test NaN regression: a ray with a zero direction component whose
    origin coordinate equals a BVH node bound computes 0 * inf = NaN in the
    slab products. The NaN must be treated as 'axis imposes no constraint'
    (the origin sits on — hence inside — the closed slab), not poison the
    min/max chain into a false miss the numpy oracle does not produce."""
    from intrinsic_neural_fields_tpu.ops import HostBVH

    # Mesh min/max x are exactly 0 and 2 (box bounds land on them). The two
    # target triangles have an edge on x=0 / x=2 so the axis-parallel rays
    # below hit AT the bound coordinate (inclusive edge hits in the oracle).
    V = np.array(
        [
            [0.0, -1.0, 1.0], [0.0, 2.0, 1.0], [2.0, 0.5, 1.0],  # hit tri A
            [2.0, -1.0, 0.0], [2.0, 2.0, 0.0], [0.0, 0.5, 0.0],  # hit tri B
            [1.0, 5.0, 2.0], [1.5, 6.0, 2.0], [0.5, 6.0, 2.0],   # filler
        ]
    )
    F = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]])
    # d.x == 0, o.x on the lo.x / hi.x bound; plus a d.y == 0 ray on the
    # y bound for the second axis's chain.
    origins = np.array([[0.0, 0.5, 3.0], [2.0, 0.5, 3.0], [1.0, -1.0, 3.0]])
    dirs = np.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])

    t0, f0, b0, v0 = intersect_rays_numpy(V, F, origins, dirs)
    assert v0[0] and v0[1]  # the oracle finds the on-bound hits
    bvh = HostBVH(V, F)
    t1, f1, b1, v1 = bvh.trace(origins, dirs)
    np.testing.assert_array_equal(v1, v0)
    np.testing.assert_array_equal(f1[v0], f0[v0])
    np.testing.assert_allclose(t1[v0], t0[v0], rtol=1e-12)
