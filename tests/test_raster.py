"""Projective-binning pinhole tracer (ops/raster.py) parity tests.

The contract: intersect_coords_pinhole evaluates the SAME per-(ray,face)
formulas as the cone tracer (intersect_rays shared_origin=True), so hits
must agree to ~1 ulp — the only slack is where the compiler contracts the
multiply-add chains into FMAs differently for the two graphs. Tests assert:
identical valid masks up to a vanishing boundary-flip rate, t to 1e-5
relative, face ids equal except on exact-tie edges (where hit POINTS must
still agree), and barycentrics to ~1 ulp of the clip.
Covers: full views, masked/Z-ordered subsets (the renderer's actual call
pattern), low-poly meshes where every face overflows the 2x2-tile span cap,
behind-camera geometry (camera inside the mesh), off-center framing,
non-square and non-power-of-two resolutions, and degenerate faces.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from intrinsic_neural_fields_tpu.geometry.primitives import icosphere
from intrinsic_neural_fields_tpu.ops import (
    hit_points_xyz,
    intersect_rays,
    pixel_grid_coords,
    ray_origins_and_directions,
)
from intrinsic_neural_fields_tpu.ops.morton import (
    face_morton_order,
    pixel_morton_order,
)
from intrinsic_neural_fields_tpu.ops.raster import intersect_coords_pinhole

from tests.test_intersect import _look_at_cam, _simple_K


def _compare(mesh, cam, K, coords, H, W, require_hits=True, **kw):
    o, d = ray_origins_and_directions(cam, K, coords)
    ref = intersect_rays(mesh.vertices, mesh.faces, o, d, shared_origin=True)
    got = intersect_coords_pinhole(
        mesh.vertices, mesh.faces, cam, K, coords, W=W, H=H, **kw
    )
    ref_v = np.asarray(ref.valid)
    got_v = np.asarray(got.valid)
    # ulp-level u/v noise can flip a hit only within ~1 ulp of the B_EPS
    # boundary — vanishing measure.
    assert (ref_v != got_v).mean() < 1e-3, (ref_v != got_v).mean()
    if require_hits:
        assert ref_v.any()
    both = ref_v & got_v
    np.testing.assert_allclose(
        np.asarray(got.t)[both], np.asarray(ref.t)[both], rtol=1e-5, atol=1e-6
    )
    f_ref = np.asarray(ref.face_idx)[both]
    f_got = np.asarray(got.face_idx)[both]
    same_face = f_ref == f_got
    assert same_face.mean() > 0.999, same_face.mean()
    if not same_face.all():
        # exact-t ties along shared edges may pick either face; the hit
        # points must coincide
        sel = ~same_face
        p_ref = np.einsum(
            "bj,bjk->bk",
            np.asarray(ref.bary)[both][sel],
            np.asarray(mesh.vertices)[np.asarray(mesh.faces)[f_ref[sel]]],
        )
        p_got = np.einsum(
            "bj,bjk->bk",
            np.asarray(got.bary)[both][sel],
            np.asarray(mesh.vertices)[np.asarray(mesh.faces)[f_got[sel]]],
        )
        np.testing.assert_allclose(p_got, p_ref, atol=2e-4)
    # ~1 ulp of t is amplified by the dual-basis row magnitude (u = oa + t*dA
    # with |dA| ~ 1/edge), so bary noise scales with triangle fineness; 2e-4
    # is the same tolerance class the f64-oracle tests use for hit points.
    np.testing.assert_allclose(
        np.asarray(got.bary)[both][same_face],
        np.asarray(ref.bary)[both][same_face],
        atol=2e-4,
    )
    return ref, got


def _sorted_blob(subdiv):
    m = icosphere(subdiv)
    v = np.asarray(m.vertices)
    r = 1.0 + 0.15 * (np.sin(3 * v[:, 0]) * np.cos(2 * v[:, 1]))
    m.vertices = (v * r[:, None]).astype(np.float64)
    m._cache.clear()
    m.faces = m.faces[face_morton_order(m.vertices, m.faces)]
    return m


@pytest.mark.slow
def test_full_view_matches_cone_tracer():
    m = _sorted_blob(4)
    H = W = 128
    cam = _look_at_cam(np.array([0.4, -2.7, 0.9]))
    K = _simple_K(H, W)
    coords = pixel_grid_coords(H, W)
    coords = coords[pixel_morton_order(coords)]
    _compare(m, cam, K, coords, H, W)


@pytest.mark.slow
def test_masked_morton_subset():
    """The renderer traces a Z-ordered masked subset padded by edge-repeat;
    packets then span multiple screen tiles."""
    m = _sorted_blob(4)
    H = W = 128
    cam = _look_at_cam(np.array([0.0, -2.5, 0.4]))
    K = _simple_K(H, W)
    coords = pixel_grid_coords(H, W)
    rng = np.random.default_rng(0)
    mask = rng.uniform(size=coords.shape[0]) < 0.35
    mask[: H * W // 2] |= rng.uniform(size=H * W // 2) < 0.4
    sub = coords[mask]
    sub = sub[pixel_morton_order(sub)]
    pad = -(-sub.shape[0] // 1024) * 1024 - sub.shape[0]
    sub = np.pad(sub, ((0, pad), (0, 0)), mode="edge")
    _compare(m, cam, K, sub, H, W)


def test_low_poly_all_overflow():
    """icosphere(1): 80 faces, each projecting far wider than 2x2 tiles —
    everything lands in the overflow segment (the exact brute-force path)."""
    m = icosphere(1)
    m.faces = m.faces[face_morton_order(m.vertices, m.faces)]
    H = W = 96
    cam = _look_at_cam(np.array([0.0, -2.2, 0.0]))
    K = _simple_K(H, W)
    coords = pixel_grid_coords(H, W)
    coords = coords[pixel_morton_order(coords)]
    _compare(m, cam, K, coords, H, W)


def test_camera_inside_mesh():
    """Faces behind/straddling the camera plane go to overflow; hits must
    still match (every direction hits the enclosing sphere)."""
    m = _sorted_blob(3)
    H = W = 64
    cam = _look_at_cam(np.array([0.2, -0.1, 0.05]), target=np.array([1.0, 0.0, 0.0]))
    K = _simple_K(H, W)
    coords = pixel_grid_coords(H, W)
    coords = coords[pixel_morton_order(coords)]
    ref, _ = _compare(m, cam, K, coords, H, W)
    assert np.asarray(ref.valid).all()


def test_off_center_and_background_rays():
    """Object in a corner of the frame: most rays miss (the scene-AABB cap
    and empty tiles must not invent hits)."""
    m = _sorted_blob(3)
    H = W = 128
    cam = _look_at_cam(np.array([2.0, -3.5, 1.8]), target=np.array([0.6, 0.6, -0.4]))
    K = _simple_K(H, W)
    coords = pixel_grid_coords(H, W)
    coords = coords[pixel_morton_order(coords)]
    ref, _ = _compare(m, cam, K, coords, H, W)
    v = np.asarray(ref.valid)
    assert v.any() and (~v).any()


@pytest.mark.slow
def test_non_square_non_pow2():
    m = _sorted_blob(3)
    H, W = 96, 132
    cam = _look_at_cam(np.array([0.3, -2.4, 0.5]))
    K = _simple_K(H, W)
    coords = pixel_grid_coords(H, W)
    coords = coords[pixel_morton_order(coords)]
    _compare(m, cam, K, coords, H, W, ray_tile=512)


@pytest.mark.slow
def test_degenerate_faces_ignored():
    m = _sorted_blob(3)
    f = np.asarray(m.faces)
    f = np.concatenate([f, np.array([[0, 0, 0], [3, 3, 7]], f.dtype)], axis=0)
    m.faces = f
    H = W = 64
    cam = _look_at_cam(np.array([0.0, -2.5, 0.3]))
    K = _simple_K(H, W)
    coords = pixel_grid_coords(H, W)
    _compare(m, cam, K, coords, H, W)


@pytest.mark.slow
def test_coords_outside_grid():
    """Undistorted pixel coordinates can land outside [0,W)x[0,H) (the
    Meshroom radial-k3 render path). Rays must clamp into the same border
    tile the face bins clip to — an unclamped tile id would silently skip
    every binned candidate."""
    m = _sorted_blob(3)
    H = W = 96
    cam = _look_at_cam(np.array([0.0, -2.0, 0.1]))
    K = _simple_K(H, W)
    coords = pixel_grid_coords(H, W).astype(np.float32)
    # Push coords past the border like a strong undistortion would: the rays
    # then sample an expanded frustum while the tile grid stays WxH.
    coords = (coords - (W - 1) / 2.0) * 1.25 + (W - 1) / 2.0
    assert coords.min() < -1 and coords.max() > W
    coords = coords[pixel_morton_order(np.clip(coords, 0, W - 1))]
    ref, got = _compare(m, cam, K, coords, H, W)
    assert np.asarray(ref.valid).any()


@pytest.mark.slow
def test_renderer_raster_matches_cone():
    """Renderer(tracer='raster') (the default) must produce the same image as
    tracer='cone' up to the f16 wire grid — hit arithmetic is shared, so only
    exact-t tie pixels could differ (none on this view)."""
    from tests.test_render_regressions import _camera_rays, _renderer

    H = W = 48
    r_raster, m, efuncs = _renderer(H, W)
    assert r_raster._tracer == "raster"
    from intrinsic_neural_fields_tpu.render.renderer import Renderer

    r_cone = Renderer(
        r_raster.model, r_raster.variables, m, eigenfunctions=efuncs,
        H=H, W=W, tracer="cone",
    )
    cam, K, _, _ = _camera_rays(H, W)
    img_r, hits_r = r_raster.render(cam, K, eval_render=True)
    img_c, hits_c = r_cone.render(cam, K, eval_render=True)
    np.testing.assert_array_equal(hits_r, hits_c)
    np.testing.assert_allclose(img_r, img_c, atol=2e-3)

    # masked render too (packets spanning scattered tiles)
    rng = np.random.default_rng(3)
    mask = rng.uniform(size=H * W) < 0.6
    np.testing.assert_allclose(
        r_raster.render(cam, K, obj_mask_1d=mask),
        r_cone.render(cam, K, obj_mask_1d=mask),
        atol=2e-3,
    )

    # resolution change rebuilds the raster tile grid (static W/H)
    r_raster.set_height(32)
    r_raster.set_width(32)
    from tests.test_intersect import _simple_K

    img32 = r_raster.render(cam, _simple_K(32, 32))
    assert img32.shape == (32, 32, 3)


def test_zoomed_in_spans_overflow():
    """A close-up camera makes faces project wider than the 2x2-tile cap,
    mixing binned and overflow faces in one view."""
    m = _sorted_blob(4)
    H = W = 128
    cam = _look_at_cam(np.array([0.0, -1.25, 0.0]))
    K = _simple_K(H, W, f=2.5)
    coords = pixel_grid_coords(H, W)
    coords = coords[pixel_morton_order(coords)]
    _compare(m, cam, K, coords, H, W)


@pytest.mark.slow
def test_compact_bit_equal_to_slot_major():
    """Entry compaction (the default) must not change a single bit when
    nothing demotes: cumsum positions preserve slot-major order, and the
    stable argsort therefore sees the same tie order."""
    m = _sorted_blob(4)
    H = W = 128
    cam = _look_at_cam(np.array([0.4, -2.7, 0.9]))
    K = _simple_K(H, W)
    coords = pixel_grid_coords(H, W)
    coords = coords[pixel_morton_order(coords)]
    a = intersect_coords_pinhole(
        m.vertices, m.faces, cam, K, coords, W=W, H=H, compact=True
    )
    b = intersect_coords_pinhole(
        m.vertices, m.faces, cam, K, coords, W=W, H=H, compact=False
    )
    assert (np.asarray(a.valid) == np.asarray(b.valid)).all()
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(np.asarray(a.face_idx), np.asarray(b.face_idx))
    np.testing.assert_array_equal(np.asarray(a.bary), np.asarray(b.bary))


@pytest.mark.slow
def test_compact_cap_demotes_to_overflow():
    """Engineered worst case for the entry cap: an 8x8 grid of 36px quads at
    32px pitch, each straddling one tile border in u AND v (36px + the ~3px
    conservative margin still fits a two-tile window) — every one of the 128
    triangles emits 4 entries (512 > the 2F=256 cap), so compaction must
    demote faces to the exact overflow segment and still lose no hits."""
    import jax.numpy as jnp

    from intrinsic_neural_fields_tpu.ops.raster import _bin_faces

    H = W = 320
    f, z = 100.0, 2.0
    cam = np.eye(4, dtype=np.float32)
    K = np.array([[f, 0, 0.0], [0, f, 0.0], [0, 0, 1]], np.float32)

    verts, faces = [], []
    for gy in range(8):
        for gx in range(8):
            u0, v0 = 26.0 + 32 * gx, 26.0 + 32 * gy
            u1, v1 = u0 + 36.0, v0 + 36.0
            # pixel -> world at depth z: x = u * z / f
            c = [(u0, v0), (u1, v0), (u1, v1), (u0, v1)]
            i = len(verts)
            verts += [[u * z / f, v * z / f, z] for (u, v) in c]
            faces += [[i, i + 1, i + 2], [i, i + 2, i + 3]]
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int32)

    coords = pixel_grid_coords(H, W)
    coords = coords[pixel_morton_order(coords)]
    cmin = jnp.asarray(coords.min(0), jnp.float32)
    cmax = jnp.asarray(coords.max(0), jnp.float32)

    t_c = _bin_faces(jnp.asarray(verts, jnp.float32), jnp.asarray(faces),
                     jnp.asarray(cam), jnp.asarray(K), cmin, cmax,
                     W, H, 32, 256, compact=True)
    t_nc = _bin_faces(jnp.asarray(verts, jnp.float32), jnp.asarray(faces),
                      jnp.asarray(cam), jnp.asarray(K), cmin, cmax,
                      W, H, 32, 256, compact=False)
    assert int(t_nc.o_chunks) == 0          # all faces binnable, none wide
    assert int(t_c.o_chunks) >= 1           # cap overflow => demotion fired

    class M:
        pass

    m = M()
    m.vertices, m.faces = verts, faces
    _compare(m, cam, K, coords, H, W)


def test_radix_argsort_matches_stable_argsort():
    """The MXU counting radix sort must return the EXACT permutation of
    jnp.argsort(stable=True) — duplicates, sentinel keys, pad keys, odd
    sizes, every key width used by the binner."""
    import jax.numpy as jnp

    from intrinsic_neural_fields_tpu.ops.raster import _stable_radix_argsort

    rng = np.random.default_rng(0)
    for n, hi, bits in [(1, 2, 8), (255, 16, 8), (256, 1 << 14, 16),
                        (1000, 1 << 24, 24), (4096, 1 << 30, 31),
                        (7777, 8, 8)]:
        keys = jnp.asarray(rng.integers(0, hi, size=n).astype(np.int32))
        got = np.asarray(_stable_radix_argsort(keys, bits))
        want = np.asarray(jnp.argsort(keys, stable=True))
        np.testing.assert_array_equal(got, want, err_msg=f"n={n} hi={hi}")


def test_bitonic_argsort_matches_stable_argsort():
    """The roll-based bitonic network must return the EXACT permutation of
    jnp.argsort(stable=True): the lexicographic (key, index) comparator makes
    the unstable network reproduce stable order on any duplicate density."""
    import jax.numpy as jnp

    from intrinsic_neural_fields_tpu.ops.raster import _bitonic_argsort

    rng = np.random.default_rng(1)
    for n, hi in [(1, 2), (2, 2), (255, 16), (256, 1 << 14),
                  (1000, 1 << 24), (4096, 1 << 30), (7777, 8)]:
        keys = jnp.asarray(rng.integers(0, hi, size=n).astype(np.int32))
        got = np.asarray(_bitonic_argsort(keys, 31))
        want = np.asarray(jnp.argsort(keys, stable=True))
        np.testing.assert_array_equal(got, want, err_msg=f"n={n} hi={hi}")


def test_bitonic_vmem_argsort_matches_stable_argsort():
    """The single-pallas-call VMEM-resident network (dynamic pltpu.roll
    substages under lax.fori_loop, interpret mode on CPU) must also return
    the EXACT stable-argsort permutation, including the <2^10 padding path
    and non-power-of-two sizes."""
    import jax.numpy as jnp

    from intrinsic_neural_fields_tpu.ops.raster import _bitonic_argsort_vmem

    rng = np.random.default_rng(3)
    for n, hi in [(1, 2), (255, 16), (1000, 1 << 24), (4096, 1 << 30),
                  (5000, 8)]:
        keys = jnp.asarray(rng.integers(0, hi, size=n).astype(np.int32))
        got = np.asarray(_bitonic_argsort_vmem(keys, 31))
        want = np.asarray(jnp.argsort(keys, stable=True))
        np.testing.assert_array_equal(got, want, err_msg=f"n={n} hi={hi}")


@pytest.mark.slow
@pytest.mark.parametrize("method", ["bitonic", "bitonic_vmem"])
def test_bitonic_binner_bit_identical_to_argsort(method):
    """sort_method='bitonic'/'bitonic_vmem' produce bit-identical traces to
    'argsort'.

    Slow tier: the ~m(m+1)/2-substage networks (two sorts per trace) take
    minutes of CPU XLA/interpret compile; the fast tier covers the
    permutations themselves in test_bitonic_argsort_matches_stable_argsort
    and test_bitonic_vmem_argsort_matches_stable_argsort."""
    import jax.numpy as jnp

    from intrinsic_neural_fields_tpu.ops.raster import intersect_coords_pinhole

    H = W = 64
    mesh = _sorted_blob(3)
    verts = np.asarray(mesh.vertices, np.float32)
    faces = np.asarray(mesh.faces, np.int32)
    cam = _look_at_cam(3.0 * np.array([0.3, -0.9, 0.35]))
    K = _simple_K(H, W)
    coords = pixel_grid_coords(H, W)
    coords = coords[pixel_morton_order(coords)]
    hits_b = intersect_coords_pinhole(
        verts, faces, cam, K, coords, W=W, H=H, sort_method=method)
    hits_a = intersect_coords_pinhole(
        verts, faces, cam, K, coords, W=W, H=H, sort_method="argsort")
    for fld in ("valid", "face_idx", "t", "bary"):
        np.testing.assert_array_equal(
            np.asarray(getattr(hits_b, fld)), np.asarray(getattr(hits_a, fld))
        )


def test_radix_and_argsort_binners_bit_identical():
    """sort_method='radix' (default) and 'argsort' produce bit-identical
    traces (same permutation => same tables => same hits)."""
    import jax.numpy as jnp

    from intrinsic_neural_fields_tpu.ops.raster import intersect_coords_pinhole

    H = W = 96
    mesh = _sorted_blob(4)
    verts = np.asarray(mesh.vertices, np.float32)
    faces = np.asarray(mesh.faces, np.int32)
    cam = _look_at_cam(3.0 * np.array([0.3, -0.9, 0.35]))
    K = _simple_K(H, W)
    coords = pixel_grid_coords(H, W)
    coords = coords[pixel_morton_order(coords)]
    hits_r = intersect_coords_pinhole(
        verts, faces, cam, K, coords, W=W, H=H, sort_method="radix")
    hits_a = intersect_coords_pinhole(
        verts, faces, cam, K, coords, W=W, H=H, sort_method="argsort")
    np.testing.assert_array_equal(np.asarray(hits_r.valid), np.asarray(hits_a.valid))
    np.testing.assert_array_equal(np.asarray(hits_r.face_idx), np.asarray(hits_a.face_idx))
    np.testing.assert_array_equal(np.asarray(hits_r.t), np.asarray(hits_a.t))
    np.testing.assert_array_equal(np.asarray(hits_r.bary), np.asarray(hits_a.bary))


def test_straddling_face_found_with_one_sided_hull():
    """A camera-plane-straddling face must not be culled by the coord-hull
    test: the eps-clamped projection of a behind-camera vertex lands near
    the principal point, so for a one-sided hull (masked render) the
    clamped AABB can miss pixels the face's clipped visible portion
    covers. Regression for the round-5 review finding: such faces route
    to the overflow segment unconditionally and their hits must match the
    dense tracer exactly."""
    import jax.numpy as jnp

    from intrinsic_neural_fields_tpu.ops import (
        intersect_rays,
        ray_origins_and_directions,
    )
    from intrinsic_neural_fields_tpu.ops.raster import intersect_coords_pinhole

    W = H = 512
    K = np.array([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]], np.float32)
    cam = np.eye(3, 4, dtype=np.float32)  # camera at origin, looking +z
    # One vertex behind the camera with qx=0: its clamped projection is the
    # principal point u=256, so the face AABB tops out near u~357 — fully
    # left of the hull below — while the visible clipped part reaches
    # u~472 (edge P1->P3 at z~0.3).
    verts = np.array(
        [[0.2, -0.01, 1.0], [0.2, 0.01, 1.0], [0.0, 0.0, -1.0]], np.float32
    )
    faces = np.array([[0, 1, 2]], np.int32)
    xs, ys = np.meshgrid(np.arange(400, 512), np.arange(250, 262))
    coords = np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(
        np.float32) + 0.5

    hits = intersect_coords_pinhole(
        verts, faces, cam, K, coords, W=W, H=H)
    o, d = ray_origins_and_directions(cam, K, coords)
    ref = intersect_rays(verts, faces, o, d)
    assert int(np.asarray(ref.valid).sum()) > 0, "scene must produce hits"
    np.testing.assert_array_equal(np.asarray(hits.valid), np.asarray(ref.valid))
    np.testing.assert_allclose(
        np.asarray(hits.t)[np.asarray(ref.valid)],
        np.asarray(ref.t)[np.asarray(ref.valid)], rtol=1e-5)

    # A face ENTIRELY behind the camera is unhittable by a forward bundle
    # and must be culled with no hits (matching the dense tracer).
    verts_b = verts.copy()
    verts_b[:, 2] = -np.abs(verts_b[:, 2]) - 0.1
    hits_b = intersect_coords_pinhole(
        verts_b, faces, cam, K, coords, W=W, H=H)
    ref_b = intersect_rays(verts_b, faces, o, d)
    assert not np.asarray(ref_b.valid).any()
    assert not np.asarray(hits_b.valid).any()


def test_unknown_sort_method_raises():
    from intrinsic_neural_fields_tpu.ops.raster import _argsort_keys

    import jax.numpy as jnp
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown sort_method"):
        _argsort_keys(jnp.arange(8, dtype=jnp.int32), 4, "bitonic_vmen")


def test_non_pinhole_K_rejected():
    """Row-skew / projective intrinsics violate the binning projection's
    assumptions and must be rejected loudly (ray_gen inverts the full K,
    so a silent mismatch would mis-bin faces)."""
    from intrinsic_neural_fields_tpu.ops.raster import intersect_coords_pinhole

    verts = np.eye(3, dtype=np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    cam = np.eye(3, 4, dtype=np.float32)
    coords = np.zeros((4, 2), np.float32)
    bad = np.array([[500.0, 0, 8], [3.0, 500.0, 8], [0, 0, 1]], np.float32)
    with pytest.raises(ValueError, match="pinhole intrinsics"):
        intersect_coords_pinhole(verts, faces, cam, bad, coords, W=16, H=16)
