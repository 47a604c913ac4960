"""Real-data ingestion hardening (VERDICT r4 missing #2 / next #5).

The TUM archives are unreachable here (zero egress), so the hand-written
OBJ/PLY/OFF parsers, the EXR/mask loaders, and the camera-npz / Meshroom-JSON
paths are exercised against a matrix of corner-case fixtures instead: binary
little/big-endian PLY, extra and list-typed vertex properties, polygon faces,
CRLF/tabs/comments, EXR compression modes, npz key drift, and Meshroom JSON
shape variants. Reference behaviors: mesh.py:39-50 (igl loading),
utils.py:44-61 (EXR/mask), dataset.py:157-202 (Meshroom JSON).
"""
import json
import os
import struct

import numpy as np
import pytest

from intrinsic_neural_fields_tpu.geometry.mesh_io import (
    read_mesh_file,
    read_obj,
    read_off,
    read_ply,
    write_obj,
    write_ply,
)

# A tetrahedron: 4 vertices, 4 faces — small enough to assert exact values.
TET_V = np.array(
    [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
)
TET_F = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)


def _assert_tet(v, f):
    np.testing.assert_allclose(v, TET_V)
    np.testing.assert_array_equal(np.asarray(f), TET_F)


# ---------------------------------------------------------------- OBJ matrix

def test_obj_crlf_tabs_comments_and_extras(tmp_path):
    body = (
        "# exported by nothing\r\n"
        "mtllib foo.mtl\r\n"
        "v\t0 0 0\r\n"
        "  v 1 0 0\r\n"          # leading whitespace
        "v 0 1 0 1.0\r\n"         # w coordinate (ignored)
        "v 0 0 1 0.5 0.5 0.5\r\n"  # vertex colors (ignored)
        "vn 0 0 1\r\n"
        "vt 0.5 0.5\r\n"
        "usemtl bar\r\n"
        "f 1/1/1 2/1/1 3/1/1\r\n"
        "f 1//1 2//1 4//1\r\n"
        "f 1 3 4\r\n"
        "f -3 -2 -1\r\n"          # negative (relative) indexing
    )
    p = tmp_path / "tet_crlf.obj"
    p.write_bytes(body.encode())
    _assert_tet(*read_obj(str(p)))


def test_obj_polygon_fan_triangulation(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nv 0.5 0.5 1\n"
        "f 1 2 3 4\n"        # quad -> 2 tris
        "f 1 2 5\n"
    )
    v, f = read_obj(str(p))
    assert v.shape == (5, 3)
    np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3], [0, 1, 4]])


# ---------------------------------------------------------------- PLY matrix

def _ply_header(fmt, nv, nf, vert_props, face_prop="property list uchar int vertex_indices"):
    lines = ["ply", f"format {fmt} 1.0", "comment corner-case fixture",
             f"element vertex {nv}"] + vert_props + [
        f"element face {nf}", face_prop, "end_header"]
    return ("\n".join(lines) + "\n").encode("ascii")


def test_ply_ascii_with_extra_props_and_quads(tmp_path):
    hdr = _ply_header("ascii", 4, 2, [
        "property float x", "property float y", "property float z",
        "property float nx", "property float ny", "property float nz",
        "property uchar red", "property uchar green", "property uchar blue",
    ])
    rows = b"".join(
        f"{x} {y} {z} 0 0 1 255 0 0\n".encode() for x, y, z in TET_V
    )
    # one quad (fan -> 2 tris) + one tri
    faces = b"4 0 1 2 3\n3 1 2 3\n"
    p = tmp_path / "extra.ply"
    p.write_bytes(hdr + rows + faces)
    v, f = read_ply(str(p))
    np.testing.assert_allclose(v, TET_V)
    np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3], [1, 2, 3]])


@pytest.mark.parametrize("fmt,bo", [("binary_little_endian", "<"),
                                    ("binary_big_endian", ">")])
def test_ply_binary_both_endiannesses(tmp_path, fmt, bo):
    hdr = _ply_header(fmt, 4, 4, [
        "property double x", "property double y", "property double z",
        "property float quality",
    ])
    body = b"".join(
        struct.pack(bo + "dddf", x, y, z, 0.5) for x, y, z in TET_V
    )
    body += b"".join(
        struct.pack(bo + "Biii", 3, *map(int, tri)) for tri in TET_F
    )
    p = tmp_path / f"{fmt}.ply"
    p.write_bytes(hdr + body)
    _assert_tet(*read_ply(str(p)))


def test_ply_binary_vertex_with_list_property(tmp_path):
    """A vertex element carrying a list property must not lose the x/y/z."""
    hdr = _ply_header("binary_little_endian", 4, 1, [
        "property float x", "property float y", "property float z",
        "property list uchar float weights",
    ])
    body = b""
    for x, y, z in TET_V:
        body += struct.pack("<fff", x, y, z)
        body += struct.pack("<Bff", 2, 0.25, 0.75)  # 2-item list payload
    body += struct.pack("<Biii", 3, 0, 1, 2)
    p = tmp_path / "vlist.ply"
    p.write_bytes(hdr + body)
    v, f = read_ply(str(p))
    np.testing.assert_allclose(v, TET_V)
    np.testing.assert_array_equal(f, [[0, 1, 2]])


def test_ply_pointcloud_no_faces(tmp_path):
    hdr = ("ply\nformat ascii 1.0\nelement vertex 4\n"
           "property float x\nproperty float y\nproperty float z\n"
           "end_header\n").encode()
    rows = b"".join(f"{x} {y} {z}\n".encode() for x, y, z in TET_V)
    p = tmp_path / "cloud.ply"
    p.write_bytes(hdr + rows)
    v, f = read_ply(str(p))
    np.testing.assert_allclose(v, TET_V)
    assert f.shape == (0, 3)


def test_ply_unsupported_reports_actionably(tmp_path):
    p = tmp_path / "weird.ply"
    p.write_bytes(b"ply\nformat binary_middle_endian 1.0\nend_header\n")
    with pytest.raises(NotImplementedError, match="binary_middle_endian"):
        read_ply(str(p))
    p2 = tmp_path / "weird2.ply"
    p2.write_bytes(
        b"ply\nformat ascii 1.0\nelement vertex 1\n"
        b"property quadfloat x\nend_header\n0\n"
    )
    with pytest.raises(NotImplementedError, match="quadfloat"):
        read_ply(str(p2))
    p3 = tmp_path / "notply.ply"
    p3.write_bytes(b"solid something\n")
    with pytest.raises(ValueError, match="magic"):
        read_ply(str(p3))


def test_ply_write_read_roundtrip(tmp_path):
    p = tmp_path / "rt.ply"
    write_ply(str(p), TET_V, TET_F)
    v, f = read_ply(str(p))
    np.testing.assert_allclose(v, TET_V, atol=1e-7)
    np.testing.assert_array_equal(f, TET_F)


# ---------------------------------------------------------------- OFF matrix

def test_off_comments_and_fused_header(tmp_path):
    p = tmp_path / "tet.off"
    p.write_text(
        "OFF 4 4 6   # header fused with counts, trailing comment\n"
        "# a full-line comment\n"
        "0 0 0\n1 0 0\n0 1 0\n0 0 1\n"
        "3 0 1 2\n3 0 1 3\n3 0 2 3\n3 1 2 3\n"
    )
    _assert_tet(*read_off(str(p)))


def test_off_polygon_and_variant_rejection(tmp_path):
    p = tmp_path / "quad.off"
    p.write_text("OFF\n4 1 4\n0 0 0\n1 0 0\n1 1 0\n0 1 0\n4 0 1 2 3\n")
    v, f = read_off(str(p))
    np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3]])

    p2 = tmp_path / "colored.off"
    p2.write_text("COFF\n1 0 0\n0 0 0 255 0 0 255\n")
    with pytest.raises(NotImplementedError, match="COFF"):
        read_off(str(p2))


def test_read_mesh_file_dispatch_and_unknown(tmp_path):
    p = tmp_path / "tet.obj"
    write_obj(str(p), TET_V, TET_F)
    _assert_tet(*read_mesh_file(str(p)))
    with pytest.raises(ValueError, match="Unsupported mesh format"):
        read_mesh_file(str(tmp_path / "mesh.stl"))


# ------------------------------------------------------------- EXR / cameras

@pytest.mark.parametrize("compression", ["none", "rle", "zips", "zip"])
def test_exr_mask_convention_across_compressions(tmp_path, compression):
    """EXR depth maps: object pixel <=> depth != 1e10 (reference
    utils.py:50-53), under every supported OpenEXR compression mode, through
    the native reader (utils/exr.py — this environment has no EXR codec)."""
    from intrinsic_neural_fields_tpu.utils.exr import write_exr
    from intrinsic_neural_fields_tpu.utils.io import (
        load_depth_as_numpy,
        load_obj_mask_as_numpy,
    )

    H, W = 17, 23  # odd sizes: exercises partial final ZIP block + halves
    depth = np.full((H, W), 1.0e10, np.float32)
    depth[4:12, 6:14] = 2.5
    view = tmp_path / "view"
    os.makedirs(view / "depth")
    write_exr(str(view / "depth" / "depth_0000.exr"), depth,
              compression=compression)

    mask = load_obj_mask_as_numpy(str(view))
    expected = depth != 1.0e10
    np.testing.assert_array_equal(mask, expected)
    d = load_depth_as_numpy(str(view))
    np.testing.assert_allclose(d[expected], 2.5, rtol=1e-6)


@pytest.mark.parametrize("compression", ["none", "rle", "zips", "zip"])
@pytest.mark.parametrize("dtype", [np.float32, np.float16])
def test_exr_roundtrip_rgb_and_dtypes(tmp_path, compression, dtype):
    from intrinsic_neural_fields_tpu.utils.exr import (
        read_exr_channels,
        write_exr,
    )
    from intrinsic_neural_fields_tpu.utils.io import imread

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 4, size=(33, 31, 3)).astype(dtype)
    p = str(tmp_path / "c.exr")
    write_exr(p, img, compression=compression)
    back = imread(p)
    assert back.shape == (33, 31, 3) and back.dtype == np.float32
    np.testing.assert_allclose(back, img.astype(np.float32), rtol=1e-6)

    chans, header = read_exr_channels(p)
    assert set(chans) == {"R", "G", "B"}
    assert header["compression"][1][0] == {"none": 0, "rle": 1, "zips": 2, "zip": 3}[compression]


def test_exr_unsupported_compression_actionable(tmp_path):
    """A PIZ header must be rejected by codec NAME, not a bare number."""
    from intrinsic_neural_fields_tpu.utils.exr import read_exr_channels, write_exr

    p = str(tmp_path / "p.exr")
    write_exr(p, np.zeros((4, 4), np.float32), compression="none")
    raw = bytearray(open(p, "rb").read())
    i = raw.index(b"compression\x00compression\x00")
    raw[i + len(b"compression\x00compression\x00") + 4] = 4  # PIZ
    open(p, "wb").write(bytes(raw))
    with pytest.raises(NotImplementedError, match="piz"):
        read_exr_channels(p)


def test_mask_png_fallback(tmp_path):
    from intrinsic_neural_fields_tpu.utils.io import (
        imwrite,
        load_obj_mask_as_numpy,
    )

    view = tmp_path / "view"
    os.makedirs(view / "depth")
    mask = np.zeros((8, 8), np.uint8)
    mask[2:5, 3:7] = 255
    imwrite(str(view / "depth" / "mask.png"), mask)
    out = load_obj_mask_as_numpy(str(view))
    np.testing.assert_array_equal(out, mask != 0)


def test_cameras_npz_key_drift_is_actionable(tmp_path):
    from intrinsic_neural_fields_tpu.utils.io import load_cameras

    view = tmp_path / "view"
    os.makedirs(view / "depth")
    cam = np.eye(4, dtype=np.float32)
    K = np.eye(3, dtype=np.float32)
    np.savez(view / "depth" / "cameras.npz", world_mat_7=cam, camera_mat_0=K)
    with pytest.raises(KeyError, match="world_mat_0.*world_mat_7"):
        load_cameras(str(view))

    np.savez(view / "depth" / "cameras.npz", world_mat_0=cam, camera_mat_0=K)
    c, k = load_cameras(str(view))
    np.testing.assert_allclose(c, cam)
    np.testing.assert_allclose(k, K)


# ------------------------------------------------------------- Meshroom JSON

def _meshroom_fixture(tmp_path, cam2world_rows):
    from intrinsic_neural_fields_tpu.utils.io import imwrite

    H = W = 8
    img = np.full((H, W, 3), 0.25, np.float32)
    imwrite(str(tmp_path / "v0.png"), img)
    mask = np.zeros((H, W), bool)
    mask[2:6, 2:6] = True
    np.save(tmp_path / "v0_mask.npy", mask)
    cam = np.eye(4)[:cam2world_rows]
    meta = {
        "K": np.diag([100.0, 100.0, 1.0]).tolist(),
        "distortion_params": [0.1, -0.05, 0.01],
        "views": [{
            "view_file": "v0.png",
            "obj_mask_file": "v0_mask.npy",
            "cam2world": cam.tolist(),
        }],
    }
    with open(tmp_path / "test_data.json", "w") as fh:
        json.dump(meta, fh)
    return H, W


@pytest.mark.parametrize("rows", [3, 4])
def test_meshroom_dataset_cam2world_row_variants(tmp_path, rows):
    """Meshroom exports cam2world as 3x4 or 4x4 depending on the pipeline
    version; both must load to the [3,4] convention
    (reference dataset.py:180-186 slices [:3])."""
    from intrinsic_neural_fields_tpu.data.datasets import MeshroomRadialK3Dataset

    H, W = _meshroom_fixture(tmp_path, rows)
    ds = MeshroomRadialK3Dataset(str(tmp_path), "test", H=H, W=W)
    assert len(ds) == 1
    item = ds[0]
    assert item["camCv2world"].shape == (3, 4)
    assert item["K"].shape == (3, 3)
    assert len(item["distortion_params"]) == 3
    assert item["img"].shape == (H, W, 3)
    # background whitened outside the mask
    assert item["img"][0, 0, 0] == 1.0
    assert item["img"][3, 3, 0] < 1.0


_REAL_EXR = "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/test/imghdrdata/python.exr"


@pytest.mark.skipif(not os.path.exists(_REAL_EXR),
                    reason="no OpenEXR-authored sample on this machine")
def test_exr_reader_on_real_openexr_file():
    """Cross-validation against a file written by the REAL OpenEXR library
    (CPython's test-suite sample), not our own writer: RGBA half channels,
    sane [0,1] range."""
    from intrinsic_neural_fields_tpu.utils.exr import read_exr_channels

    chans, _ = read_exr_channels(_REAL_EXR)
    assert set(chans) == {"R", "G", "B", "A"}
    for v in chans.values():
        assert v.shape == (16, 16)
        assert 0.0 <= v.min() and v.max() <= 1.0
    assert chans["A"].max() == 1.0


# ----------------------------------------------------------- compile cache

def test_persistent_compile_cache_helper(tmp_path, monkeypatch):
    import jax

    from intrinsic_neural_fields_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    target = str(tmp_path / "jaxcache")
    monkeypatch.setenv("INF_TPU_JAX_CACHE_DIR", target)
    old = jax.config.jax_compilation_cache_dir
    try:
        assert enable_persistent_compile_cache() == target
        assert os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target
        # opt-out
        monkeypatch.setenv("INF_TPU_JAX_CACHE_DIR", "0")
        assert enable_persistent_compile_cache() is None
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
