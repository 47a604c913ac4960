"""SHOT descriptors (geometry/shot.py) — the shape-descriptor experiments'
[V, 352] feature matrix (reference configs/shape_descriptors/*_shot.yaml),
computed in-repo instead of downloaded.

Pinned properties: shape/normalization, exact agreement with a scalar
per-vertex re-implementation (the vectorized pair-list accumulation is the
risky part), rigid-motion invariance (the descriptor lives in the local
reference frame), locality (far-apart geometry edits don't leak), and the
low-support zero-descriptor path.
"""
import numpy as np
import pytest

from intrinsic_neural_fields_tpu.geometry.primitives import icosphere
from intrinsic_neural_fields_tpu.geometry.shot import (
    N_AZIMUTH,
    N_COS_BINS,
    N_ELEVATION,
    N_RADIAL,
    SHOT_DIM,
    compute_shot_descriptors,
    vertex_normals,
    _local_reference_frames,
    _neighbor_pairs,
)


@pytest.fixture(scope="module")
def blob():
    m = icosphere(4)
    v = np.asarray(m.vertices, np.float64)
    # break ALL the icosphere's mirror symmetries (generic smooth warp): on
    # the raw icosphere, neighbor rings are exactly symmetric about the LRF
    # axes, which makes the x-axis sign a genuine degeneracy (no continuous
    # rule can orient a perfectly antisymmetric neighborhood) — real scanned
    # surfaces are generic, so the fixture should be too
    r = (1.0
         + 0.25 * np.sin(3 * v[:, 0] + 0.41) * np.cos(2 * v[:, 1] - 0.13)
         + 0.15 * np.sin(2.7 * v[:, 2] + 0.77)
         + 0.07 * np.sin(1.9 * v[:, 0] + 1.3) * np.sin(2.3 * v[:, 1] + 0.5)
         * np.sin(3.1 * v[:, 2] + 2.1))
    return v * r[:, None], np.asarray(m.faces)


def test_shape_norm_and_dim(blob):
    v, f = blob
    E = compute_shot_descriptors(v, f)
    assert E.shape == (len(v), SHOT_DIM)
    assert SHOT_DIM == 352 == N_AZIMUTH * N_ELEVATION * N_RADIAL * N_COS_BINS
    assert E.dtype == np.float32
    norms = np.linalg.norm(E.astype(np.float64), axis=1)
    assert np.all((np.abs(norms - 1.0) < 1e-5) | (norms == 0.0))
    assert (norms > 0).mean() > 0.99  # the blob has dense support everywhere
    assert np.all(E >= 0.0)           # histograms of non-negative weights


def _shot_one_vertex_scalar(v, normals, frames, ci, ni, radius, center):
    """Straight-line scalar reference for one vertex's descriptor."""
    desc = np.zeros((N_AZIMUTH, N_ELEVATION, N_RADIAL, N_COS_BINS))
    R = frames[center]  # rows = x, y, z

    def split(pos, nbins, wrap):
        centered = pos - 0.5
        lo = int(np.floor(centered))
        off = centered - lo
        pairs = [(lo, 1.0 - off), (lo + 1, off)]
        out = []
        for b, w in pairs:
            if wrap:
                out.append((b % nbins, w))
            elif b < 0:
                out.append((0, 0.0))   # weight moves to the other side
            elif b > nbins - 1:
                out.append((nbins - 1, 0.0))
            else:
                out.append((b, w))
        # clamp: out-of-range share returns to the valid bin
        tot = out[0][1] + out[1][1]
        if not wrap and tot < 1.0 - 1e-12:
            out = [(b, (1.0 if w > 0 else 0.0)) for b, w in out]
        return out

    for c, q in zip(ci, ni):
        if c != center:
            continue
        d = v[q] - v[c]
        dist = np.linalg.norm(d)
        loc = R @ d
        cosine = float(np.clip(normals[q] @ R[2], -1.0, 1.0))
        cos_pos = (1.0 + cosine) * (N_COS_BINS / 2.0)
        az_pos = (np.arctan2(loc[1], loc[0]) + np.pi) / (2 * np.pi) * N_AZIMUTH
        el_pos = 1.0 + (loc[2] / max(dist, 1e-20)) * 0.5
        ra_pos = dist / radius * N_RADIAL
        for a_b, a_w in split(az_pos, N_AZIMUTH, True):
            for e_b, e_w in split(el_pos, N_ELEVATION, False):
                for r_b, r_w in split(ra_pos, N_RADIAL, False):
                    for c_b, c_w in split(cos_pos, N_COS_BINS, False):
                        desc[a_b, e_b, r_b, c_b] += a_w * e_w * r_w * c_w
    flat = desc.reshape(-1)
    n = np.linalg.norm(flat)
    return flat / n if n > 0 else flat


def test_matches_scalar_reference(blob):
    v, f = blob
    radius = 0.05 * float(np.linalg.norm(v.max(0) - v.min(0)))
    E = compute_shot_descriptors(v, f, radius=radius)
    normals = vertex_normals(v, f)
    ci, ni = _neighbor_pairs(v, radius)
    frames, invalid = _local_reference_frames(v, ci, ni, radius, 5)
    for center in (0, 17, 101, 333):
        assert not invalid[center]
        want = _shot_one_vertex_scalar(v, normals, frames, ci, ni, radius, center)
        np.testing.assert_allclose(E[center], want, atol=1e-6)


def test_rigid_motion_invariance(blob):
    v, f = blob
    radius = 0.05 * float(np.linalg.norm(v.max(0) - v.min(0)))
    E0 = compute_shot_descriptors(v, f, radius=radius)
    # a generic rotation + translation
    a, b = 0.7, -1.1
    Rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
    Rx = np.array([[1, 0, 0], [0, np.cos(b), -np.sin(b)], [0, np.sin(b), np.cos(b)]])
    R = Rz @ Rx
    E1 = compute_shot_descriptors(v @ R.T + np.array([3.0, -2.0, 5.0]), f,
                                  radius=radius)
    # identical up to fp noise in the LRF eigendecomposition
    np.testing.assert_allclose(E1, E0, atol=5e-4)


def test_locality(blob):
    v, f = blob
    radius = 0.05 * float(np.linalg.norm(v.max(0) - v.min(0)))
    E0 = compute_shot_descriptors(v, f, radius=radius)
    # perturb geometry far from vertex 0
    far = np.linalg.norm(v - v[0], axis=1) > 4 * radius
    assert far.sum() > 100
    v2 = v.copy()
    v2[far] *= 1.3
    E1 = compute_shot_descriptors(v2, f, radius=radius)
    np.testing.assert_allclose(E1[0], E0[0], atol=1e-9)


def test_low_support_zero_descriptor():
    # four isolated far-apart points: no vertex reaches min_neighbors
    v = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [0, 0, 10]], np.float64)
    f = np.array([[0, 1, 2], [0, 1, 3]])
    E = compute_shot_descriptors(v, f, radius=0.5, min_neighbors=5)
    assert E.shape == (4, SHOT_DIM)
    np.testing.assert_array_equal(E, 0.0)


def test_cli_and_config_contract(tmp_path):
    """tools/compute_shot.py writes an npy that load_first_k_eigenfunctions
    accepts with k=352 — the exact loading path the shot configs use."""
    import subprocess
    import sys as _sys

    from intrinsic_neural_fields_tpu.geometry.mesh_io import write_obj
    from intrinsic_neural_fields_tpu.spectral.features import (
        load_first_k_eigenfunctions,
    )

    import os

    m = icosphere(2)
    mesh_path = str(tmp_path / "m.obj")
    write_obj(mesh_path, m.vertices, m.faces)
    out = str(tmp_path / "m_shot.npy")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # icosphere(2)'s ~0.26 edge length exceeds the default 5%-diag radius
    # (which targets real scan density) — pass one that gives every vertex
    # a ring of support
    r = subprocess.run(
        [_sys.executable, os.path.join(repo_root, "tools", "compute_shot.py"),
         out, mesh_path, "--radius", "0.6"],
        capture_output=True, text=True, cwd=repo_root,
    )
    assert r.returncode == 0, r.stderr
    # the DEFAULT rescale_strategy ("standard") is what train/eval apply to
    # the shot configs; SHOT matrices have structurally-zero columns (empty
    # histogram bins), so this pins the zero-range guard in features.py —
    # an unguarded (max-min) division NaN'd 288/352 columns
    E = np.asarray(load_first_k_eigenfunctions(out, 352))
    assert E.shape == (m.num_vertices, 352)
    assert np.isfinite(E).all()
    assert (np.abs(E).sum(0) > 0).sum() >= 32  # real signal survives rescale
