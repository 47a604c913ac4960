"""Laplace-Beltrami operator assembly on the host (numpy + scipy.sparse).

Replaces the reference's external native dependencies:
  - igl.cotmatrix / igl.massmatrix(VORONOI)  (reference mesh.py:122-124)
  - robust_laplacian.mesh_laplacian          (reference mesh.py:125-128)

Conventions match the reference: `cotan_laplacian` returns the POSITIVE
semi-definite stiffness matrix (the reference negates igl's cotmatrix,
reference mesh.py:123), and the mass matrix is the diagonal "mixed Voronoi"
(hybrid) mass of Meyer et al., which is what igl's MASSMATRIX_TYPE_VORONOI
computes. Both matrices have diagonal mass, which the spectral layer exploits
to reduce the generalized eigenproblem to a standard symmetric one for the
on-device solver.

The "robust" variant implements the full construction of Sharp & Crane,
"A Laplacian for Nonmanifold Triangle Meshes" (2020): intrinsic
mollification (edge lengths perturbed so every triangle satisfies the
triangle inequality with slack delta), the tufted double cover (faces
duplicated with reversed orientation and glued so every edge becomes
interior — see intrinsic_delaunay.build_double_cover; as in the paper, the
cover's VERTEX set is exactly the original vertices, only edges/faces are
doubled, so operators stay indexed by input vertices and are halved), and
intrinsic Delaunay edge flips, yielding an M-matrix even on meshes with
boundary, skinny triangles, or nonmanifold edges. See robust_laplacian().
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sparse


def _edge_lengths(vertices, faces):
    """Per-face edge lengths l[F,3], where l[:,i] is the length of the edge
    OPPOSITE corner i (i.e. edge (i+1, i+2))."""
    t = vertices[faces]  # F x 3 x 3
    l0 = np.linalg.norm(t[:, 2] - t[:, 1], axis=-1)
    l1 = np.linalg.norm(t[:, 0] - t[:, 2], axis=-1)
    l2 = np.linalg.norm(t[:, 1] - t[:, 0], axis=-1)
    return np.stack([l0, l1, l2], axis=-1)


def _heron_area(l):
    """Numerically stable (Kahan) triangle areas from edge lengths l[F,3]."""
    a = np.sort(l, axis=-1)[:, ::-1]  # a >= b >= c
    x, y, z = a[:, 0], a[:, 1], a[:, 2]
    arg = (x + (y + z)) * (z - (x - y)) * (z + (x - y)) * (x + (y - z))
    return 0.25 * np.sqrt(np.maximum(arg, 0.0))


def _cotangents_from_lengths(l, area):
    """cot of the interior angle at each corner, from edge lengths.

    cot(angle_i) = (l_j^2 + l_k^2 - l_i^2) / (4 * area), with l_i the edge
    opposite corner i.
    """
    l2 = l * l
    cots = np.empty_like(l)
    denom = 4.0 * np.maximum(area, 1e-300)[:, None]
    cots[:, 0] = l2[:, 1] + l2[:, 2] - l2[:, 0]
    cots[:, 1] = l2[:, 2] + l2[:, 0] - l2[:, 1]
    cots[:, 2] = l2[:, 0] + l2[:, 1] - l2[:, 2]
    return cots / denom


def _mollify_lengths(l, rel_delta=1e-6):
    """Intrinsic mollification (Sharp & Crane 2020, section 3.3): find the
    smallest eps such that every triangle satisfies l_i + l_j >= l_k + delta,
    and add it to all edge lengths."""
    delta = rel_delta * np.mean(l)
    needed = np.concatenate(
        [
            delta + l[:, 0] - l[:, 1] - l[:, 2],
            delta + l[:, 1] - l[:, 2] - l[:, 0],
            delta + l[:, 2] - l[:, 0] - l[:, 1],
        ]
    )
    eps = max(0.0, float(needed.max()))
    return l + eps


def _assemble_cotan(faces, cots, n_vertices):
    """Assemble the PSD stiffness matrix from per-corner cotangents.

    For each face and each corner c with opposite edge (i, j):
      W_ij += cot(c) / 2;  L = D - W (graph-Laplacian form), PSD.
    """
    F = faces.shape[0]
    # Edge (i,j) opposite corner 0 is (1,2); opposite 1 is (2,0); opposite 2 is (0,1).
    ii = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
    jj = np.concatenate([faces[:, 2], faces[:, 0], faces[:, 1]])
    ww = 0.5 * np.concatenate([cots[:, 0], cots[:, 1], cots[:, 2]])

    rows = np.concatenate([ii, jj, ii, jj])
    cols = np.concatenate([jj, ii, ii, jj])
    vals = np.concatenate([-ww, -ww, ww, ww])
    L = sparse.coo_matrix((vals, (rows, cols)), shape=(n_vertices, n_vertices))
    return L.tocsr()


def cotan_laplacian_from_lengths(faces, lengths, n_vertices):
    """PSD cotan stiffness from an INTRINSIC metric (faces + edge lengths)."""
    faces = np.asarray(faces, dtype=np.int64)
    area = _heron_area(lengths)
    cots = _cotangents_from_lengths(lengths, area)
    return _assemble_cotan(faces, cots, n_vertices)


def barycentric_mass_from_lengths(faces, lengths, n_vertices):
    """Diagonal lumped mass from an intrinsic metric."""
    faces = np.asarray(faces, dtype=np.int64)
    area = _heron_area(lengths)
    m = np.zeros(n_vertices)
    for c in range(3):
        np.add.at(m, faces[:, c], area / 3.0)
    return sparse.diags(m).tocsr()


def cotan_laplacian(vertices, faces, mollify=False):
    """Positive semi-definite cotan stiffness matrix (== -igl.cotmatrix)."""
    vertices = np.asarray(vertices, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    l = _edge_lengths(vertices, faces)
    if mollify:
        l = _mollify_lengths(l)
    area = _heron_area(l)
    cots = _cotangents_from_lengths(l, area)
    return _assemble_cotan(faces, cots, vertices.shape[0])


def robust_laplacian(vertices, faces):
    """The robust operator of Sharp & Crane, "A Laplacian for Nonmanifold
    Triangle Meshes" (2020): intrinsic mollification -> tufted double cover
    (every edge becomes interior and flippable) -> intrinsic Delaunay edge
    flips -> cotan stiffness + lumped mass of the resulting metric, halved
    (the cover doubles every face). The result is an M-matrix even on meshes
    with boundary, skinny triangles, or nonmanifold edges. Replaces
    robust_laplacian.mesh_laplacian (reference mesh.py:125-128)."""
    from .intrinsic_delaunay import build_double_cover, intrinsic_delaunay

    vertices = np.asarray(vertices, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    l = _mollify_lengths(_edge_lengths(vertices, faces))
    faces_cov, l_cov = build_double_cover(faces, l)
    faces_idt, l_idt, _ = intrinsic_delaunay(faces_cov, l_cov)
    n = vertices.shape[0]
    L = 0.5 * cotan_laplacian_from_lengths(faces_idt, l_idt, n)
    M = 0.5 * barycentric_mass_from_lengths(faces_idt, l_idt, n)
    M = M.tocsr()
    d = M.diagonal()
    if d.min() <= 0:
        eps = 1e-12 * d[d > 0].mean()
        M = sparse.diags(np.maximum(d, eps)).tocsr()
    return L.tocsr(), M


def barycentric_mass_matrix(vertices, faces):
    """Diagonal lumped mass: one third of incident face area per vertex."""
    vertices = np.asarray(vertices, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    area = _heron_area(_edge_lengths(vertices, faces))
    m = np.zeros(vertices.shape[0])
    for c in range(3):
        np.add.at(m, faces[:, c], area / 3.0)
    return sparse.diags(m).tocsr()


def voronoi_mass_matrix(vertices, faces):
    """Diagonal mixed-Voronoi (hybrid) mass matrix of Meyer et al. 2003,
    matching igl MASSMATRIX_TYPE_VORONOI (reference mesh.py:124).

    Non-obtuse triangle, corner i with adjacent edges of length l_j, l_k
    (opposite corners j, k):  A_i = (l_j^2 cot(j) + l_k^2 cot(k)) / 8.
    Obtuse triangle: area/2 at the obtuse corner, area/4 at the others.
    """
    vertices = np.asarray(vertices, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    l = _edge_lengths(vertices, faces)
    area = _heron_area(l)
    cots = _cotangents_from_lengths(l, area)
    l2 = l * l

    # Voronoi corner areas (valid when the triangle is non-obtuse).
    # At corner i, the adjacent edges are those opposite corners j and k.
    vor = np.empty_like(l)
    vor[:, 0] = (l2[:, 1] * cots[:, 1] + l2[:, 2] * cots[:, 2]) / 8.0
    vor[:, 1] = (l2[:, 2] * cots[:, 2] + l2[:, 0] * cots[:, 0]) / 8.0
    vor[:, 2] = (l2[:, 0] * cots[:, 0] + l2[:, 1] * cots[:, 1]) / 8.0

    obtuse_at = cots < 0.0  # cot(angle) < 0 <=> angle > pi/2
    any_obtuse = obtuse_at.any(axis=-1, keepdims=True)
    hybrid = np.where(
        any_obtuse,
        np.where(obtuse_at, area[:, None] / 2.0, area[:, None] / 4.0),
        vor,
    )

    m = np.zeros(vertices.shape[0])
    for c in range(3):
        np.add.at(m, faces[:, c], hybrid[:, c])
    return sparse.diags(m).tocsr()


def build_laplacian(mesh, laplacian_type="cotan"):
    """Dispatch matching the reference's laplacian_type switch
    (reference mesh.py:120-135). Returns (L PSD csr, M diagonal csr)."""
    if laplacian_type == "cotan":
        L = cotan_laplacian(mesh.vertices, mesh.faces)
        M = voronoi_mass_matrix(mesh.vertices, mesh.faces)
    elif laplacian_type == "robust":
        L, M = robust_laplacian(mesh.vertices, mesh.faces)
    elif laplacian_type == "pc_vert_robust":
        from .pointcloud import point_cloud_laplacian

        L, M = point_cloud_laplacian(mesh.vertices)
    else:
        raise RuntimeError(f"Laplacian type {laplacian_type} not implemented.")
    return L, M
