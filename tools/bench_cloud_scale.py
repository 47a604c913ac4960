#!/usr/bin/env python
"""Point-cloud preprocessing at the reference's largest scale (400k points).

The reference's biggest workload is `preprocessing_scripts/
preprocess_human_cloud400k.sh`: a 400,000-point cloud run through
potpourri3d local triangulation + robust_laplacian `pc_vert_robust` +
ARPACK. This bench reproduces that scale on the synthetic blob surface and
times every stage of OUR pipeline:

  sample       area-weighted surface sampling of n points (host)
  triangulate  geometry.pointcloud.local_triangulation (host)
  laplacian    Sharp-Crane robust Laplacian over the local triangulation
               (mollify + tufted cover + C++ iDT flips; host)
  arpack       shift-invert eigsh, k smallest pairs (host oracle;
               --skip_arpack to omit — it is O(n^1.5) factorization)
  chefsi       on-device Chebyshev-filtered subspace iteration with the
               row-chunked spmv (the [n, dmax, m] one-shot gather would be
               ~29GB at this scale)

Parity between the two solvers is reported as eigenvalue max relative
deviation + max principal angle of the k-subspaces.

`python tools/bench_cloud_scale.py [--n 400000] [--k 512] [--skip_arpack]`
Prints one JSON line (recorded in RESULTS.md).
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sample_surface(vertices, faces, n, seed=0):
    """Area-weighted uniform sampling of n points on a triangle mesh."""
    rng = np.random.default_rng(seed)
    v = np.asarray(vertices, np.float64)
    tri = v[faces]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1
    )
    fidx = rng.choice(len(faces), size=n, p=area / area.sum())
    r1, r2 = rng.random(n), rng.random(n)
    s = np.sqrt(r1)
    w = np.stack([1.0 - s, s * (1.0 - r2), s * r2], axis=-1)
    return np.einsum("nk,nkd->nd", w, tri[fidx])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=400_000)
    p.add_argument("--k", type=int, default=512)
    p.add_argument("--mesh", default="data/synthetic_hq/blob.obj")
    p.add_argument("--skip_arpack", action="store_true")
    p.add_argument("--skip_warm", action="store_true",
                   help="skip the warm re-solve (the host f64 polish "
                        "dominates CheFSI wall at scale, so warm ~= cold)")
    p.add_argument("--n_neighbors", type=int, default=16)
    p.add_argument("--cache", default="/tmp/cloud_scale_cache",
                   help="directory for stage caches (triangulation, "
                        "Laplacian, ARPACK pairs) so a retry after a "
                        "tunnel outage skips the ~35min of host stages")
    args = p.parse_args()

    from intrinsic_neural_fields_tpu.geometry.laplacian import robust_laplacian
    from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh
    from intrinsic_neural_fields_tpu.geometry.pointcloud import local_triangulation
    from intrinsic_neural_fields_tpu.spectral.eigensolver import (
        solve_generalized_eigenproblem,
    )

    import scipy.sparse as sp

    out = {"n_points": args.n, "k": args.k}
    os.makedirs(args.cache, exist_ok=True)
    # The tag must identify the INPUT surface too — without it a rerun with
    # a different --mesh would silently reuse the previous mesh's sampled
    # points/Laplacian/ARPACK pairs from the cache.
    mesh_id = hashlib.sha1(
        (os.path.abspath(args.mesh)
         + str(os.path.getmtime(args.mesh))).encode()
    ).hexdigest()[:10]
    tag = f"n{args.n}_nn{args.n_neighbors}_m{mesh_id}"
    geo_path = os.path.join(args.cache, f"geo_{tag}.npz")
    eig_path = os.path.join(args.cache, f"arpack_{tag}_k{args.k}.npz")

    if os.path.exists(geo_path):
        z = np.load(geo_path)
        pts, faces = z["pts"], z["faces"]
        L = sp.csr_matrix((z["L_data"], z["L_indices"], z["L_indptr"]))
        M = sp.diags(z["M_diag"]).tocsr()
        out.update(sample_s=float(z["sample_s"]), triangulate_s=float(z["triangulate_s"]),
                   laplacian_s=float(z["laplacian_s"]), n_faces=int(faces.shape[0]),
                   dmax=int(z["dmax"]), geo_cached=True)
        print(f"[cloud{args.n}] geometry stages from cache {geo_path}",
              file=sys.stderr, flush=True)
    else:
        src = load_mesh(args.mesh)

        t0 = time.time()
        pts = sample_surface(src.vertices, src.faces, args.n)
        out["sample_s"] = round(time.time() - t0, 1)

        t0 = time.time()
        faces = local_triangulation(pts, n_neighbors=args.n_neighbors)
        out["triangulate_s"] = round(time.time() - t0, 1)
        out["n_faces"] = int(faces.shape[0])
        print(f"[cloud{args.n}] triangulated: {faces.shape[0]} faces "
              f"in {out['triangulate_s']}s", file=sys.stderr, flush=True)

        t0 = time.time()
        L, M = robust_laplacian(pts, faces)
        out["laplacian_s"] = round(time.time() - t0, 1)
        L = L.tocsr()
        deg = np.diff(L.indptr)
        out["dmax"] = int(deg.max())
        print(f"[cloud{args.n}] laplacian in {out['laplacian_s']}s "
              f"(dmax {out['dmax']})", file=sys.stderr, flush=True)
        np.savez(geo_path, pts=pts, faces=faces, L_data=L.data,
                 L_indices=L.indices, L_indptr=L.indptr,
                 M_diag=np.asarray(M.diagonal()), dmax=out["dmax"],
                 sample_s=out["sample_s"], triangulate_s=out["triangulate_s"],
                 laplacian_s=out["laplacian_s"])

    results = {}
    if not args.skip_arpack:
        if os.path.exists(eig_path):
            z = np.load(eig_path)
            results["shift_invert"] = (z["lam"], z["phi"])
            out["arpack_wall_s"] = float(z["wall_s"])
            out["arpack_cached"] = True
            print(f"[cloud{args.n}] arpack pairs from cache {eig_path}",
                  file=sys.stderr, flush=True)
        else:
            t0 = time.time()
            lam, phi = solve_generalized_eigenproblem(L, M, args.k, method="shift_invert")
            out["arpack_wall_s"] = round(time.time() - t0, 1)
            results["shift_invert"] = (np.asarray(lam), np.asarray(phi))
            print(f"[cloud{args.n}] arpack in {out['arpack_wall_s']}s",
                  file=sys.stderr, flush=True)
            np.savez(eig_path, lam=results["shift_invert"][0],
                     phi=results["shift_invert"][1], wall_s=out["arpack_wall_s"])

    t0 = time.time()
    lam, phi = solve_generalized_eigenproblem(L, M, args.k, method="chefsi")
    out["chefsi_wall_s"] = round(time.time() - t0, 1)
    results["chefsi"] = (np.asarray(lam), np.asarray(phi))
    if not args.skip_warm:
        t0 = time.time()
        solve_generalized_eigenproblem(L, M, args.k, method="chefsi")
        out["chefsi_warm_wall_s"] = round(time.time() - t0, 1)

    if len(results) == 2:
        (lc, pc), (ls, ps) = results["chefsi"], results["shift_invert"]
        denom = np.maximum(np.abs(ls[: args.k]), 1e-8).max()
        out["eigenvalue_max_rel_dev"] = float(
            f"{np.abs(lc[: args.k] - ls[: args.k]).max() / denom:.3e}"
        )
        Md = M.diagonal()
        G = (ps * Md[:, None]).T @ pc
        s = np.linalg.svd(G, compute_uv=False)
        out["max_principal_angle_deg"] = float(
            f"{np.degrees(np.arccos(np.clip(s, 0.0, 1.0))).max():.4f}"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
