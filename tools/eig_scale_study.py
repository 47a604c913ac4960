#!/usr/bin/env python
"""Where does CheFSI's at-scale wall time go? (VERDICT r2 #4 follow-up.)

The initial 163k/k=529 bench measured ARPACK 908s vs CheFSI 5167s with
parity degraded to 4.8e-4 — and warm == cold, so the cost is iteration,
not compile. This study decomposes one solve: the f32 DEVICE loop (filter
+ QR + Rayleigh-Ritz) is timed separately from the f64 HOST polish, each
with per-round residuals on stderr (INF_TPU_EIG_VERBOSE), against a cached
ARPACK reference basis so variants can be compared without re-paying the
15-minute shift-invert solve. Final round-3 numbers (adaptive chaining +
CholeskyQR2 + refine budget): CheFSI 4010s, parity 1.6e-9 / 0.0004 deg —
recorded in RESULTS.md "163k vertices".

`python tools/eig_scale_study.py [--subdiv 7] [--k 512] [--ref /tmp/ref.npz]
    [--refine/--no_refine] [--max_iter N] [--degree D]`
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("INF_TPU_EIG_VERBOSE", "1")


def parity(phi_ref, phi, M, k):
    Md = M.diagonal()
    G = (phi_ref[:, :k] * Md[:, None]).T @ phi[:, :k]
    s = np.linalg.svd(G, compute_uv=False)
    return float(np.degrees(np.arccos(np.clip(s, 0.0, 1.0))).max())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--subdiv", type=int, default=7)
    p.add_argument("--k", type=int, default=512)
    p.add_argument("--ref", default=None, help="cached ARPACK basis npz")
    p.add_argument("--no_refine", action="store_true")
    p.add_argument("--max_iter", type=int, default=30)
    p.add_argument("--degree", type=int, default=40)
    p.add_argument("--refine_rounds", type=int, default=12)
    p.add_argument("--refine_filter", default="device", choices=("host", "device"),
                   help="where the polish pre-filter runs (see _chefsi_device)")
    args = p.parse_args()

    from intrinsic_neural_fields_tpu.geometry.laplacian import (
        cotan_laplacian,
        voronoi_mass_matrix,
    )
    from intrinsic_neural_fields_tpu.geometry.primitives import icosphere
    from intrinsic_neural_fields_tpu.spectral.eigensolver import (
        _chefsi_device,
        solve_generalized_eigenproblem,
    )

    mesh = icosphere(args.subdiv)
    L = cotan_laplacian(mesh.vertices, mesh.faces)
    M = voronoi_mass_matrix(mesh.vertices, mesh.faces)
    out = {"n": int(L.shape[0]), "k": args.k}

    ref = args.ref or f"/tmp/eig_ref_s{args.subdiv}_k{args.k}.npz"
    if os.path.exists(ref):
        d = np.load(ref)
        lam_ref, phi_ref = d["lam"], d["phi"]
        print(f"[study] reusing ARPACK reference {ref}", file=sys.stderr)
    else:
        t0 = time.time()
        lam_ref, phi_ref = solve_generalized_eigenproblem(
            L, M, args.k, method="shift_invert"
        )
        out["arpack_wall_s"] = round(time.time() - t0, 1)
        np.savez(ref, lam=lam_ref, phi=phi_ref)
        print(f"[study] ARPACK {out['arpack_wall_s']}s -> {ref}", file=sys.stderr)

    t0 = time.time()
    lam, phi = _chefsi_device(
        L, M, args.k,
        refine=not args.no_refine,
        max_iter=args.max_iter,
        degree=args.degree,
        refine_rounds=args.refine_rounds,
        refine_filter=args.refine_filter,
    )
    out["chefsi_wall_s"] = round(time.time() - t0, 1)
    out["refine"] = not args.no_refine
    out["refine_filter"] = args.refine_filter
    out["eigenvalue_max_rel_dev"] = float(
        f"{np.abs(lam - lam_ref[: args.k]).max() / np.abs(lam_ref).max():.3e}"
    )
    out["max_principal_angle_deg"] = float(f"{parity(phi_ref, phi, M, args.k):.4f}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
