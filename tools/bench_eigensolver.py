#!/usr/bin/env python
"""CheFSI-vs-ARPACK eigensolver wall-time at preprocessing scale.

Solves L phi = lambda M phi for the k smallest pairs of a ~10k-vertex
icosphere's cotan Laplacian with (a) the on-device CheFSI path and (b) the
host shift-invert ARPACK oracle (reference mesh.py:140 semantics), reports
wall times and subspace agreement (principal angles are tested in
tests/test_spectral.py; here we report eigenvalue deviation).

`python tools/bench_eigensolver.py [--k 512] [--subdiv 5]`
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=512)
    p.add_argument("--subdiv", type=int, default=5)
    args = p.parse_args()

    from intrinsic_neural_fields_tpu.geometry.laplacian import (
        cotan_laplacian, voronoi_mass_matrix,
    )
    from intrinsic_neural_fields_tpu.geometry.primitives import icosphere
    from intrinsic_neural_fields_tpu.spectral.eigensolver import (
        solve_generalized_eigenproblem,
    )

    mesh = icosphere(args.subdiv)
    V = mesh.vertices.shape[0]
    L = cotan_laplacian(mesh.vertices, mesh.faces)
    M = voronoi_mass_matrix(mesh.vertices, mesh.faces)

    out = {"n_vertices": int(V), "k": args.k}
    results = {}
    for method in ("chefsi", "shift_invert"):
        t0 = time.time()
        lam, phi = solve_generalized_eigenproblem(L, M, args.k, method=method)
        results[method] = np.asarray(lam)
        out[f"{method}_wall_s"] = round(time.time() - t0, 2)
        if method == "chefsi":
            # second solve reuses the jit cache: separates the one-time
            # compile cost (minutes over the remote-compile tunnel) from the
            # steady-state iteration time
            t0 = time.time()
            solve_generalized_eigenproblem(L, M, args.k, method=method)
            out["chefsi_warm_wall_s"] = round(time.time() - t0, 2)

    lc, ls = results["chefsi"][: args.k], results["shift_invert"][: args.k]
    denom = np.maximum(np.abs(ls), 1e-8)
    out["eigenvalue_max_rel_dev"] = float(f"{np.abs(lc - ls).max() / denom.max():.3e}")
    out["speedup"] = round(out["shift_invert_wall_s"] / out["chefsi_wall_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
