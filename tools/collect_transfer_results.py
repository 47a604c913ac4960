#!/usr/bin/env python
"""Collect the transfer-experiment metrics (scripts/run_transfer.sh) into one
markdown table + out/transfer_hq/summary.json."""
from __future__ import annotations

import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = "out/transfer_hq"

ROWS = [
    ("source mesh (no transfer)", "out/synthetic/intrinsic_blob_hq/test_eval",
     "the flagship field on its own discretization (eval.py)"),
    ("coarse remesh (2,562 v, FM)", f"{OUT}/coarse",
     "icosphere-4 decimation, P2P functional map"),
    ("dense remesh (40,962 v, FM)", f"{OUT}/dense",
     "icosphere-6 refinement, P2P functional map"),
    ("point cloud (10,242 pts, FM)", f"{OUT}/cloud",
     "local triangulation + pc_vert_robust Laplacian, P2P functional map"),
    ("deformed (twist, FM)", f"{OUT}/deformed_intrinsic",
     "intrinsic transfer onto the deformed shape, carried-texture GT"),
    ("deformed, xyz baseline", f"{OUT}/deformed_xyz",
     "extrinsic field on the deformed shape — expected to FAIL"),
    ("dense remesh, xyz baseline", f"{OUT}/dense_xyz",
     "extrinsic field on the undeformed remesh — control"),
    ("dense remesh, direct basis swap", f"{OUT}/dense_directswap",
     "target's own basis, NO functional map — degenerate-shell control"),
]


def load_means(path):
    pkl = os.path.join(path, "evaluation_metrics.pkl")
    if not os.path.exists(pkl):
        return None
    with open(pkl, "rb") as f:
        per_view = pickle.load(f)
    keys = next(iter(per_view.values())).keys()
    return {k: sum(v[k] for v in per_view.values()) / len(per_view) for k in keys}


def main():
    print("| Target | Test masked PSNR | DSSIM x100 | notes |")
    print("|---|---|---|---|")
    summary = {}
    for name, path, note in ROWS:
        m = load_means(path)
        if m is None:
            print(f"| {name} | (not run) | | {note} |")
            continue
        summary[name] = m
        print(f"| {name} | {m['psnr']:.2f} dB | {m['dssim_rescaled']:.3f} | {note} |")
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"\nWrote {OUT}/summary.json")


if __name__ == "__main__":
    main()
