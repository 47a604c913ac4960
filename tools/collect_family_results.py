#!/usr/bin/env python
"""Collect the per-family E2E quality numbers into one table.

Reads each out/synthetic/<family>/test_eval/evaluation_metrics.pkl written by
eval.py (reference eval.py:183-193 protocol) plus the final train/val
epoch-PSNR from the family training log, and prints a markdown table row per
family (pasted into RESULTS.md).

`python tools/collect_family_results.py [--log /tmp/family_runs.log]`
"""
from __future__ import annotations

import argparse
import os
import pickle
import re

import numpy as np

FAMILIES = [
    "tf_rff_blob",
    "xyz_blob",
    "hks_blob",
    "shot_blob",
    "viewdep_intrinsic_blob",
    "viewdep_extrinsic_blob",
    "neutex_blob",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log", default="/tmp/family_runs.log")
    p.add_argument("--out_root", default="out/synthetic")
    args = p.parse_args()

    final_epoch = {}
    if os.path.exists(args.log):
        fam = None
        for line in open(args.log, errors="ignore"):
            m = re.match(r"=== (\S+) ===", line)
            if m:
                fam = m.group(1)
            m = re.search(
                r"Train PSNR: ([\d.]+), Val Loss: [\d.e-]+, Val PSNR: ([\d.]+)", line
            )
            if m and fam:
                final_epoch[fam] = (float(m.group(1)), float(m.group(2)))

    print("| Family | Train epoch-PSNR | Val epoch-PSNR | Test masked PSNR | Test DSSIM x100 |")
    print("|---|---|---|---|---|")
    for fam in FAMILIES:
        pkl = os.path.join(args.out_root, fam, "test_eval", "evaluation_metrics.pkl")
        if not os.path.exists(pkl):
            print(f"| {fam} | — | — | (missing) | — |")
            continue
        with open(pkl, "rb") as f:
            metrics = pickle.load(f)
        psnr = np.mean([m["psnr"] for m in metrics.values()])
        dssim = np.mean([m["dssim_rescaled"] for m in metrics.values()])
        tr, va = final_epoch.get(fam, (float("nan"), float("nan")))
        print(f"| {fam} | {tr:.2f} dB | {va:.2f} dB | {psnr:.2f} dB | {dssim:.3f} |")


if __name__ == "__main__":
    main()
