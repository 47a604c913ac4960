#!/usr/bin/env python
"""Evaluate a trained field on a DIFFERENT mesh WITHOUT functional-map
alignment — the baselines of the transfer experiment:

  * extrinsic (xyz / ff / rff) fields: features are the target mesh's vertex
    positions. On a re-discretization of the same surface this works (the
    positions are unchanged); on a DEFORMED shape it must fail — positions
    moved, and the texture does not follow. This is the scientific control
    for the paper's headline claim (an intrinsic field transfers where an
    extrinsic one cannot; reference texture_transfer notebooks).
  * intrinsic fields with --efuncs: swap in the target's OWN eigenbasis
    (skip-first, standard rescale), with no alignment. The reference's
    cat_dense notebook does exactly this ("uses skip-first 512 basis
    directly"); sign/rotation ambiguity inside degenerate eigenvalue shells
    is the known failure mode this tests.

Usage:
  python tools/eval_on_mesh.py --config_path out/synthetic/xyz_blob/config.yaml \
      --target_mesh data/transfer_hq/deformed.obj \
      --eval_dataset data/transfer_hq/deformed_views --eval_split test \
      --out_dir out/transfer_hq/deformed_xyz
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from intrinsic_neural_fields_tpu.evaluation.eval_cli import evaluate_views  # noqa: E402
from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh  # noqa: E402
from intrinsic_neural_fields_tpu.render.renderer import (  # noqa: E402
    make_renderer_with_trained_model,
)
from intrinsic_neural_fields_tpu.spectral.features import (  # noqa: E402
    load_first_k_eigenfunctions,
)
from intrinsic_neural_fields_tpu.train.config import load_config  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", required=True)
    p.add_argument("--target_mesh", required=True)
    p.add_argument("--eval_dataset", required=True)
    p.add_argument("--eval_split", default="test")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--efuncs",
                   help="target's own skip-first basis .npy (intrinsic "
                        "direct-swap baseline); omit for extrinsic fields")
    p.add_argument("--background", default="white")
    args = p.parse_args()

    config = load_config(args.config_path)
    target = load_mesh(args.target_mesh)
    renderer = make_renderer_with_trained_model(config)
    renderer.mesh = target

    strategy = config["model"].get("feature_strategy", "efuncs")
    if strategy == "efuncs":
        assert args.efuncs, "--efuncs required for an intrinsic field"
        E = load_first_k_eigenfunctions(
            args.efuncs, config["model"]["k"],
            rescale_strategy=config["data"].get("rescale_strategy", "standard"),
        )
        assert E.shape[0] == target.num_vertices, (E.shape, target.num_vertices)
        renderer.set_eigenfunctions(E)
    else:
        renderer.features = jnp.asarray(target.vertices, jnp.float32)
    renderer._refresh_geometry()

    os.makedirs(args.out_dir, exist_ok=True)
    evaluate_views(
        args.out_dir, config, args.eval_dataset, args.eval_split,
        background=args.background, renderer=renderer,
    )


if __name__ == "__main__":
    main()
