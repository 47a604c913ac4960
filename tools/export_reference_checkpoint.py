#!/usr/bin/env python
"""Export a model trained with this framework to the reference's torch
format (model.pt), so the field runs under the reference implementation
(its utils.py:22-29 loader accepts the raw state_dict this writes).

  python tools/export_reference_checkpoint.py config.yaml out_model.pt \
      [--weights model.ckpt]

config.yaml is the experiment's YAML (reference schema); --weights names the
checkpoint inside training.out_dir (default model.ckpt = best weights).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", type=str)
    p.add_argument("out_pt", type=str)
    p.add_argument("--weights", type=str, default="model.ckpt",
                   help="checkpoint file name inside training.out_dir")
    args = p.parse_args()

    import jax
    import torch
    import yaml

    from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh
    from intrinsic_neural_fields_tpu.models.factory import init_model, make_model
    from intrinsic_neural_fields_tpu.utils.checkpoint import load_checkpoint
    from intrinsic_neural_fields_tpu.utils.torch_convert import (
        export_reference_state_dict,
    )

    with open(args.config) as f:
        config = yaml.safe_load(f)
    mesh = load_mesh(config["data"]["mesh_path"])
    model = make_model(config["model"], mesh=mesh)
    template = jax.device_get(init_model(model, config["model"], mesh=mesh))
    variables = load_checkpoint(
        os.path.join(config["training"]["out_dir"], args.weights), template
    )

    sd = export_reference_state_dict(jax.device_get(variables), config["model"])
    torch.save({k: torch.from_numpy(v.copy()) if v.ndim else torch.tensor(v)
                for k, v in sd.items()}, args.out_pt)
    print(f"wrote {args.out_pt} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
