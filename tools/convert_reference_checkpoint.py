#!/usr/bin/env python
"""Convert a reference-trained torch checkpoint (model.pt) to our msgpack
format (model.ckpt).

Conversion also happens TRANSPARENTLY at load time (render/eval/bake accept
an out_dir containing only the reference's model.pt — see
utils/checkpoint.load_checkpoint), so this tool is for users who want the
converted artifact on disk, e.g. to keep serving from one format.

  python tools/convert_reference_checkpoint.py model.pt model.ckpt [--config cfg.yaml]

--config (the experiment's YAML, reference schema) additionally validates
keys/shapes against a freshly built model and casts dtypes.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("torch_pt", type=str)
    p.add_argument("out_ckpt", type=str)
    p.add_argument("--config", type=str, default=None,
                   help="experiment YAML; validates against the built model")
    args = p.parse_args()

    from intrinsic_neural_fields_tpu.utils.torch_convert import (
        convert_reference_state_dict,
        load_reference_state_dict,
    )

    variables = convert_reference_state_dict(
        load_reference_state_dict(args.torch_pt)
    )

    if args.config is not None:
        import yaml
        import jax

        from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh
        from intrinsic_neural_fields_tpu.models.factory import init_model, make_model
        from intrinsic_neural_fields_tpu.utils.torch_convert import (
            _check_against_template,
        )

        with open(args.config) as f:
            config = yaml.safe_load(f)
        mesh = load_mesh(config["data"]["mesh_path"])
        model = make_model(config["model"], mesh=mesh)
        template = jax.device_get(init_model(model, config["model"], mesh=mesh))
        variables = _check_against_template(variables, template)

    from intrinsic_neural_fields_tpu.utils.checkpoint import save_checkpoint

    save_checkpoint(args.out_ckpt, variables)
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(variables))
    print(f"wrote {args.out_ckpt} ({n} parameters)")


if __name__ == "__main__":
    main()
