#!/usr/bin/env python
"""Training CLI (reference train.py): `python train.py config.yaml
[--allow_checkpoint_loading]`.

The reference's --data_parallel flag (torch DataParallel, train.py:46-48)
is replaced by --num_devices: the jitted epoch runs data-parallel over a
jax.sharding.Mesh via shard_map (see intrinsic_neural_fields_tpu/parallel).
"""
import argparse

from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh
from intrinsic_neural_fields_tpu.train import (
    Trainer,
    get_data,
    get_loss_fn,
    get_model_and_optim,
    get_renderer,
    load_config_file,
)


def parse_args():
    parser = argparse.ArgumentParser(description="Train a texture field")
    parser.add_argument("config_path", type=str)
    parser.add_argument("--allow_checkpoint_loading", action="store_true")
    parser.add_argument(
        "--num_devices",
        type=int,
        default=1,
        help="Data-parallel training over this many devices (1 = single chip)",
    )
    return parser.parse_args()


def main():
    from intrinsic_neural_fields_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    args = parse_args()
    config = load_config_file(args.config_path, args.allow_checkpoint_loading)

    mesh = load_mesh(config["data"]["mesh_path"])
    data = get_data(config, mesh=mesh)
    model, variables, optimizer = get_model_and_optim(config, mesh)
    renderer = get_renderer(config, model, variables, mesh)

    loss_type = config["training"]["loss_type"]
    get_loss_fn(loss_type)  # validate early

    trainer = Trainer(
        model, variables, optimizer, loss_type, renderer, data, mesh, config
    )
    if args.num_devices > 1:
        from intrinsic_neural_fields_tpu.parallel import parallelize_trainer

        parallelize_trainer(trainer, args.num_devices)
    trainer.train()


if __name__ == "__main__":
    main()
