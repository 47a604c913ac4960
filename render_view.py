#!/usr/bin/env python
"""Render a single camera view of a trained field at a chosen resolution
(reference render_view.py)."""
import argparse

import cv2

from intrinsic_neural_fields_tpu.geometry.cameras import cam_resize, load_extr_and_intr_camera
from intrinsic_neural_fields_tpu.render.renderer import make_renderer_with_trained_model
from intrinsic_neural_fields_tpu.train.config import load_config


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_path", type=str)
    parser.add_argument("--config_path", type=str)
    parser.add_argument("--cameras_path", type=str)
    parser.add_argument("--height", nargs="?", type=int, default=None)
    parser.add_argument("--width", nargs="?", type=int, default=None)
    parser.add_argument("--num_devices", type=int, default=None)
    return parser.parse_args()


def main():
    from intrinsic_neural_fields_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    args = parse_args()
    config = load_config(args.config_path)

    renderer = make_renderer_with_trained_model(config, n_devices=args.num_devices)
    camCv2world, K = load_extr_and_intr_camera(args.cameras_path)
    cam_intrinsic = {
        "K": K,
        "height": config["data"]["img_height"],
        "width": config["data"]["img_width"],
    }

    height = args.height if args.height is not None else config["data"]["img_height"]
    width = args.width if args.width is not None else config["data"]["img_width"]
    cam = cam_resize(cam_intrinsic, height, width)

    renderer.set_height(cam["height"])
    renderer.set_width(cam["width"])
    view = renderer.render(camCv2world, cam["K"])

    cv2.imwrite(args.output_path, (view[..., ::-1] * 255.0 + 0.5).clip(0, 255).astype("uint8"))


if __name__ == "__main__":
    main()
