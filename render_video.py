#!/usr/bin/env python
"""Turntable video rendering (reference render_video.py): fit the trained
camera's intrinsics into a target resolution via exact Fraction scaling plus
symmetric crop-padding to a "synthetic optimal" camera (centered principal
point, square pixels), render `turns` rotations about z, encode with ffmpeg.
"""
import argparse
import os
from fractions import Fraction
from os.path import basename, dirname, join

import numpy as np

from intrinsic_neural_fields_tpu.geometry.cameras import (
    cam_crop,
    cam_resize,
    load_extr_and_intr_camera,
)
from intrinsic_neural_fields_tpu.render.renderer import make_renderer_with_trained_model
from intrinsic_neural_fields_tpu.train.config import load_config
from intrinsic_neural_fields_tpu.utils.io import imwrite

resolutions = {
    "2160p": (3840, 2160),
    "1080p": (1920, 1080),
    "720p": (1280, 720),
}


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out_dir", type=str)
    parser.add_argument("--config_path", type=str)
    parser.add_argument("--cameras_path", type=str)
    parser.add_argument("--resolution", choices=tuple(resolutions.keys()), default="720p")
    parser.add_argument("--turns", type=float, default=2)
    parser.add_argument("--duration", type=float, default=15)
    parser.add_argument("--fps", type=int, default=60)
    parser.add_argument("--num_devices", type=int, default=None)
    return parser.parse_args()


def fit_camera_to_resolution(cam_orig, res):
    """Scale-then-pad so the original FOV sits centered in `res` with square
    pixels and a centered principal point (reference render_video.py:78-109)."""
    factor = min(
        Fraction(res[0], cam_orig["width"]), Fraction(res[1], cam_orig["height"])
    )
    new_width = cam_orig["width"] * factor
    new_height = cam_orig["height"] * factor
    assert int(new_width) == new_width and int(new_height) == new_height
    new_width, new_height = int(new_width), int(new_height)
    assert (res[0] - new_width) % 2 == 0 and (res[1] - new_height) % 2 == 0
    pad_w = (res[0] - new_width) // 2
    pad_h = (res[1] - new_height) // 2

    cam_resized = cam_resize(cam_orig, height=new_height, width=new_width)
    cam_render = cam_crop(cam_resized, height=res[1], width=res[0], col=-pad_w, row=-pad_h)

    assert cam_render["K"][0, 0] == cam_render["K"][1, 1]
    assert cam_render["width"] * 0.5 - 0.5 == cam_render["K"][0, 2]
    assert cam_render["height"] * 0.5 - 0.5 == cam_render["K"][1, 2]
    return cam_render


def main():
    from intrinsic_neural_fields_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    args = parse_args()
    config = load_config(args.config_path)
    # uint8 color transfers: video frames are 8-bit, so the quantization is
    # exactly the one the encoder would apply — halves the per-frame wire.
    renderer = make_renderer_with_trained_model(
        config, n_devices=args.num_devices, wire_u8=True
    )

    camCv2world, K = load_extr_and_intr_camera(args.cameras_path)
    cam_orig = {
        "K": K,
        "height": config["data"]["img_height"],
        "width": config["data"]["img_width"],
    }
    cam_render = fit_camera_to_resolution(cam_orig, resolutions[args.resolution])
    renderer.set_height(cam_render["height"])
    renderer.set_width(cam_render["width"])

    cam44 = np.eye(4, dtype=np.float32)
    cam44[:3, :4] = camCv2world[:3, :4]

    folder_name = basename(dirname(args.config_path))
    image_folder = join(args.out_dir, "images", f"{folder_name}_{args.resolution}")
    os.makedirs(image_folder, exist_ok=True)

    num_images = int(args.fps * args.duration)
    angles = np.linspace(0, args.turns * 360, num_images)
    # Pipelined render loop: dispatch frame i+1..i+depth before fetching
    # frame i, so the device computes the next frames while frame i crosses
    # the (slow) device->host wire (utils.pipeline.pipelined_foreach).
    from intrinsic_neural_fields_tpu.utils.pipeline import pipelined_foreach

    def dispatch(item):
        _, a = item
        st, ct = np.sin(np.deg2rad(a)), np.cos(np.deg2rad(a))
        pose_obj = np.eye(4, dtype=np.float32)
        pose_obj[:3, :3] = np.array([[ct, -st, 0], [st, ct, 0], [0, 0, 1]])
        pose_render = pose_obj @ cam44
        return renderer.render_async(pose_render[:3], cam_render["K"])

    def finish(item, handle):
        idx, _ = item
        imwrite(join(image_folder, f"{idx:04d}.jpg"), renderer.render_fetch(handle))

    pipelined_foreach(enumerate(angles), dispatch, finish, depth=2)

    import shutil as _shutil

    video_name = join(args.out_dir, f"{folder_name}_{args.resolution}.mp4")
    if _shutil.which("ffmpeg") is None:
        print(f"ffmpeg not found — frames left in {image_folder}; encode with:\n"
              f"  ffmpeg -framerate {args.fps} -pattern_type glob -i '{image_folder}/*.jpg' "
              f"-c:v libx264 -crf 17 -pix_fmt yuv420p {video_name}")
    else:
        os.system(
            f"ffmpeg -y -framerate {args.fps} -pattern_type glob -i '{image_folder}/*.jpg' "
            f"-c:v libx264 -crf 17 -pix_fmt yuv420p {video_name}"
        )


if __name__ == "__main__":
    main()
