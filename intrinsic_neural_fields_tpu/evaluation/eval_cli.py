"""Evaluation pipeline: render every view of a split, compute masked PSNR /
DSSIM / LPIPS, save images + metrics pickle, print split means
(reference eval.py:33-193).

Masking follows the reference exactly: the metric mask is the logical AND of
the dataset object mask and the ray-hit mask returned by the renderer
(eval.py:144-149); both images get a white background outside it.
"""
from __future__ import annotations

import os
import pickle

import numpy as np

from ..data.datasets import MeshroomRadialK3Dataset, MeshViewsDataset
from ..render.renderer import make_renderer_with_trained_model
from ..utils.io import imwrite
from .lpips_jax import LPIPS
from .metrics import dssim, psnr


def evaluate_views(output_path, config, dataset_path, split, background="white",
                   lpips_weights_path=None, n_devices=None, renderer=None):
    """renderer: optional pre-built Renderer (texture transfer / cross-
    discretization evaluation swaps the mesh and eigenbasis first — the
    metrics protocol is unchanged)."""
    H, W = config["data"]["img_height"], config["data"]["img_width"]

    dataset_type = config["data"].get("type")
    if dataset_type is None:
        dataset = MeshViewsDataset(dataset_path, split, H=H, W=W, background=background)
    elif dataset_type == "meshroom_radial_k3":
        dataset = MeshroomRadialK3Dataset(dataset_path, split, H=H, W=W)
    else:
        raise NotImplementedError(f"Unknown dataset type: {dataset_type}")

    if renderer is None:
        renderer = make_renderer_with_trained_model(config, n_devices=n_devices)
    renderer.background = background

    lpips_fn = LPIPS() if lpips_weights_path is None else LPIPS(lpips_weights_path)
    if not lpips_fn.available():
        print(
            "WARNING: LPIPS weights not found; LPIPS column will be NaN. "
            "Run evaluation.lpips_jax.convert_torch_weights once to enable it."
        )

    os.makedirs(output_path, exist_ok=True)
    eval_metrics_results = {}
    totals = {"psnr": 0.0, "dssim_rescaled": 0.0, "lpips_rescaled": 0.0}
    total = 0

    # Pipelined view loop: view i+1's trace+inference is dispatched before
    # view i's colors are fetched and its (host-side) metrics computed, so
    # the device never idles on the wire or on SSIM convolutions.
    from ..utils.pipeline import pipelined_foreach

    def _finish(item, handle):
        i, batch = item
        nonlocal total
        view_id = f"{i:03d}"
        fake_img, hit_ray_idxs = renderer.render_fetch(handle)

        hit_ray_mask = np.zeros(H * W, dtype=bool)
        hit_ray_mask[hit_ray_idxs] = True
        obj_mask_1d = hit_ray_mask & np.asarray(batch["obj_mask_1d"])

        fake_img_raw = fake_img.copy()

        bg = ~obj_mask_1d
        fake_img = fake_img.reshape(-1, 3)
        fake_img[bg] = 1.0
        fake_img = fake_img.reshape(H, W, 3)
        real_img = np.asarray(batch["img"], dtype=np.float32).reshape(-1, 3)
        real_img[bg] = 1.0
        real_img = real_img.reshape(H, W, 3)

        metrics = {
            "psnr": psnr(fake_img, real_img, obj_mask_1d),
            "dssim_rescaled": dssim(fake_img, real_img) * 100.0,
            "lpips_rescaled": (
                lpips_fn(fake_img, real_img) * 100.0 if lpips_fn.available() else float("nan")
            ),
        }
        for k in totals:
            totals[k] += metrics[k]
        total += 1
        eval_metrics_results[view_id] = metrics

        imwrite(os.path.join(output_path, f"{view_id}_fake_raw.png"), fake_img_raw)
        imwrite(os.path.join(output_path, f"{view_id}_fake.png"), fake_img)
        imwrite(os.path.join(output_path, f"{view_id}_real.png"), real_img)

    def _dispatch(item):
        _, batch = item
        return renderer.render_async(
            batch["camCv2world"],
            batch["K"],
            eval_render=True,
            distortion_coeffs=batch.get("distortion_params"),
            distortion_type=batch.get("distortion_type"),
        )

    pipelined_foreach(enumerate(dataset), _dispatch, _finish, depth=1)

    with open(os.path.join(output_path, "evaluation_metrics.pkl"), "wb") as f:
        pickle.dump(eval_metrics_results, f)

    means = {k: v / total for k, v in totals.items()}
    print(
        f"PSNR: {means['psnr']}, DSSIM: {means['dssim_rescaled']}, "
        f"LPIPS: {means['lpips_rescaled']}"
    )
    return means, eval_metrics_results
