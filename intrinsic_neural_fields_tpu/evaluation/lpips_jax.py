"""LPIPS (AlexNet backbone) in JAX (reference eval.py:10,113,175 uses the
`lpips` pip package x100).

The metric: push both images (scaled to [-1,1], normalized by the ImageNet
shift/scale the LPIPS authors use) through AlexNet's five conv stages,
unit-normalize each activation along channels, take the squared difference,
apply the learned 1x1 linear calibration weights, average spatially, and sum
over stages.

Weights cannot be downloaded in this environment, so this module loads them
from an .npz produced by `convert_torch_weights` (run once wherever the
official `lpips` torch checkpoint is available). Callers must treat
`available() == False` as "skip the LPIPS column" — the eval CLI does.
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp
from jax import lax

# Input normalization from the LPIPS reference implementation.
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

# AlexNet feature extractor: (out_ch, kernel, stride, pad), maxpool-before?
_ALEX_CFG = [
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]

DEFAULT_WEIGHTS_PATH = os.path.join(
    os.path.dirname(__file__), "weights", "lpips_alex.npz"
)


def convert_torch_weights(out_path=DEFAULT_WEIGHTS_PATH):
    """Convert torchvision AlexNet features + lpips lin weights to .npz.

    Requires the `lpips` pip package and its checkpoint (internet or cache);
    run offline, commit the ~9MB npz, and the JAX metric works everywhere.
    """
    import torch
    import lpips as lpips_torch

    net = lpips_torch.LPIPS(net="alex")
    arrays = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
            [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
            [m for m in net.net.slice5]
    convs = [m for m in convs if isinstance(m, torch.nn.Conv2d)]
    for i, conv in enumerate(convs):
        arrays[f"conv{i}_w"] = conv.weight.detach().numpy()
        arrays[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        arrays[f"lin{i}_w"] = lin.model[-1].weight.detach().numpy()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **arrays)
    return out_path


class LPIPS:
    def __init__(self, weights_path=DEFAULT_WEIGHTS_PATH):
        self.weights_path = weights_path
        self._weights = None
        if os.path.exists(weights_path):
            self._weights = dict(np.load(weights_path))

    def available(self):
        return self._weights is not None

    def _features(self, x):
        """x: [1,3,H,W] in [-1,1]. Returns list of 5 stage activations."""
        w = self._weights
        h = (x - _SHIFT.reshape(1, 3, 1, 1)) / _SCALE.reshape(1, 3, 1, 1)
        feats = []
        for i, (out_ch, k, stride, pad, pool_before) in enumerate(_ALEX_CFG):
            if pool_before:
                h = lax.reduce_window(
                    h, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
                )
            h = lax.conv_general_dilated(
                h,
                jnp.asarray(w[f"conv{i}_w"]),
                window_strides=(stride, stride),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + jnp.asarray(w[f"conv{i}_b"]).reshape(1, -1, 1, 1)
            h = jnp.maximum(h, 0.0)
            feats.append(h)
        return feats

    def __call__(self, fake_img, real_img):
        """LPIPS distance for [H,W,3] images in [0,1] (like the eval CLI uses).

        The torch package maps [0,1] -> [-1,1] internally when called on
        0..1 tensors with normalize=True; the reference passes raw [0,1]
        tensors WITHOUT normalize, i.e. the packaged model sees them as
        already [-1,1]. We reproduce the reference call exactly: inputs are
        used as-is.
        """
        assert self.available(), "LPIPS weights missing; run convert_torch_weights"
        to_nchw = lambda im: jnp.asarray(im, jnp.float32).transpose(2, 0, 1)[None]
        f0 = self._features(to_nchw(fake_img))
        f1 = self._features(to_nchw(real_img))
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            # Upstream lpips normalize_tensor adds eps OUTSIDE the sqrt:
            # x / (sqrt(sum(x^2)) + 1e-10).
            na = a / (jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True)) + 1e-10)
            nb = b / (jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True)) + 1e-10)
            diff = (na - nb) ** 2
            lin = jnp.asarray(self._weights[f"lin{i}_w"]).reshape(1, -1, 1, 1)
            total = total + jnp.mean(jnp.sum(diff * lin, axis=1))
        return float(total)
