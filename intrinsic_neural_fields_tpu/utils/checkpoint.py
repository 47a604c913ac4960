"""Checkpointing via flax msgpack serialization.

The reference checkpoints {epoch, model, optimizer, RNG states} every
`checkpoint_every` epochs plus best/last snapshots (reference
trainer.py:270-337). Here the checkpoint payload is a pytree
{epoch, variables, opt_state, rng_key}; the PRNG key replaces torch/python/
numpy RNG states — it is the only randomness in the jitted training loop, so
restoring it reproduces the exact batch order.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path, pytree):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.to_bytes(jax.device_get(pytree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path, template):
    """Restore a pytree saved by save_checkpoint. `template` must have the
    same structure (e.g. a freshly initialized state).

    Reference-trained torch checkpoints (``model.pt``) are detected by file
    magic and converted transparently (utils/torch_convert.py), so render/
    eval can consume an out_dir produced by the reference implementation."""
    with open(path, "rb") as f:
        data = f.read()
    if _is_torch_checkpoint(data):
        from .torch_convert import convert_reference_checkpoint_bytes

        return convert_reference_checkpoint_bytes(data, template)
    return serialization.from_bytes(template, data)


def resolve_weights_path(out_dir, weights_name="model.ckpt"):
    """Path of the trained weights in an out_dir: ours (`weights_name`), or a
    reference-trained ``model.pt`` when that's what the directory contains
    (reference trainer.py:270-274; converted on load by load_checkpoint).

    The ``model.pt`` substitution applies only when the DEFAULT checkpoint is
    requested — a caller naming a specific checkpoint (e.g. an epoch snapshot)
    must get a FileNotFoundError from its open(), not silently different
    weights."""
    path = os.path.join(out_dir, weights_name)
    if weights_name == "model.ckpt" and not os.path.exists(path):
        ref_path = os.path.join(out_dir, "model.pt")
        if os.path.exists(ref_path):
            return ref_path
    return path


def _is_torch_checkpoint(data):
    # torch zip archives start with "PK"; legacy torch files are pickles
    # (0x80 + protocol). flax msgpack maps start at 0x81+ (fixmap with >=1
    # entry), so neither prefix collides with save_checkpoint's output.
    return data[:2] == b"PK" or (len(data) > 1 and data[0] == 0x80 and data[1] in (2, 3, 4, 5))


def save_npz_pytree(path, tree):
    """Template-free checkpoint: nested dicts of arrays flattened to an npz
    with '/'-joined keys. Used where the loader has no structure template
    (e.g. pretrained NeuTex mapping weights)."""
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            flat[prefix] = np.asarray(node)

    rec("", jax.device_get(tree))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_npz_pytree(path):
    """Inverse of save_npz_pytree: npz -> nested dict of numpy arrays."""
    flat = np.load(path)
    out = {}
    for key in flat.files:
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return out
