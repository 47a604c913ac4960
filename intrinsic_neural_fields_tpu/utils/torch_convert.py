"""Convert reference-trained torch checkpoints into this framework's variables.

The reference trains TextureField / TextureFieldWithViewDependency with
torch and saves either a raw ``state_dict`` (``model.pt``,
reference trainer.py:270-274,337) or a checkpoint dict with a
``model_state_dict`` entry (reference trainer.py:302-313); utils.py:22-29
accepts both. This module maps those tensors onto the flax module trees in
``models/texture_field.py`` so a reference user can point our render/eval
CLIs at an out_dir they trained with the reference code and keep their
weights. NeuTex has its own converter (``models/neutex.py``).

Name mapping (torch -> flax), structure INFERRED from the state_dict alone:
  layers.{i}.0.{weight,bias}            -> params/Dense_{c}/{kernel,bias}
  layers.{skip}.Lx / .Ly                -> params/Dense_{c}, Dense_{c+1}
  layers.{i}.2.* / layers.{skip}.batchnorm.*
                                        -> params/BatchNorm_{i}/{scale,bias},
                                           batch_stats/BatchNorm_{i}/{mean,var}
  embedding.B (RandomFourierFeatEnc)    -> buffers/RandomFourierFeatEnc_0/B
  spatial_mlp.* + directional_mlp.{0,2}.*
                                        -> params/spatial_mlp/... + Dense_0/1
Linear weights transpose ([out,in] -> [in,out]); a DataParallel ``module.``
prefix is stripped; ``num_batches_tracked`` is dropped (flax BatchNorm keeps
no step counter).
"""
from __future__ import annotations

import io

import numpy as np

__all__ = [
    "load_reference_state_dict",
    "convert_reference_state_dict",
    "convert_reference_checkpoint_bytes",
    "load_reference_train_checkpoint",
    "export_reference_state_dict",
]


def load_reference_state_dict(path_or_bytes):
    """state_dict (name -> numpy array) from a reference .pt file/bytes.

    Accepts both on-disk formats the reference produces (raw state_dict and
    ``{"model_state_dict": ...}`` checkpoint dicts, reference utils.py:22-29)
    and strips torch.nn.DataParallel's ``module.`` prefix (train.py:46-48).
    """
    import torch

    src = (
        io.BytesIO(path_or_bytes)
        if isinstance(path_or_bytes, (bytes, bytearray))
        else path_or_bytes
    )
    try:
        obj = torch.load(src, map_location="cpu", weights_only=True)
    except Exception:
        # checkpoint dicts carry numpy/python RNG-state entries alongside
        # model_state_dict (reference trainer.py:302-313) which the
        # weights_only allowlist rejects; fall back for those files
        if hasattr(src, "seek"):
            src.seek(0)
        obj = torch.load(src, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {
        name: np.asarray(tensor.detach().numpy())
        for name, tensor in _strip_module_prefix(obj).items()
    }


def _convert_texture_field(sd, prefix=""):
    """Flax variable collections for one TextureField from torch keys
    ``{prefix}layers.*`` (+ optional ``{prefix}embedding.B``)."""
    params, batch_stats, buffers = {}, {}, {}

    layer_idxs = set()
    for name in sd:
        if name.startswith(prefix + "layers."):
            layer_idxs.add(int(name[len(prefix + "layers."):].split(".")[0]))
    if not layer_idxs:
        raise ValueError(
            f"no '{prefix}layers.*' entries — not a reference TextureField "
            f"state_dict (keys: {sorted(sd)[:8]}...)"
        )
    num_layers = max(layer_idxs) + 1

    def dense(torch_prefix):
        w = sd[torch_prefix + ".weight"]
        b = sd[torch_prefix + ".bias"]
        return {"kernel": np.ascontiguousarray(w.T), "bias": b}

    def bnorm(torch_prefix, flax_name):
        params[flax_name] = {
            "scale": sd[torch_prefix + ".weight"],
            "bias": sd[torch_prefix + ".bias"],
        }
        batch_stats[flax_name] = {
            "mean": sd[torch_prefix + ".running_mean"],
            "var": sd[torch_prefix + ".running_var"],
        }

    c = 0
    for i in range(num_layers):
        base = f"{prefix}layers.{i}"
        if f"{base}.Lx.weight" in sd:  # the input-skip layer
            params[f"Dense_{c}"] = dense(f"{base}.Lx")
            params[f"Dense_{c + 1}"] = dense(f"{base}.Ly")
            c += 2
            if f"{base}.batchnorm.weight" in sd:
                bnorm(f"{base}.batchnorm", f"BatchNorm_{i}")
        else:
            params[f"Dense_{c}"] = dense(f"{base}.0")
            c += 1
            if f"{base}.2.weight" in sd:
                bnorm(f"{base}.2", f"BatchNorm_{i}")

    if prefix + "embedding.B" in sd:
        buffers["RandomFourierFeatEnc_0"] = {"B": sd[prefix + "embedding.B"]}
    return params, batch_stats, buffers


def convert_reference_state_dict(sd):
    """Flax ``variables`` dict for a reference TextureField[WithViewDependency]
    state_dict. The variant is inferred: a ``spatial_mlp.`` prefix means the
    view-dependent model (reference model.py:123-191)."""
    if any(k.startswith("spatial_mlp.") for k in sd):
        params, batch_stats, buffers = _convert_texture_field(sd, "spatial_mlp.")
        params = {"spatial_mlp": params}
        if batch_stats:
            batch_stats = {"spatial_mlp": batch_stats}
        if buffers:
            buffers = {"spatial_mlp": buffers}
        # directional_mlp = Sequential(Linear, act, Linear, Sigmoid)
        for c, t in enumerate(("directional_mlp.0", "directional_mlp.2")):
            params[f"Dense_{c}"] = {
                "kernel": np.ascontiguousarray(sd[t + ".weight"].T),
                "bias": sd[t + ".bias"],
            }
    else:
        params, batch_stats, buffers = _convert_texture_field(sd)

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    if buffers:
        variables["buffers"] = buffers
    return variables


def _export_texture_field(params, batch_stats, buffers, model_config, prefix=""):
    """torch state_dict names for one TextureField — the exact inverse of
    _convert_texture_field, driven by the config because torch names need the
    per-layer indices (reference model.py:43-96: Linear at Sequential slot 0,
    BatchNorm1d at slot 2 on every non-output layer, the skip layer is
    LinearWithConcatAndActivation with Lx/Ly and an optional .batchnorm)."""
    num_layers = model_config["num_layers"]
    skip = model_config["skip_layer_idx"]
    batchnorm = model_config.get("batchnorm", False)
    sd = {}

    def put_dense(torch_prefix, flax_name):
        sd[torch_prefix + ".weight"] = np.ascontiguousarray(
            np.asarray(params[flax_name]["kernel"]).T
        )
        sd[torch_prefix + ".bias"] = np.asarray(params[flax_name]["bias"])

    def put_bnorm(torch_prefix, flax_name):
        sd[torch_prefix + ".weight"] = np.asarray(params[flax_name]["scale"])
        sd[torch_prefix + ".bias"] = np.asarray(params[flax_name]["bias"])
        sd[torch_prefix + ".running_mean"] = np.asarray(batch_stats[flax_name]["mean"])
        sd[torch_prefix + ".running_var"] = np.asarray(batch_stats[flax_name]["var"])
        # flax BatchNorm keeps no step counter; 0 is only consumed by torch's
        # momentum=None cumulative mode, which the reference never uses
        sd[torch_prefix + ".num_batches_tracked"] = np.asarray(0, dtype=np.int64)

    c = 0
    for i in range(num_layers):
        base = f"{prefix}layers.{i}"
        if i == skip:
            put_dense(f"{base}.Lx", f"Dense_{c}")
            put_dense(f"{base}.Ly", f"Dense_{c + 1}")
            c += 2
            if batchnorm:
                put_bnorm(f"{base}.batchnorm", f"BatchNorm_{i}")
        else:
            put_dense(f"{base}.0", f"Dense_{c}")
            c += 1
            if batchnorm and i < num_layers - 1:
                put_bnorm(f"{base}.2", f"BatchNorm_{i}")

    if buffers and "RandomFourierFeatEnc_0" in buffers:
        sd[prefix + "embedding.B"] = np.asarray(buffers["RandomFourierFeatEnc_0"]["B"])
    return sd


def export_reference_state_dict(variables, model_config):
    """Reference-format torch state_dict (name -> numpy array) from this
    framework's flax ``variables`` — the inverse of
    convert_reference_state_dict, so a field trained here runs under the
    reference implementation (its utils.py:22-29 loader accepts a raw
    state_dict). ``model_config`` is the experiment YAML's ``model`` section
    (reference schema; needed because torch names carry layer indices)."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    buffers = variables.get("buffers", {})

    if model_config.get("view_dependence") is not None:
        sd = _export_texture_field(
            params["spatial_mlp"],
            batch_stats.get("spatial_mlp", {}),
            buffers.get("spatial_mlp", {}),
            model_config,
            prefix="spatial_mlp.",
        )
        # directional_mlp = Sequential(Linear, act, Linear, Sigmoid)
        for c, t in enumerate(("directional_mlp.0", "directional_mlp.2")):
            sd[t + ".weight"] = np.ascontiguousarray(
                np.asarray(params[f"Dense_{c}"]["kernel"]).T
            )
            sd[t + ".bias"] = np.asarray(params[f"Dense_{c}"]["bias"])
        return sd
    return _export_texture_field(params, batch_stats, buffers, model_config)


def _check_against_template(tree, template, path=""):
    if isinstance(template, dict):
        t_keys, keys = set(template), set(tree) if isinstance(tree, dict) else set()
        if t_keys != keys:
            raise ValueError(
                f"converted checkpoint mismatch at '{path or '/'}': "
                f"model wants {sorted(t_keys)}, checkpoint has {sorted(keys)}"
            )
        return {
            k: _check_against_template(tree[k], template[k], f"{path}/{k}")
            for k in template
        }
    arr = np.asarray(tree)
    want = np.shape(template)
    if arr.shape != tuple(want):
        raise ValueError(
            f"converted checkpoint mismatch at '{path}': shape {arr.shape} "
            f"vs model {tuple(want)}"
        )
    return arr.astype(np.asarray(template).dtype)


def _strip_module_prefix(sd):
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def load_reference_train_checkpoint(path_or_bytes):
    """Parse a reference training checkpoint (``checkpoint.pt``, reference
    trainer.py:302-313) for resume: the converted model variables plus the
    torch Adam state mapped onto the same flax parameter tree.

    Returns ``{"epoch": int, "variables": {...}, "adam": {...}}`` where
    ``adam`` holds ``count`` (steps taken), ``mu``/``nu`` (first/second
    moments, shaped/transposed exactly like ``variables["params"]``) and the
    group hyperparameters ``lr``/``b1``/``b2``/``eps``.

    The torch/python/numpy RNG states in the file cannot seed a JAX PRNG;
    callers reseed, so the resumed batch order differs from a torch
    continuation (the optimizer trajectory itself carries over exactly).
    """
    import torch

    src = (
        io.BytesIO(path_or_bytes)
        if isinstance(path_or_bytes, (bytes, bytearray))
        else path_or_bytes
    )
    try:
        obj = torch.load(src, map_location="cpu", weights_only=True)
    except Exception:
        # the RNG-state entries (numpy arrays, python tuples) predate the
        # weights_only allowlist in some torch versions
        if hasattr(src, "seek"):
            src.seek(0)
        obj = torch.load(src, map_location="cpu", weights_only=False)
    if not (isinstance(obj, dict) and "optimizer_state_dict" in obj):
        raise ValueError(
            "not a reference training checkpoint (no 'optimizer_state_dict' "
            "entry) — for weights-only .pt files use "
            "convert_reference_checkpoint_bytes / load_checkpoint"
        )

    msd = _strip_module_prefix(obj["model_state_dict"])
    msd_np = {k: np.asarray(v.detach().numpy()) for k, v in msd.items()}
    variables = convert_reference_state_dict(msd_np)

    # torch param order = module registration order = the state_dict order
    # restricted to parameters. For TextureField[WithViewDependency] every
    # parameter tensor ends in .weight/.bias (Linear + BatchNorm); buffers are
    # embedding.B and the BatchNorm running stats/num_batches_tracked.
    param_names = [
        k for k in msd if k.endswith(".weight") or k.endswith(".bias")
    ]
    osd = obj["optimizer_state_dict"]
    groups = osd["param_groups"]
    if len(groups) != 1:
        raise ValueError(
            f"expected one Adam param group (reference config.py:102-110), "
            f"got {len(groups)}"
        )
    group = groups[0]
    # The mapped optax chain is plain Adam; silently dropping these options
    # would resume with a different optimizer than the checkpoint was
    # trained with.
    if float(group.get("weight_decay", 0.0) or 0.0) != 0.0:
        raise ValueError(
            "checkpoint's Adam group uses weight_decay="
            f"{group['weight_decay']} — the resume path maps onto plain "
            "optax.adam and cannot carry decoupled/L2 decay"
        )
    for flag in ("amsgrad", "maximize"):
        if bool(group.get(flag, False)):
            raise ValueError(
                f"checkpoint's Adam group sets {flag}=True — unsupported by "
                "the plain-Adam resume mapping"
            )
    if len(group["params"]) != len(param_names):
        raise ValueError(
            f"optimizer covers {len(group['params'])} params but the model "
            f"has {len(param_names)} — not a matching checkpoint"
        )

    # Convert exp_avg / exp_avg_sq through the SAME name mapping as the
    # weights: substitute each parameter tensor with its moment and re-run the
    # structural converter, so transposes/nesting can never diverge.
    sd_mu, sd_nu = dict(msd_np), dict(msd_np)
    steps = set()
    state = osd["state"]
    for i, name in zip(group["params"], param_names):
        st = state.get(i, state.get(str(i)))
        if st is None:  # Adam state is lazily created; 0 steps taken
            sd_mu[name] = np.zeros_like(msd_np[name])
            sd_nu[name] = np.zeros_like(msd_np[name])
            steps.add(0)
            continue
        sd_mu[name] = np.asarray(st["exp_avg"].detach().numpy())
        sd_nu[name] = np.asarray(st["exp_avg_sq"].detach().numpy())
        steps.add(int(st["step"]))
    if len(steps) != 1:
        raise ValueError(f"per-param Adam step counts disagree: {sorted(steps)}")

    b1, b2 = group["betas"]
    return {
        "epoch": int(obj["epoch"]),
        "variables": variables,
        "adam": {
            "count": steps.pop(),
            "mu": convert_reference_state_dict(sd_mu)["params"],
            "nu": convert_reference_state_dict(sd_nu)["params"],
            "lr": float(group["lr"]),
            "b1": float(b1),
            "b2": float(b2),
            "eps": float(group["eps"]),
        },
    }


def convert_reference_checkpoint_bytes(data, template=None):
    """Variables tree from raw reference-.pt bytes; validated (keys + shapes)
    and dtype-cast against ``template`` when given."""
    variables = convert_reference_state_dict(load_reference_state_dict(data))
    if template is not None:
        variables = _check_against_template(variables, template)
    return variables
