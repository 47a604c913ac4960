"""YAML config system + factories (reference config.py).

The YAML schema is identical to the reference's (seed / data.* / model.* /
training.*), so reference experiment configs run unmodified (paths aside).
Deliberate fixes over the reference, documented per SURVEY section 2.4:
  - the test loader is actually constructed when `preproc_data_path_test` is
    present (reference config.py:85 used hasattr on a dict, always False);
  - embed_strategy / eigenvalues_path are passed as keywords (the reference
    swapped them positionally, config.py:64-66).

TPU-specific training.* extensions beyond the reference schema (all
default to reference behavior when absent):
  shuffle: "full" (reference per-sample permutation) | "blocks" (streaming)
  fused_mlp: bool — one-Pallas-kernel train step (train/steps.py)
  fused_adam: bool — fold Adam into the kernel (default true on the fused
    streaming path; see steps._adam_opt_view for eligibility)
  fused_interleave: int — independent sub-tile chains per kernel tile
    (default 4, measured 14% faster device step at cat scale; 1 restores
    the bit-exact historical op order)
  sorted_gather: bool — ascending per-batch gathers in full-shuffle mode
  precompute_dtype (data.*): "bfloat16" halves the hit-feature table
  profile_dir: capture a jax.profiler trace of one epoch
  num_devices via the train.py flag — shard_map data parallelism
"""
from __future__ import annotations

import os
from shutil import copyfile

import optax
import yaml

from ..data.sampler import create_ray_data
from ..geometry.mesh import load_mesh
from ..models.factory import init_model, make_model
from ..render.renderer import Renderer
from ..spectral.features import load_first_k_eigenfunctions
from .losses import get_loss_fn  # re-exported for CLI convenience  # noqa: F401


def _pretty_print_config(config, path):
    print("----------------------------------------------------------------")
    print(f"Loaded Config from {path}")
    print("================================================================")
    print(yaml.dump(config, default_flow_style=False))
    print("================================================================\n")


def _normalize_k(config):
    """Expand the compact eigenfunction-index spec `k: {ranges: [[a,b], ...]}`
    (half-open ranges) into the explicit index list the rest of the stack
    consumes. The reference spells these lists out (1023 literals in the
    texture-reconstruction configs); both forms are accepted here."""
    k = config.get("model", {}).get("k")
    if isinstance(k, dict) and "ranges" in k:
        config["model"]["k"] = [i for a, b in k["ranges"] for i in range(a, b)]
    return config


def load_config_file(path, allow_checkpoint_loading=False):
    """Load config, refuse to overwrite an existing out_dir unless resuming,
    and copy the config into out_dir for provenance (reference config.py:26-36)."""
    with open(path, "r") as f:
        config = _normalize_k(yaml.safe_load(f))

    out_dir = config["training"]["out_dir"]
    if os.path.exists(out_dir) and not allow_checkpoint_loading:
        raise RuntimeError(f"out_dir '{out_dir}' exists. Exit to not overwrite old results.")

    _pretty_print_config(config, path)
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, "config.yaml")
    if os.path.abspath(path) != os.path.abspath(dst):
        copyfile(path, dst)
    return config


def load_config(path):
    with open(path, "r") as f:
        return _normalize_k(yaml.safe_load(f))


def get_seed(config):
    return config.get("seed", 0)


def get_log_dir(config):
    os.makedirs(config["training"]["out_dir"], exist_ok=True)
    return os.path.join(config["training"]["out_dir"], "logs")


def _make_split_data(config, mesh, split_key):
    return create_ray_data(
        config["data"][split_key],
        config["data"].get("eigenfunctions_path"),
        config["model"].get("k"),
        config["model"].get("feature_strategy", "efuncs"),
        mesh,
        rescale_strategy=config["data"].get("rescale_strategy", "standard"),
        embed_strategy=config["data"].get("embed_strategy"),
        eigenvalues_path=config["data"].get("eigenvalues_path"),
        hks_timesteps=config["model"].get("hks_timesteps", 128),
        precompute=config["data"].get("precompute_hit_features", "auto"),
        precompute_dtype=config["data"].get("precompute_dtype"),
        seed=config.get("seed", 0),
    )


def get_data(config, mesh=None):
    """Device-resident RayData per split (reference config.py:56-99)."""
    if mesh is None:
        mesh = load_mesh(config["data"]["mesh_path"])
    data = {
        "train": _make_split_data(config, mesh, "preproc_data_path_train"),
        "val": _make_split_data(config, mesh, "preproc_data_path_eval"),
    }
    if "preproc_data_path_test" in config["data"]:
        data["test"] = _make_split_data(config, mesh, "preproc_data_path_test")
    return data


def get_model_and_optim(config, mesh):
    """(model module, initialized variables, optax optimizer).

    The learning rate is injected as an optimizer hyperparameter so the
    ReduceLROnPlateau scheduler can adjust it between jitted epochs without
    recompiling (reference trainer.py:35-36, 277-278).
    """
    model = make_model(config["model"], mesh=mesh)
    variables = init_model(model, config["model"], seed=get_seed(config), mesh=mesh)
    optimizer = optax.inject_hyperparams(optax.adam)(
        learning_rate=config["training"]["lr"]
    )
    return model, variables, optimizer


def get_renderer(config, model, variables, mesh):
    feature_strategy = config["model"].get("feature_strategy", "efuncs")
    if feature_strategy == "efuncs":
        E = load_first_k_eigenfunctions(
            config["data"]["eigenfunctions_path"],
            config["model"]["k"],
            rescale_strategy=config["data"].get("rescale_strategy", "standard"),
            embed_strategy=config["data"].get("embed_strategy"),
            eigenvalues_path=config["data"].get("eigenvalues_path"),
            ts=config["model"].get("hks_timesteps", 128),
        )
        return Renderer(
            model,
            variables,
            mesh,
            eigenfunctions=E,
            H=config["data"]["img_height"],
            W=config["data"]["img_width"],
        )
    elif feature_strategy in ("ff", "rff", "xyz"):
        return Renderer(
            model,
            variables,
            mesh,
            feature_strategy=feature_strategy,
            H=config["data"]["img_height"],
            W=config["data"]["img_width"],
        )
    raise ValueError(f"Unknown feature strategy: {feature_strategy}")
