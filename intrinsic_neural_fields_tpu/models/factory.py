"""Model factory: config dict -> flax module + initialized variables
(reference model.py:199-258).

Dispatch rules mirror the reference:
  - model_config["type"] == "neutex" -> NeuTex train wrapper (models/neutex).
  - feature_strategy "xyz"/"ff"/"rff" feed xyz-derived inputs; anything else
    is the intrinsic eigenfunction path.
  - in_dim: 3 for xyz, hks_timesteps when configured (NOTE: dead branch in
    the reference due to hasattr-on-dict, model.py:209 — fixed here), k for
    int k, len(k) for an index list.
  - activation "relu" | "sine"; every Dense kernel Xavier-uniform.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .texture_field import TextureField, TextureFieldWithViewDependency


def _in_dim_from_config(model_config, feature_strategy):
    if feature_strategy == "xyz":
        return 3
    if "hks_timesteps" in model_config:
        return model_config["hks_timesteps"]
    k = model_config["k"]
    if isinstance(k, int):
        return k
    assert isinstance(k, list)
    return len(k)


def make_model(model_config, mesh=None):
    """Build the (uninitialized) flax module described by model_config."""
    if model_config.get("type") == "neutex":
        from .neutex import make_neutex_train_wrapper_default

        assert "pretrained_path" in model_config
        return make_neutex_train_wrapper_default(model_config)

    view_dependence_config = model_config.get("view_dependence")
    feature_strategy = model_config.get("feature_strategy", "efuncs")
    activation = model_config.get("activation", "relu")
    if activation not in ("relu", "sine"):
        raise NotImplementedError(f"Activation function {activation} not implemented.")

    input_feature_embed = feature_strategy if feature_strategy in ("ff", "rff", "xyz") else None
    common = dict(
        num_layers=model_config["num_layers"],
        hidden_dim=model_config["mlp_hidden_dim"],
        skip_layer_idx=model_config["skip_layer_idx"],
        input_feature_embed=input_feature_embed,
        embed_dim=model_config.get("k"),
        embed_include_input=model_config.get("embed_include_input", True),
        embed_std=model_config.get("embed_std", 1.0),
        embed_use_logspace=model_config.get("use_logspace", True),
        embed_max_freq=model_config.get("max_freq"),
        batchnorm=model_config.get("batchnorm", False),
        activation=activation,
    )

    if view_dependence_config is None:
        return TextureField(**common)

    assert mesh is not None
    return TextureFieldWithViewDependency(
        bottleneck_vec_dim=view_dependence_config["bottleneck_vec_dim"],
        in_dim_view_dir=view_dependence_config["in_dim_view_dir"],
        include_view_dir=view_dependence_config["include_view_dir"],
        view_dir_embedding_size=view_dependence_config["embed_size"],
        directional_hidden_dim=view_dependence_config["directional_hidden_dim"],
        face_normals=np.asarray(mesh.face_normals, dtype=np.float32),
        view_dir_strategy=view_dependence_config["strategy"],
        **common,
    )


def example_batch(model_config, batch_size=4, mesh=None):
    """A zero batch with the right keys/shapes for model init/compile checks."""
    feature_strategy = model_config.get("feature_strategy", "efuncs")
    in_dim = _in_dim_from_config(model_config, feature_strategy)
    batch = {}
    if feature_strategy in ("ff", "rff", "xyz"):
        batch["xyz"] = jnp.zeros((batch_size, 3), jnp.float32)
    else:
        batch["eigenfunctions"] = jnp.zeros((batch_size, in_dim), jnp.float32)
    if model_config.get("view_dependence") is not None or model_config.get("type") == "neutex":
        batch["unit_ray_dirs"] = jnp.zeros((batch_size, 3), jnp.float32)
        batch["hit_face_idxs"] = jnp.zeros((batch_size,), jnp.int32)
    batch["expected_rgbs"] = jnp.zeros((batch_size, 3), jnp.float32)
    return batch


def init_model(model, model_config, seed=0, mesh=None):
    """Initialize variables for a module built by make_model.

    Returns the full variables dict: {"params": ..., ["buffers": ...]}.
    For self-loss models (NeuTex) initialization goes through loss_and_rgbs
    so the mapping decoder's params (used only in the loss) exist too, and
    the pretrained mapping weights are loaded when configured.
    """
    rngs = {"params": jax.random.PRNGKey(seed), "buffers": jax.random.PRNGKey(seed + 1)}
    batch = example_batch(model_config, mesh=mesh)
    if getattr(model, "computes_loss", False):
        variables = model.init(rngs, batch, method=model.loss_and_rgbs)
        if model_config.get("pretrained_path"):
            from .neutex import load_pretrained_mapping

            variables = load_pretrained_mapping(variables, model_config["pretrained_path"])
        return variables
    return model.init(rngs, batch)
