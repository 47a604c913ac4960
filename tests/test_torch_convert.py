"""Reference-trained torch checkpoints load into our models with identical
outputs (utils/torch_convert.py + the load_checkpoint auto-detection).

The oracle is the reference implementation itself (/root/reference/model.py,
imported read-only): build the torch model, save its checkpoint the way the
reference trainer does, load it through OUR loader, and compare forward
passes on the same inputs.
"""
import importlib
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "model.py")),
    reason="reference repo absent",
)

import jax
import torch

from intrinsic_neural_fields_tpu.models.texture_field import (
    TextureField,
    TextureFieldWithViewDependency,
)
from intrinsic_neural_fields_tpu.utils.checkpoint import (
    load_checkpoint,
    resolve_weights_path,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def ref_model_module():
    sys.path.insert(0, REF)
    try:
        mod = importlib.import_module("model")
    finally:
        sys.path.remove(REF)
    return mod


def _roundtrip(tmp_path, torch_model, our_model, our_template, batch_np,
               torch_batch, checkpoint_dict=False, module_prefix=False):
    """Save the torch state, load through OUR loader, compare outputs."""
    sd = torch_model.state_dict()
    if module_prefix:  # torch.nn.DataParallel wrapping (reference train.py:46-48)
        sd = {f"module.{k}": v for k, v in sd.items()}
    obj = {"model_state_dict": sd, "epoch": 7} if checkpoint_dict else sd
    pt = os.path.join(str(tmp_path), "model.pt")
    torch.save(obj, pt)

    variables = load_checkpoint(pt, our_template)
    ours = np.asarray(our_model.apply(variables, batch_np))
    with torch.no_grad():
        torch_model.eval()
        theirs = torch_model(torch_batch).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_plain_texture_field(ref_model_module, tmp_path):
    k, B = 20, 16
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(B, k)).astype(np.float32)
    tm = ref_model_module.TextureField(6, k, 32, 3)
    om = TextureField(num_layers=6, hidden_dim=32, skip_layer_idx=3)
    batch = {"eigenfunctions": feats}
    tmpl = jax.device_get(om.init(jax.random.PRNGKey(0), batch))
    tb = {"eigenfunctions": torch.from_numpy(feats)}
    _roundtrip(tmp_path, tm, om, tmpl, batch, tb)
    # the reference's two on-disk formats + DataParallel prefix
    _roundtrip(tmp_path, tm, om, tmpl, batch, tb, checkpoint_dict=True)
    _roundtrip(tmp_path, tm, om, tmpl, batch, tb, module_prefix=True)


def test_rff_texture_field(ref_model_module, tmp_path):
    B = 16
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(B, 3)).astype(np.float32)
    tm = ref_model_module.TextureField(
        6, None, 32, 3, input_feature_embed="rff", embed_dim=24, embed_std=4.0
    )
    om = TextureField(
        num_layers=6, hidden_dim=32, skip_layer_idx=3,
        input_feature_embed="rff", embed_dim=24, embed_std=4.0,
    )
    batch = {"xyz": xyz}
    tmpl = jax.device_get(
        om.init({"params": jax.random.PRNGKey(0), "buffers": jax.random.PRNGKey(1)}, batch)
    )
    _roundtrip(tmp_path, tm, om, tmpl, batch, {"xyz": torch.from_numpy(xyz)})


def test_batchnorm_texture_field(ref_model_module, tmp_path):
    k, B = 12, 32
    rng = np.random.default_rng(2)
    tm = ref_model_module.TextureField(5, k, 16, 2, batchnorm=True)
    # drive the running stats away from their (0, 1) init so a mean/var
    # mapping bug can't hide
    tm.train()
    for _ in range(4):
        tm({"eigenfunctions": torch.from_numpy(
            rng.normal(loc=0.5, scale=2.0, size=(64, k)).astype(np.float32))})
    feats = rng.normal(size=(B, k)).astype(np.float32)
    om = TextureField(num_layers=5, hidden_dim=16, skip_layer_idx=2, batchnorm=True)
    batch = {"eigenfunctions": feats}
    tmpl = jax.device_get(om.init(jax.random.PRNGKey(0), batch))
    _roundtrip(tmp_path, tm, om, tmpl, batch, {"eigenfunctions": torch.from_numpy(feats)})


@pytest.mark.parametrize("strategy", ["extrinsic", "intrinsic"])
def test_view_dependent_field(ref_model_module, tmp_path, strategy):
    k, B, F = 10, 16, 40
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(B, k)).astype(np.float32)
    dirs = rng.normal(size=(B, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    normals = rng.normal(size=(F, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    hit_faces = rng.integers(0, F, size=B)

    in_dim_view_dir = 3 if strategy == "extrinsic" else 1
    tm = ref_model_module.TextureFieldWithViewDependency(
        num_layers=5, in_dim=k, hidden_dim=24, skip_layer_idx=2,
        bottleneck_vec_dim=8, in_dim_view_dir=in_dim_view_dir,
        include_view_dir=True, view_dir_embedding_size=4,
        directional_hidden_dim=16, face_normals=torch.from_numpy(normals),
        view_dir_strategy=strategy,
    )
    om = TextureFieldWithViewDependency(
        num_layers=5, hidden_dim=24, skip_layer_idx=2,
        bottleneck_vec_dim=8, in_dim_view_dir=in_dim_view_dir,
        include_view_dir=True, view_dir_embedding_size=4,
        directional_hidden_dim=16, face_normals=normals,
        view_dir_strategy=strategy,
    )
    batch = {
        "eigenfunctions": feats,
        "unit_ray_dirs": dirs,
        "hit_face_idxs": hit_faces,
    }
    tmpl = jax.device_get(om.init(jax.random.PRNGKey(0), batch))
    tb = {
        "eigenfunctions": torch.from_numpy(feats),
        "unit_ray_dirs": torch.from_numpy(dirs),
        "hit_face_idxs": torch.from_numpy(hit_faces),
    }
    _roundtrip(tmp_path, tm, om, tmpl, batch, tb)


def test_resolve_weights_path(tmp_path):
    out = str(tmp_path)
    # nothing on disk: returns the default (caller will fail with a clear
    # file-not-found)
    assert resolve_weights_path(out).endswith("model.ckpt")
    # reference-trained out_dir: falls back to model.pt
    open(os.path.join(out, "model.pt"), "wb").close()
    assert resolve_weights_path(out).endswith("model.pt")
    # ours wins when both exist
    save_checkpoint(os.path.join(out, "model.ckpt"), {"a": np.zeros(2)})
    assert resolve_weights_path(out).endswith("model.ckpt")


def test_converted_mismatch_raises(ref_model_module, tmp_path):
    tm = ref_model_module.TextureField(6, 20, 32, 3)
    pt = os.path.join(str(tmp_path), "model.pt")
    torch.save(tm.state_dict(), pt)
    om = TextureField(num_layers=6, hidden_dim=64, skip_layer_idx=3)  # wrong width
    tmpl = jax.device_get(
        om.init(jax.random.PRNGKey(0), {"eigenfunctions": np.zeros((4, 20), np.float32)})
    )
    with pytest.raises(ValueError, match="mismatch"):
        load_checkpoint(pt, tmpl)


# ---------------------------------------------------------------- export path


def _export_roundtrip(tm, om, variables, model_config, batch_np, torch_batch):
    """OUR variables -> reference state_dict -> strict torch load -> same
    outputs; and converting the export back reproduces the variables."""
    from intrinsic_neural_fields_tpu.utils.torch_convert import (
        convert_reference_state_dict,
        export_reference_state_dict,
    )

    variables = jax.device_get(variables)
    sd = export_reference_state_dict(variables, model_config)
    missing, unexpected = tm.load_state_dict(
        {k: (torch.from_numpy(v.copy()) if v.ndim else torch.tensor(v))
         for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected

    ours = np.asarray(om.apply(variables, batch_np))
    with torch.no_grad():
        tm.eval()
        theirs = tm(torch_batch).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-6)

    back = convert_reference_state_dict(sd)
    flat_back = dict(jax.tree_util.tree_leaves_with_path(back["params"]))
    for key, val in jax.tree_util.tree_leaves_with_path(variables["params"]):
        np.testing.assert_array_equal(val, flat_back[key], err_msg=str(key))


def test_export_plain(ref_model_module):
    k = 20
    cfg = {"k": k, "num_layers": 6, "mlp_hidden_dim": 32, "skip_layer_idx": 3}
    tm = ref_model_module.TextureField(6, k, 32, 3)
    om = TextureField(num_layers=6, hidden_dim=32, skip_layer_idx=3)
    feats = np.random.default_rng(10).normal(size=(16, k)).astype(np.float32)
    batch = {"eigenfunctions": feats}
    variables = om.init(jax.random.PRNGKey(3), batch)
    _export_roundtrip(tm, om, variables, cfg, batch,
                      {"eigenfunctions": torch.from_numpy(feats)})


def test_export_rff(ref_model_module):
    cfg = {"k": 24, "num_layers": 6, "mlp_hidden_dim": 32, "skip_layer_idx": 3,
           "feature_strategy": "rff", "embed_std": 4.0}
    tm = ref_model_module.TextureField(
        6, None, 32, 3, input_feature_embed="rff", embed_dim=24, embed_std=4.0
    )
    om = TextureField(
        num_layers=6, hidden_dim=32, skip_layer_idx=3,
        input_feature_embed="rff", embed_dim=24, embed_std=4.0,
    )
    xyz = np.random.default_rng(11).normal(size=(16, 3)).astype(np.float32)
    batch = {"xyz": xyz}
    variables = om.init(
        {"params": jax.random.PRNGKey(0), "buffers": jax.random.PRNGKey(1)}, batch
    )
    _export_roundtrip(tm, om, variables, cfg, batch, {"xyz": torch.from_numpy(xyz)})


def test_export_batchnorm(ref_model_module):
    k = 12
    cfg = {"k": k, "num_layers": 5, "mlp_hidden_dim": 16, "skip_layer_idx": 2,
           "batchnorm": True}
    tm = ref_model_module.TextureField(5, k, 16, 2, batchnorm=True)
    om = TextureField(num_layers=5, hidden_dim=16, skip_layer_idx=2, batchnorm=True)
    feats = np.random.default_rng(12).normal(size=(32, k)).astype(np.float32)
    batch = {"eigenfunctions": feats}
    variables = om.init(jax.random.PRNGKey(4), batch)
    _export_roundtrip(tm, om, variables, cfg, batch,
                      {"eigenfunctions": torch.from_numpy(feats)})


def test_export_view_dependent(ref_model_module):
    k, F = 10, 40
    rng = np.random.default_rng(13)
    normals = rng.normal(size=(F, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    cfg = {
        "k": k, "num_layers": 5, "mlp_hidden_dim": 24, "skip_layer_idx": 2,
        "view_dependence": {
            "bottleneck_vec_dim": 8, "in_dim_view_dir": 3, "include_view_dir": True,
            "embed_size": 4, "directional_hidden_dim": 16, "strategy": "extrinsic",
        },
    }
    tm = ref_model_module.TextureFieldWithViewDependency(
        num_layers=5, in_dim=k, hidden_dim=24, skip_layer_idx=2,
        bottleneck_vec_dim=8, in_dim_view_dir=3, include_view_dir=True,
        view_dir_embedding_size=4, directional_hidden_dim=16,
        face_normals=torch.from_numpy(normals), view_dir_strategy="extrinsic",
    )
    om = TextureFieldWithViewDependency(
        num_layers=5, hidden_dim=24, skip_layer_idx=2,
        bottleneck_vec_dim=8, in_dim_view_dir=3, include_view_dir=True,
        view_dir_embedding_size=4, directional_hidden_dim=16,
        face_normals=normals, view_dir_strategy="extrinsic",
    )
    feats = rng.normal(size=(16, k)).astype(np.float32)
    dirs = rng.normal(size=(16, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    hit_faces = rng.integers(0, F, size=16)
    batch = {"eigenfunctions": feats, "unit_ray_dirs": dirs, "hit_face_idxs": hit_faces}
    variables = om.init(jax.random.PRNGKey(5), batch)
    tb = {"eigenfunctions": torch.from_numpy(feats),
          "unit_ray_dirs": torch.from_numpy(dirs),
          "hit_face_idxs": torch.from_numpy(hit_faces)}
    _export_roundtrip(tm, om, variables, cfg, batch, tb)
