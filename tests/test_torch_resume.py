"""Training RESUME from a reference-trained torch checkpoint.pt
(utils/torch_convert.load_reference_train_checkpoint +
trainer.reference_adam_opt_state + Trainer._load_reference_checkpoint).

The oracle is torch itself: train the reference model with torch.optim.Adam,
save the checkpoint the way the reference trainer does (trainer.py:302-313),
carry it into our state, and check the next optimizer step matches torch's.
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
import jax.numpy as jnp
import optax
import torch

from intrinsic_neural_fields_tpu.models.texture_field import TextureField
from intrinsic_neural_fields_tpu.train.trainer import reference_adam_opt_state
from intrinsic_neural_fields_tpu.utils.torch_convert import (
    load_reference_train_checkpoint,
)


@pytest.fixture(scope="module")
def ref_model_module():
    sys.path.insert(0, REF)
    try:
        mod = importlib.import_module("model")
    finally:
        sys.path.remove(REF)
    return mod


def _train_torch_steps(tm, opt, feats, gts, n_steps):
    tm.train()
    for s in range(n_steps):
        opt.zero_grad(set_to_none=True)
        pred = tm({"eigenfunctions": torch.from_numpy(feats[s])})
        loss = (pred - torch.from_numpy(gts[s])).abs().mean()
        loss.backward()
        opt.step()


def _reference_checkpoint(tmp_path, tm, opt, epoch=4):
    """Write checkpoint.pt exactly as the reference trainer does
    (trainer.py:302-313), RNG states included."""
    import random

    path = os.path.join(str(tmp_path), "checkpoint.pt")
    torch.save({
        "epoch": epoch,
        "model_state_dict": tm.state_dict(),
        "optimizer_state_dict": opt.state_dict(),
        "pytorch_random_state": torch.random.get_rng_state(),
        "python_random_state": random.getstate(),
        "numpy_random_state": np.random.get_state(),
    }, path)
    return path


def test_adam_state_mapping(ref_model_module, tmp_path):
    k = 12
    rng = np.random.default_rng(0)
    tm = ref_model_module.TextureField(4, k, 16, 2)
    opt = torch.optim.Adam(tm.parameters(), lr=3e-4, betas=(0.85, 0.98), eps=2e-8)
    feats = rng.normal(size=(3, 64, k)).astype(np.float32)
    gts = rng.uniform(size=(3, 64, 3)).astype(np.float32)
    _train_torch_steps(tm, opt, feats, gts, 3)
    path = _reference_checkpoint(tmp_path, tm, opt, epoch=7)

    info = load_reference_train_checkpoint(path)
    assert info["epoch"] == 7
    adam = info["adam"]
    assert adam["count"] == 3
    assert adam["lr"] == pytest.approx(3e-4)
    assert adam["b1"] == pytest.approx(0.85)
    assert adam["b2"] == pytest.approx(0.98)
    assert adam["eps"] == pytest.approx(2e-8)

    # moments ride the same transpose as the weights
    st = opt.state_dict()["state"]
    exp_avg0 = st[0]["exp_avg"].numpy()  # layers.0.0.weight, [out,in]
    np.testing.assert_array_equal(adam["mu"]["Dense_0"]["kernel"], exp_avg0.T)
    exp_avg_sq_b = st[1]["exp_avg_sq"].numpy()  # layers.0.0.bias
    np.testing.assert_array_equal(adam["nu"]["Dense_0"]["bias"], exp_avg_sq_b)
    # moment trees mirror the param tree exactly
    assert jax.tree_util.tree_structure(adam["mu"]) == jax.tree_util.tree_structure(
        info["variables"]["params"]
    )


def test_one_step_parity_after_resume(ref_model_module, tmp_path):
    """Continue the SAME batch one step in torch and in our carried-over
    optax state: the updated parameters must agree (moments, step count and
    bias correction all line up)."""
    k = 12
    rng = np.random.default_rng(1)
    tm = ref_model_module.TextureField(4, k, 16, 2)
    lr = 1e-3
    opt = torch.optim.Adam(tm.parameters(), lr=lr)
    feats = rng.normal(size=(4, 64, k)).astype(np.float32)
    gts = rng.uniform(size=(4, 64, 3)).astype(np.float32)
    _train_torch_steps(tm, opt, feats, gts, 3)
    path = _reference_checkpoint(tmp_path, tm, opt)

    info = load_reference_train_checkpoint(path)
    om = TextureField(num_layers=4, hidden_dim=16, skip_layer_idx=2)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    params = jax.tree_util.tree_map(jnp.asarray, info["variables"]["params"])
    opt_state = reference_adam_opt_state(optimizer, params, info["adam"])

    # one more identical step on both sides
    step_feats, step_gt = feats[3], gts[3]

    def loss_fn(p):
        pred = om.apply({"params": p}, {"eigenfunctions": step_feats})
        return jnp.abs(pred - step_gt).mean()

    grads = jax.grad(loss_fn)(params)
    updates, _ = optimizer.update(grads, opt_state, params)
    ours = jax.device_get(optax.apply_updates(params, updates))

    _train_torch_steps(tm, opt, feats[3:], gts[3:], 1)
    theirs_sd = {n: t.detach().numpy() for n, t in tm.state_dict().items()}

    np.testing.assert_allclose(
        ours["Dense_0"]["kernel"], theirs_sd["layers.0.0.weight"].T, atol=5e-6
    )
    # every parameter, through the same name mapping as the loader
    from intrinsic_neural_fields_tpu.utils.torch_convert import (
        convert_reference_state_dict,
    )

    theirs = convert_reference_state_dict(theirs_sd)["params"]
    flat_o = jax.tree_util.tree_leaves_with_path(ours)
    flat_t = dict(jax.tree_util.tree_leaves_with_path(theirs))
    for key, val in flat_o:
        np.testing.assert_allclose(val, flat_t[key], atol=5e-6, err_msg=str(key))


def test_trainer_resumes_from_reference_out_dir(ref_model_module, tmp_path):
    """A reference-trained out_dir (checkpoint.pt only) resumes through the
    real Trainer: weights + Adam trajectory carry over and training continues
    at epoch+1."""
    from intrinsic_neural_fields_tpu.geometry.mesh_io import write_obj
    from intrinsic_neural_fields_tpu.geometry.primitives import icosphere

    tmp = str(tmp_path)
    m = icosphere(2)
    mesh_path = os.path.join(tmp, "blob.obj")
    write_obj(mesh_path, np.asarray(m.vertices), np.asarray(m.faces))

    k = 8
    rng = np.random.default_rng(2)
    efuncs = rng.normal(size=(m.vertices.shape[0], k)).astype(np.float32)
    ef_path = os.path.join(tmp, "efuncs.npy")
    np.save(ef_path, efuncs)

    faces = np.asarray(m.faces, np.int32)
    for split, n in (("train", 512), ("val", 128)):
        d = os.path.join(tmp, "preproc", split)
        os.makedirs(d)
        fidx = rng.integers(0, faces.shape[0], size=n).astype(np.int32)
        bary = rng.dirichlet(np.ones(3), size=n).astype(np.float32)
        np.save(os.path.join(d, "vids_of_hit_faces.npy"), faces[fidx])
        np.save(os.path.join(d, "barycentric_coords.npy"), bary)
        np.save(os.path.join(d, "expected_rgbs.npy"),
                rng.uniform(size=(n, 3)).astype(np.float32))

    out_dir = os.path.join(tmp, "out")
    os.makedirs(out_dir)
    config = {
        "seed": 0,
        "data": {
            "preproc_data_path_train": os.path.join(tmp, "preproc", "train"),
            "preproc_data_path_eval": os.path.join(tmp, "preproc", "val"),
            "eigenfunctions_path": ef_path,
            "mesh_path": mesh_path,
            "img_height": 32,
            "img_width": 32,
        },
        "model": {"k": k, "num_layers": 4, "mlp_hidden_dim": 16, "skip_layer_idx": 2},
        "training": {
            "out_dir": out_dir, "batch_size": 128, "lr": 1e-3, "loss_type": "L1",
            "render_every": 1000, "print_every": 1000, "epochs": 6,
            "checkpoint_every": 3, "shuffle": "full",
        },
    }

    # the "previous" torch run: 2 steps, checkpointed at epoch 3
    tm = ref_model_module.TextureField(4, k, 16, 2)
    topt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    feats = rng.normal(size=(2, 64, k)).astype(np.float32)
    gts = rng.uniform(size=(2, 64, 3)).astype(np.float32)
    _train_torch_steps(tm, topt, feats, gts, 2)
    _reference_checkpoint(out_dir, tm, topt, epoch=3)

    from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh
    from intrinsic_neural_fields_tpu.train import (
        Trainer, get_data, get_model_and_optim, get_renderer,
    )

    mesh = load_mesh(mesh_path)
    data = get_data(config, mesh=mesh)
    model, variables, optimizer = get_model_and_optim(config, mesh)
    renderer = get_renderer(config, model, variables, mesh)
    trainer = Trainer(model, variables, optimizer, "L1", renderer, data, mesh, config)

    start = trainer._init_or_load_checkpoint()
    assert start == 4
    # weights and Adam moments actually landed in the live state
    got = jax.device_get(trainer.state.params["Dense_0"]["kernel"])
    np.testing.assert_array_equal(
        got, tm.state_dict()["layers.0.0.weight"].numpy().T
    )
    inner_adam = trainer.state.opt_state.inner_state[0]
    assert int(inner_adam.count) == 2
    assert float(np.abs(jax.device_get(inner_adam.mu["Dense_0"]["kernel"])).max()) > 0

    # and the full loop runs from there
    trainer.train()
    assert os.path.exists(os.path.join(out_dir, "model.ckpt"))
    assert os.path.exists(os.path.join(out_dir, "model_last_epoch.ckpt"))


def test_state_dict_loader_accepts_full_checkpoint(ref_model_module, tmp_path):
    """load_reference_state_dict must load a real checkpoint.pt whose dict
    carries numpy/python RNG-state entries: torch>=2.6 weights_only=True
    rejects those, so the loader needs the weights_only=False fallback
    (previously only load_reference_train_checkpoint had it)."""
    from intrinsic_neural_fields_tpu.utils.torch_convert import (
        load_reference_state_dict,
    )

    k = 12
    rng = np.random.default_rng(3)
    tm = ref_model_module.TextureField(4, k, 16, 2)
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    feats = rng.normal(size=(1, 64, k)).astype(np.float32)
    gts = rng.uniform(size=(1, 64, 3)).astype(np.float32)
    _train_torch_steps(tm, opt, feats, gts, 1)
    path = _reference_checkpoint(tmp_path, tm, opt)

    sd = load_reference_state_dict(path)
    np.testing.assert_array_equal(
        sd["layers.0.0.weight"], tm.state_dict()["layers.0.0.weight"].numpy()
    )


def test_resume_rejects_unsupported_adam_options(ref_model_module, tmp_path):
    """weight_decay / amsgrad checkpoints must raise instead of silently
    resuming with a different optimizer than they were trained with."""
    k = 12
    rng = np.random.default_rng(4)
    feats = rng.normal(size=(1, 64, k)).astype(np.float32)
    gts = rng.uniform(size=(1, 64, 3)).astype(np.float32)

    for kwargs, match in (
        ({"weight_decay": 1e-4}, "weight_decay"),
        ({"amsgrad": True}, "amsgrad"),
    ):
        tm = ref_model_module.TextureField(4, k, 16, 2)
        opt = torch.optim.Adam(tm.parameters(), lr=1e-3, **kwargs)
        _train_torch_steps(tm, opt, feats, gts, 1)
        path = _reference_checkpoint(tmp_path, tm, opt)
        with pytest.raises(ValueError, match=match):
            load_reference_train_checkpoint(path)
