"""End-to-end pipeline tests on a synthetic dataset: preprocess -> train ->
render -> eval, plus checkpoint/resume determinism. All on the 8-virtual-CPU
platform from conftest.py."""
import os

import numpy as np
import jax
import pytest

from tools.make_synthetic_dataset import make_dataset


@pytest.fixture(scope="session")
def synthetic_setup(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("synthetic"))
    mesh_path, ds, splits = make_dataset(
        os.path.join(tmp, "data"), H=48, W=48, n_train=4, n_val=1, n_test=1,
        n_vis=1, subdivisions=3,
    )
    from intrinsic_neural_fields_tpu.spectral.eigensolver import EigenfuncsProcessor

    proc = EigenfuncsProcessor(mesh_path, 24, "cotan")
    ef_path = os.path.join(tmp, "efuncs.npy")
    np.save(ef_path, proc.get_eigenfunctions())

    from preprocess_dataset import preprocess_dataset

    pp = os.path.join(tmp, "preproc")
    for split in ("train", "val", "test"):
        preprocess_dataset(split, ds, mesh_path, pp, None, False)

    def config(out_name, **training_overrides):
        training = {
            "out_dir": os.path.join(tmp, out_name),
            "batch_size": 512,
            "lr": 1e-3,
            "loss_type": "L1",
            "render_every": 1000,
            "print_every": 1000,
            "epochs": 10,
            "checkpoint_every": 4,
        }
        training.update(training_overrides)
        return {
            "seed": 0,
            "data": {
                "preproc_data_path_train": f"{pp}/train",
                "preproc_data_path_eval": f"{pp}/val",
                "preproc_data_path_test": f"{pp}/test",
                "eigenfunctions_path": ef_path,
                "mesh_path": mesh_path,
                "img_height": 48,
                "img_width": 48,
                "eval_render_input_paths": [os.path.join(ds, splits["vis"][0])],
                "eval_render_img_names": ["vis"],
            },
            "model": {"k": 24, "num_layers": 4, "mlp_hidden_dim": 64, "skip_layer_idx": 2},
            "training": training,
        }

    return {"tmp": tmp, "mesh_path": mesh_path, "dataset": ds, "splits": splits,
            "efuncs": ef_path, "preproc": pp, "config": config}


def _build_trainer(config):
    from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh
    from intrinsic_neural_fields_tpu.train import (
        Trainer, get_data, get_model_and_optim, get_renderer,
    )

    mesh = load_mesh(config["data"]["mesh_path"])
    data = get_data(config, mesh=mesh)
    model, variables, optimizer = get_model_and_optim(config, mesh)
    renderer = get_renderer(config, model, variables, mesh)
    loss_type = config["training"]["loss_type"]
    return Trainer(model, variables, optimizer, loss_type, renderer, data, mesh, config), data


def test_preprocessed_contract(synthetic_setup):
    from intrinsic_neural_fields_tpu.data import load_preprocessed_data

    data = load_preprocessed_data(os.path.join(synthetic_setup["preproc"], "train"))
    n = data["expected_rgbs"].shape[0]
    assert n > 1000
    assert data["vertex_idxs_of_hit_faces"].shape == (n, 3)
    assert data["vertex_idxs_of_hit_faces"].dtype == np.int32
    assert data["barycentric_coords"].shape == (n, 3)
    bary = data["barycentric_coords"]
    np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-5)
    assert (bary >= 0).all()
    assert data["unit_ray_dirs"].shape == (n, 3)
    assert data["face_idxs"].shape == (n,)


def test_training_learns_and_full_flow(synthetic_setup):
    cfg = synthetic_setup["config"]("out_learn", epochs=25)
    trainer, _ = _build_trainer(cfg)
    trainer.train()

    # train PSNR after 25 epochs must be far above the epoch-1 level (~10 dB)
    from intrinsic_neural_fields_tpu.evaluation.metrics import epoch_psnr

    m = jax.device_get(trainer.val_epoch_fn(trainer.state, trainer.train_data, 512))
    final_train_psnr = epoch_psnr(m["sq_err_per_sample"])
    assert final_train_psnr > 22.0, final_train_psnr

    # best-model / last / interval checkpoints on disk
    out = cfg["training"]["out_dir"]
    assert os.path.exists(os.path.join(out, "model.ckpt"))
    assert os.path.exists(os.path.join(out, "model_last_epoch.ckpt"))
    assert os.path.exists(os.path.join(out, "checkpoint.ckpt"))

    # eval CLI over the test split: hits the renderer + metrics stack
    from intrinsic_neural_fields_tpu.evaluation.eval_cli import evaluate_views

    # Provide an LPIPS weights npz (random but correctly shaped — the real
    # checkpoint is env-blocked; the port itself is parity-pinned against a
    # torch twin in test_lpips.py) so the LPIPS column exercises end-to-end.
    from test_lpips import _random_weight_arrays

    lpips_npz = os.path.join(synthetic_setup["tmp"], "lpips_w.npz")
    np.savez(lpips_npz, **_random_weight_arrays())

    means, per_view = evaluate_views(
        os.path.join(synthetic_setup["tmp"], "eval_out"), cfg,
        synthetic_setup["dataset"], "test", lpips_weights_path=lpips_npz,
    )
    assert means["psnr"] > 14.0
    assert 0.0 <= means["dssim_rescaled"] <= 50.0
    assert np.isfinite(means["lpips_rescaled"])
    assert os.path.exists(
        os.path.join(synthetic_setup["tmp"], "eval_out", "evaluation_metrics.pkl")
    )


@pytest.mark.slow
def test_checkpoint_resume_is_deterministic(synthetic_setup):
    # Run A: 6 epochs straight. Run B: 4 epochs (checkpoint at epoch 4),
    # then resume for the last 2. Final params must match exactly.
    cfg_a = synthetic_setup["config"]("out_resume_a", epochs=6, checkpoint_every=100)
    trainer_a, _ = _build_trainer(cfg_a)
    trainer_a.train()
    params_a = jax.device_get(trainer_a.state.params)

    cfg_b = synthetic_setup["config"]("out_resume_b", epochs=4, checkpoint_every=4)
    trainer_b, _ = _build_trainer(cfg_b)
    trainer_b.train()

    cfg_b2 = synthetic_setup["config"]("out_resume_b", epochs=6, checkpoint_every=4)
    trainer_b2, _ = _build_trainer(cfg_b2)
    trainer_b2.train()
    params_b = jax.device_get(trainer_b2.state.params)

    flat_a = jax.tree_util.tree_leaves(params_a)
    flat_b = jax.tree_util.tree_leaves(params_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_renderer_masks_and_background(synthetic_setup):
    cfg = synthetic_setup["config"]("out_render", epochs=1)
    trainer, _ = _build_trainer(cfg)
    trainer.train()
    from intrinsic_neural_fields_tpu.train.steps import make_variables
    from intrinsic_neural_fields_tpu.utils.io import load_cameras, load_obj_mask_as_numpy

    trainer.renderer.update_variables(make_variables(trainer.state))
    view = os.path.join(synthetic_setup["dataset"], synthetic_setup["splits"]["val"][0])
    cam, K = load_cameras(view)
    mask = load_obj_mask_as_numpy(view).reshape(-1)

    img = trainer.renderer.render(cam, K, obj_mask_1d=mask)
    assert img.shape == (48, 48, 3)
    # background pixels are white
    np.testing.assert_allclose(img.reshape(-1, 3)[~mask], 1.0)

    img_full, hit_idxs = trainer.renderer.render(cam, K, eval_render=True)
    hit_mask = np.zeros(48 * 48, dtype=bool)
    hit_mask[hit_idxs] = True
    # ray-hit mask and dataset mask agree except on silhouette pixels
    disagree = (hit_mask != mask).mean()
    assert disagree < 0.02, disagree


@pytest.mark.slow
def test_loss_types_run(synthetic_setup):
    for loss_type in ("L2", "cauchy"):
        cfg = synthetic_setup["config"](f"out_loss_{loss_type}", epochs=2)
        cfg["training"]["loss_type"] = loss_type
        trainer, _ = _build_trainer(cfg)
        trainer.train()


def test_preprocessor_zero_ray_view(synthetic_setup, tmp_path):
    """A fully-masked-out view caches nothing instead of crashing the device
    dispatch (edge-padding an empty coord array is ill-defined) — reference
    semantics: zero hits appended (mesh.py:451-526 over an empty mask)."""
    from intrinsic_neural_fields_tpu.data.preprocess import MeshViewPreProcessor

    mvp = MeshViewPreProcessor(
        synthetic_setup["mesh_path"], str(tmp_path / "pp_empty")
    )
    H = W = 16
    cam = np.eye(4, dtype=np.float32)[:3]
    cam[2, 3] = 3.0
    K = np.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]], dtype=np.float32)
    mask = np.zeros((H, W), dtype=bool)
    img = np.zeros((H, W, 3), dtype=np.float32)
    mvp.cache_single_view(cam, K, mask, img)
    # one real view after it so write_to_disk has data to concatenate with
    mask2 = np.ones((H, W), dtype=bool)
    mvp.cache_single_view(cam, K, mask2, img)
    mvp.write_to_disk()
    face_idxs = np.load(os.path.join(str(tmp_path / "pp_empty"), "face_idxs.npy"))
    assert face_idxs.ndim == 1


def test_preprocessor_raster_matches_cone(synthetic_setup, tmp_path):
    """The device preprocessor's default raster tracer must cache the same
    hit records as the cone tracer (same per-pair arithmetic; raster
    Z-orders the masked coords internally and un-permutes, so the 5-npy
    byte contract keeps the masked-pixel order)."""
    from intrinsic_neural_fields_tpu.data.preprocess import MeshViewPreProcessor

    H = W = 32
    cam = np.eye(4, dtype=np.float32)[:3]
    cam[2, 3] = -3.0
    K = np.array([[1.2 * W, 0, W / 2], [0, 1.2 * W, H / 2], [0, 0, 1]],
                 dtype=np.float32)
    rng = np.random.default_rng(0)
    mask = rng.uniform(size=(H, W)) < 0.7
    img = rng.uniform(size=(H, W, 3)).astype(np.float32)

    caches = {}
    for tracer in ("raster", "cone"):
        mvp = MeshViewPreProcessor(
            synthetic_setup["mesh_path"], str(tmp_path / f"pp_{tracer}"),
            tracer=tracer,
        )
        assert mvp.tracer == tracer
        mvp.cache_single_view(cam, K, mask, img)
        mvp.write_to_disk()
        caches[tracer] = {
            name: np.load(
                os.path.join(str(tmp_path / f"pp_{tracer}"), name + ".npy")
            )
            for name in ("face_idxs", "vids_of_hit_faces",
                         "barycentric_coords", "expected_rgbs",
                         "unit_ray_dirs")
        }
    r, c = caches["raster"], caches["cone"]
    assert r["face_idxs"].shape == c["face_idxs"].shape  # same hit set
    np.testing.assert_array_equal(r["expected_rgbs"], c["expected_rgbs"])
    np.testing.assert_array_equal(r["unit_ray_dirs"], c["unit_ray_dirs"])
    same = r["face_idxs"] == c["face_idxs"]
    assert same.mean() > 0.97, same.mean()
    np.testing.assert_allclose(
        r["barycentric_coords"][same], c["barycentric_coords"][same],
        atol=2e-4,
    )
    if not same.all():
        # exact-t ties along shared edges pick either face; the cached HIT
        # POINTS must coincide (equivalent training rows)
        from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh

        mesh = load_mesh(synthetic_setup["mesh_path"])
        verts = np.asarray(mesh.vertices)
        sel = ~same
        p_r = np.einsum("bj,bjk->bk", r["barycentric_coords"][sel],
                        verts[r["vids_of_hit_faces"][sel]])
        p_c = np.einsum("bj,bjk->bk", c["barycentric_coords"][sel],
                        verts[c["vids_of_hit_faces"][sel]])
        np.testing.assert_allclose(p_r, p_c, atol=2e-4)


def test_k_ranges_config_expansion(tmp_path):
    """`model.k: {ranges: [[a,b], ...]}` expands to the reference's explicit
    index-list form (reference intrinsic_cat.yaml spells out 1023 literals;
    configs here use the compact half-open-range spec — train/config.py
    _normalize_k). Pins the canonical {0-256, 1793-2304, 3840-4096} list."""
    import yaml

    from intrinsic_neural_fields_tpu.train.config import load_config

    cfg = {
        "seed": 0,
        "data": {},
        "model": {"k": {"ranges": [[0, 256], [1793, 2304], [3840, 4096]]}},
        "training": {"out_dir": str(tmp_path / "out")},
    }
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump(cfg))
    loaded = load_config(str(path))
    k = loaded["model"]["k"]
    assert isinstance(k, list) and len(k) == 1023
    assert k[:3] == [0, 1, 2] and k[256] == 1793 and k[-1] == 4095
    assert k == sorted(set(k))


@pytest.mark.slow
def test_render_video_cli_smoke(synthetic_setup, tmp_path, monkeypatch):
    """render_video.main() end to end at a tiny resolution: Fraction fit,
    pipelined turntable loop, frame files on disk (ffmpeg-less path prints
    the encode command instead of failing)."""
    import sys

    import yaml

    import render_video

    cfg = synthetic_setup["config"]("out_video", epochs=2)
    trainer, _ = _build_trainer(cfg)
    trainer.train()

    config_dir = tmp_path / "video_cfg"
    config_dir.mkdir()
    config_path = config_dir / "config.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(cfg, f)
    cameras_path = os.path.join(
        synthetic_setup["dataset"], synthetic_setup["splits"]["vis"][0],
        "depth", "cameras.npz",
    )
    assert os.path.exists(cameras_path)

    # 96x96 keeps the CPU tracer fast; the dict is read at parse time so the
    # monkeypatched entry is a legal --resolution choice.
    monkeypatch.setitem(render_video.resolutions, "96p", (96, 96))
    out_dir = str(tmp_path / "video_out")
    monkeypatch.setattr(sys, "argv", [
        "render_video.py", "--out_dir", out_dir,
        "--config_path", str(config_path),
        "--cameras_path", cameras_path,
        "--resolution", "96p", "--turns", "1", "--duration", "3", "--fps", "1",
    ])
    render_video.main()

    image_folder = os.path.join(out_dir, "images", "video_cfg_96p")
    frames = sorted(os.listdir(image_folder))
    assert frames == ["0000.jpg", "0001.jpg", "0002.jpg"]
    from intrinsic_neural_fields_tpu.utils.io import imread

    img = imread(os.path.join(image_folder, frames[0]))
    assert img.shape[:2] == (96, 96)


def test_pipelined_foreach_order_and_depth():
    """utils.pipeline.pipelined_foreach: finishes run in item order, dispatch
    leads finish by at most `depth`, every item is finished exactly once."""
    from intrinsic_neural_fields_tpu.utils.pipeline import pipelined_foreach

    for depth in (0, 1, 2, 5):
        log = []
        dispatched = []

        def dispatch(i):
            dispatched.append(i)
            log.append(("d", i))
            return i * 10

        def finish(i, h):
            assert h == i * 10
            # the in-flight window never exceeds depth
            assert len(dispatched) - i - 1 <= depth
            log.append(("f", i))

        n = pipelined_foreach(range(7), dispatch, finish, depth=depth)
        assert n == 7
        assert [i for op, i in log if op == "f"] == list(range(7))
        assert [i for op, i in log if op == "d"] == list(range(7))


@pytest.mark.slow
def test_checkpoint_resume_fused_adam_path(synthetic_setup):
    """Resume determinism THROUGH THE FUSED IN-KERNEL-ADAM PATH: the
    checkpoint round-trips opt_state (mu/nu/count + inject hyperparams)
    through msgpack, and the restored state must keep training identically
    (the strict _adam_opt_view probe must also still accept it)."""
    def fused_config(name, epochs, checkpoint_every):
        cfg = synthetic_setup["config"](
            name, epochs=epochs, checkpoint_every=checkpoint_every,
            batch_size=256,
        )
        cfg["model"]["mlp_hidden_dim"] = 128  # fused path needs lane-aligned H
        cfg["training"]["shuffle"] = "blocks"
        cfg["training"]["fused_mlp"] = True
        cfg["data"]["precompute_dtype"] = "bfloat16"
        return cfg

    cfg_a = fused_config("out_fresume_a", epochs=6, checkpoint_every=100)
    trainer_a, _ = _build_trainer(cfg_a)
    trainer_a.train()
    params_a = jax.device_get(trainer_a.state.params)

    cfg_b = fused_config("out_fresume_b", epochs=4, checkpoint_every=4)
    trainer_b, _ = _build_trainer(cfg_b)
    trainer_b.train()

    cfg_b2 = fused_config("out_fresume_b", epochs=6, checkpoint_every=4)
    trainer_b2, _ = _build_trainer(cfg_b2)
    trainer_b2.train()
    params_b = jax.device_get(trainer_b2.state.params)

    # the restored optimizer must have gone through the KERNEL path, not the
    # optax fallback: the strict probe accepts the msgpack'd opt_state
    from intrinsic_neural_fields_tpu.train.steps import _adam_opt_view

    assert _adam_opt_view(trainer_b2.state.opt_state) is not None
    assert int(trainer_b2.state.opt_state.inner_state[0].count) == int(
        trainer_a.state.opt_state.inner_state[0].count
    )

    for a, b in zip(jax.tree_util.tree_leaves(params_a),
                    jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.slow
def test_rff_fused_pre_embed_end_to_end(synthetic_setup):
    """training.fused_mlp on an RFF config: the Trainer pre-embeds every
    split (fixed encoding of the hit position) and runs the mlp_core_view
    through the fused streaming kernel + in-kernel Adam. Learning proceeds,
    and the trained weights drop back into the ORIGINAL rff model for
    rendering/eval unchanged."""
    cfg = synthetic_setup["config"]("out_rff_fused", epochs=15, batch_size=256)
    cfg["model"] = {
        "feature_strategy": "rff", "k": 16, "embed_std": 4.0,
        "num_layers": 4, "mlp_hidden_dim": 128, "skip_layer_idx": 2,
    }
    cfg["training"]["shuffle"] = "blocks"
    cfg["training"]["fused_mlp"] = True
    trainer, _ = _build_trainer(cfg)

    # the wiring actually engaged: core view + pre-embedded splits
    assert trainer.epoch_model is not trainer.model
    assert trainer.epoch_model.input_feature_embed is None
    assert trainer.train_data.feature_strategy == "efuncs"
    assert trainer.train_data.hit_features.shape[1] == 2 * 16 + 3
    assert trainer.val_data.feature_strategy == "efuncs"

    trainer.train()
    from intrinsic_neural_fields_tpu.evaluation.metrics import epoch_psnr
    from intrinsic_neural_fields_tpu.train.steps import _adam_opt_view

    # the in-kernel Adam path (not the optax fallback) carried the epochs
    assert _adam_opt_view(trainer.state.opt_state) is not None
    assert int(trainer.state.opt_state.inner_state[0].count) > 0
    m = jax.device_get(trainer.val_epoch_fn(trainer.state, trainer.train_data, 256))
    assert epoch_psnr(m["sq_err_per_sample"]) > 14.0

    # weights flow back into the original rff model: render a vis view
    from intrinsic_neural_fields_tpu.train.steps import make_variables

    variables = make_variables(trainer.state)
    # renderer holds (model, variables) from construction; re-render through
    # a fresh renderer with the trained weights
    from intrinsic_neural_fields_tpu.train.config import get_renderer
    from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh

    mesh = load_mesh(cfg["data"]["mesh_path"])
    renderer = get_renderer(cfg, trainer.model, variables, mesh)
    cam_path = cfg["data"]["eval_render_input_paths"][0]
    cams = np.load(os.path.join(cam_path, "depth", "cameras.npz"))
    img = np.asarray(renderer.render(cams["world_mat_0"], cams["camera_mat_0"]))
    assert img.shape[-1] == 3 and np.isfinite(img).all()

    # restore-path staleness guard: a checkpoint carrying a DIFFERENT RFF
    # projection B (e.g. torch-imported) must trigger a re-embed
    import jax.numpy as jnp
    from intrinsic_neural_fields_tpu.train.steps import TrainState

    old_rows = np.asarray(trainer.train_data.hit_features[:4]).astype(np.float32)
    new_buffers = jax.tree_util.tree_map(lambda b: b * 2.0, trainer.state.buffers)
    trainer.state = TrainState(trainer.state.params, new_buffers,
                               trainer.state.opt_state, trainer.state.batch_stats)
    trainer._refresh_pre_embedding_after_restore()
    new_rows = np.asarray(trainer.train_data.hit_features[:4]).astype(np.float32)
    assert not np.allclose(old_rows, new_rows)


@pytest.mark.slow
def test_parallelize_trainer_dp_pre_embed(synthetic_setup):
    """Trainer-level data parallelism (what `train.py --num_devices D`
    drives): parallelize_trainer swaps the epoch fns for mesh-sharded ones
    and must pass the EPOCH model — for a pre-embedded fused rff run that is
    the mlp_core_view, not the original rff model (whose in-forward encoder
    would reject the embedded rows). Training learns through the 8-device
    fused DP path."""
    from intrinsic_neural_fields_tpu.evaluation.metrics import epoch_psnr
    from intrinsic_neural_fields_tpu.parallel import parallelize_trainer

    cfg = synthetic_setup["config"]("out_rff_dp", epochs=30, batch_size=512)
    cfg["model"] = {
        "feature_strategy": "rff", "k": 16, "embed_std": 4.0,
        "num_layers": 4, "mlp_hidden_dim": 128, "skip_layer_idx": 2,
    }
    cfg["training"]["shuffle"] = "blocks"
    cfg["training"]["fused_mlp"] = True
    trainer, _ = _build_trainer(cfg)
    assert trainer.epoch_model is not trainer.model  # pre-embed engaged
    parallelize_trainer(trainer, 8)

    trainer.train()
    m = jax.device_get(trainer.val_epoch_fn(trainer.state, trainer.train_data, 512))
    assert epoch_psnr(m["sq_err_per_sample"]) > 14.0


@pytest.mark.slow
def test_shot_family_end_to_end_smoke(synthetic_setup, tmp_path):
    """The shape-descriptor SHOT family path end to end at toy scale:
    compute_shot_descriptors -> npy -> the config-default feature loading
    (standard rescale over structurally-zero columns) -> train a few epochs
    -> finite, decreasing loss. Pins the path configs/synthetic/
    shot_blob.yaml takes on the HQ dataset."""
    import numpy as np

    from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh
    from intrinsic_neural_fields_tpu.geometry.shot import compute_shot_descriptors

    mesh = load_mesh(synthetic_setup["mesh_path"])
    E = compute_shot_descriptors(mesh.vertices, mesh.faces, radius=0.4)
    assert np.isfinite(E).all() and (np.linalg.norm(E, axis=1) > 0).mean() > 0.95
    shot_path = str(tmp_path / "blob_shot.npy")
    np.save(shot_path, E)

    cfg = synthetic_setup["config"]("out_shot_smoke", epochs=8)
    cfg["data"]["eigenfunctions_path"] = shot_path
    cfg["model"]["k"] = 352
    trainer, _ = _build_trainer(cfg)
    trainer.train()
    m = jax.device_get(trainer.val_epoch_fn(trainer.state, trainer.train_data, 512))
    assert np.isfinite(float(m["loss"]))
    from intrinsic_neural_fields_tpu.evaluation.metrics import epoch_psnr

    # SHOT features carry enough spatial signal to start fitting (well above
    # the ~7 dB an untrained field scores); quality at scale is a TPU run
    assert epoch_psnr(m["sq_err_per_sample"]) > 10.0
