"""Discretization-agnostic path: train a field on a POINT CLOUD discretization
of the same surface (local triangulation + pc_vert_robust Laplacian), the
pipeline behind configs/discretization_agnostic/*cloud*.yaml."""
import os

import numpy as np
import pytest

from intrinsic_neural_fields_tpu.geometry.mesh import is_pointcloud_file, load_mesh
from intrinsic_neural_fields_tpu.geometry.mesh_io import write_ply
from intrinsic_neural_fields_tpu.geometry.pointcloud import local_triangulation


@pytest.fixture(scope="module")
def cloud_setup(tmp_path_factory):
    from tools.make_synthetic_dataset import blob_mesh, make_dataset

    tmp = str(tmp_path_factory.mktemp("cloud"))
    # views rendered from the true surface
    mesh_path, ds, splits = make_dataset(
        os.path.join(tmp, "data"), H=48, W=48, n_train=4, n_val=1, n_test=1,
        n_vis=1, subdivisions=3,
    )
    # the point-cloud discretization: the same surface's vertices, no faces
    surf = blob_mesh(subdivisions=3)
    cloud_path = os.path.join(tmp, "cloud.ply")
    with open(cloud_path, "wb") as f:
        hdr = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {surf.num_vertices}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 0\nproperty list uchar int vertex_indices\nend_header\n"
        )
        f.write(hdr.encode())
        f.write(surf.vertices.astype("<f4").tobytes())
    return {"tmp": tmp, "dataset": ds, "splits": splits, "cloud_path": cloud_path}


def test_pointcloud_detection_and_triangulation(cloud_setup):
    assert is_pointcloud_file(cloud_setup["cloud_path"])
    m = load_mesh(cloud_setup["cloud_path"])
    assert m.num_faces > m.num_vertices  # local triangulation produced a surface
    # triangulated surface should have ~2V faces (closed-ish) and finite normals
    assert np.isfinite(m.face_normals).all()


@pytest.mark.slow
def test_pointcloud_end_to_end_training(cloud_setup):
    from intrinsic_neural_fields_tpu.geometry.mesh import load_mesh
    from intrinsic_neural_fields_tpu.spectral.eigensolver import EigenfuncsProcessor
    from preprocess_dataset import preprocess_dataset

    tmp = cloud_setup["tmp"]
    cloud_path = cloud_setup["cloud_path"]

    proc = EigenfuncsProcessor(cloud_path, 24, "pc_vert_robust")
    ef_path = os.path.join(tmp, "efuncs_pc.npy")
    np.save(ef_path, proc.get_eigenfunctions())
    assert proc.get_eigenvalues().min() > -1e-6

    pp = os.path.join(tmp, "preproc")
    for split in ("train", "val"):
        preprocess_dataset(split, cloud_setup["dataset"], cloud_path, pp, None, False)

    config = {
        "seed": 0,
        "data": {
            "preproc_data_path_train": f"{pp}/train",
            "preproc_data_path_eval": f"{pp}/val",
            "eigenfunctions_path": ef_path,
            "mesh_path": cloud_path,
            "img_height": 48,
            "img_width": 48,
            "eval_render_input_paths": [],
            "eval_render_img_names": [],
        },
        "model": {"k": 24, "num_layers": 4, "mlp_hidden_dim": 64, "skip_layer_idx": 2},
        "training": {
            "out_dir": os.path.join(tmp, "out"),
            "batch_size": 512, "lr": 1e-3, "loss_type": "L1",
            "render_every": 1000, "print_every": 1000, "epochs": 20,
        },
    }
    from intrinsic_neural_fields_tpu.evaluation.metrics import epoch_psnr
    from intrinsic_neural_fields_tpu.train import (
        Trainer, get_data, get_model_and_optim, get_renderer,
    )

    mesh = load_mesh(cloud_path)
    data = get_data(config, mesh=mesh)
    assert data["train"].n > 1000
    model, variables, optimizer = get_model_and_optim(config, mesh)
    renderer = get_renderer(config, model, variables, mesh)
    trainer = Trainer(model, variables, optimizer, "L1", renderer, data, mesh, config)
    trainer.train()

    import jax

    m = jax.device_get(trainer.val_epoch_fn(trainer.state, trainer.train_data, 512))
    train_psnr = epoch_psnr(m["sq_err_per_sample"])
    assert train_psnr > 20.0, train_psnr
