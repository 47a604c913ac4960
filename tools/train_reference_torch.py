#!/usr/bin/env python
"""Train the REFERENCE's own torch model on our synthetic npy splits — the
reference-side quality anchor (VERDICT r3 missing #1, BASELINE.md milestone).

This is deliberately NOT our framework: the model is imported verbatim from
/root/reference/model.py (the same read-only import tests/test_torch_convert.py
uses as its forward-parity oracle) and the loop reproduces the reference's
training semantics step for step:

  - device-resident RayDataLoader batching: torch.randperm over all cached
    hits each epoch, contiguous slices, drop_last=True for train / False for
    val, per-batch eigenfunction gather E[vids].reshape(B,3,k) + bmm with the
    barycentric weights (reference ray_dataloader.py:103-145, mesh.py:313-324)
  - load_first_k_eigenfunctions with k-list selection + "standard" range
    rescale — via OUR spectral.features, whose behavior is pinned against the
    reference loader by tests (reference mesh.py:53-108)
  - L1 loss + Adam(lr) exactly as built by the reference
    (config.py:102-121, trainer.py:71-84)
  - per-epoch val pass; best-model selection by val loss with the reference's
    min_val_loss=1.0 initialization; epoch-PSNR bookkeeping from accumulated
    L2 sums (trainer.py:232-283)
  - seeding: random/np/torch with the config seed, re-seeded after model
    construction like reference train.py:55-58

Outputs into --out_dir: model.pt (best state_dict, the reference's format),
model_last_epoch.pt, and history.json with the per-epoch train/val loss+PSNR
curves. Afterwards convert with tools/convert_reference_checkpoint.py and
evaluate both checkpoints through eval.py on the same test views.

checkpoint.pt (model+optim+RNG states, reference trainer.py:302-313 contract)
is written every --checkpoint_every epochs; --resume restores it and
continues at epoch+1 with the exact RNG trajectory, so an interrupted run
(this is a multi-hour single-core train) loses at most one interval.

Usage:
  python tools/train_reference_torch.py configs/synthetic/intrinsic_blob_hq_klist.yaml \
      --out_dir out/reference_torch_hq_klist [--epochs N]
"""
from __future__ import annotations

import argparse
import importlib
import json
import os
import random
import sys
import time

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from intrinsic_neural_fields_tpu.spectral.features import (  # noqa: E402
    load_first_k_eigenfunctions,
)
from intrinsic_neural_fields_tpu.train.config import load_config  # noqa: E402

REF = "/root/reference"


def ref_model_module():
    sys.path.insert(0, REF)
    try:
        return importlib.import_module("model")
    finally:
        sys.path.remove(REF)


def load_split(path):
    """The reference's load_preprocessed_data (dataset.py:12-32) for the three
    arrays the efuncs strategy needs, as torch tensors."""
    vids = torch.from_numpy(
        np.load(os.path.join(path, "vids_of_hit_faces.npy"))
    ).to(dtype=torch.int64)
    bary = torch.from_numpy(
        np.load(os.path.join(path, "barycentric_coords.npy"))
    ).to(dtype=torch.float32)
    rgbs = torch.from_numpy(
        np.load(os.path.join(path, "expected_rgbs.npy"))
    ).to(dtype=torch.float32)
    return vids, bary, rgbs


def gather_batch(E, vids, bary, idx):
    """get_k_eigenfunc_vec_vals on a batch slice (reference mesh.py:313-324)."""
    tri = E[vids[idx].reshape(-1)].reshape(idx.shape[0], 3, -1)
    return torch.bmm(bary[idx].unsqueeze(1), tri).squeeze(1)


def epoch_psnr_from_l2(mean_l2_per_ray):
    """Reference evaluation_metrics.epoch_psnr (-10 log10 of the PER-RAY
    accumulated L2, i.e. summed over the 3 channels — the reference's own
    convention, evaluation_metrics.py:25-26 with trainer.py:245-252)."""
    return float(-10.0 * np.log10(mean_l2_per_ray))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config_path")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--epochs", type=int, default=None,
                   help="override config epochs (default: config value)")
    p.add_argument("--print_every", type=int, default=None)
    p.add_argument("--checkpoint_every", type=int, default=10)
    p.add_argument("--resume", action="store_true",
                   help="restore out_dir/checkpoint.pt and continue")
    args = p.parse_args()

    config = load_config(args.config_path)
    seed = config.get("seed", 0)
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)
    torch.set_num_threads(max(os.cpu_count() or 1, 1))

    k = config["model"]["k"]
    E = torch.from_numpy(
        load_first_k_eigenfunctions(
            config["data"]["eigenfunctions_path"],
            k,
            rescale_strategy=config["data"].get("rescale_strategy", "standard"),
            embed_strategy=config["data"].get("embed_strategy"),
            eigenvalues_path=config["data"].get("eigenvalues_path"),
        )
    )

    mod = ref_model_module()
    model_config = config["model"]
    if "hks_timesteps" in model_config:
        # The reference's make_model gates the HKS input dim on
        # `hasattr(model_config, "hks_timesteps")` (model.py:209) — written
        # for an attribute-style config, dead for the plain dicts its YAML
        # loader produces (it would build in_dim=k and crash on the 128-dim
        # HKS features). Hand the verbatim reference code the attribute view
        # that branch expects; every other family stays a plain dict.
        class _AttrDict(dict):
            def __getattr__(self, name):
                try:
                    return self[name]
                except KeyError:
                    raise AttributeError(name)

        model_config = _AttrDict(model_config)
    model = mod.make_model(model_config, mesh=None)
    optim = torch.optim.Adam(model.parameters(), lr=config["training"]["lr"])
    loss_type = config["training"]["loss_type"]
    assert loss_type == "L1", loss_type
    loss_fn = F.l1_loss

    # Re-seed after model construction (reference train.py:55-58).
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)

    tr_vids, tr_bary, tr_rgbs = load_split(
        config["data"]["preproc_data_path_train"])
    va_vids, va_bary, va_rgbs = load_split(
        config["data"]["preproc_data_path_eval"])

    B = config["training"]["batch_size"]
    N = tr_vids.shape[0]
    n_train_batches = N // B  # drop_last=True (reference config.py:69)
    Nv = va_vids.shape[0]
    n_val_batches = (Nv + B - 1) // B  # drop_last=False

    epochs = args.epochs or config["training"]["epochs"]
    print_every = args.print_every or config["training"].get("print_every", 25)
    os.makedirs(args.out_dir, exist_ok=True)
    best_path = os.path.join(args.out_dir, "model.pt")
    last_path = os.path.join(args.out_dir, "model_last_epoch.pt")
    hist_path = os.path.join(args.out_dir, "history.json")

    ckpt_path = os.path.join(args.out_dir, "checkpoint.pt")
    min_val_loss = 1.0  # reference trainer.py:236
    history = []
    start_epoch = 0
    if args.resume and os.path.exists(ckpt_path):
        ckpt = torch.load(ckpt_path, weights_only=False)
        model.load_state_dict(ckpt["model_state_dict"])
        optim.load_state_dict(ckpt["optimizer_state_dict"])
        torch.set_rng_state(ckpt["torch_rng_state"])
        random.setstate(ckpt["py_rng_state"])
        np.random.set_state(ckpt["np_rng_state"])
        min_val_loss = ckpt["min_val_loss"]
        history = ckpt["history"]
        start_epoch = ckpt["epoch"] + 1
        print(f"Resumed from {ckpt_path} at epoch {start_epoch}", flush=True)

    t_start = time.time()
    for epoch in range(start_epoch, epochs):
        model.train()
        perm = torch.randperm(N)
        acc_loss = 0.0
        acc_l2 = 0.0
        total = 0
        t0 = time.time()
        for i in range(n_train_batches):
            idx = perm[i * B:(i + 1) * B]
            batch = {
                "eigenfunctions": gather_batch(E, tr_vids, tr_bary, idx),
                "expected_rgbs": tr_rgbs[idx],
            }
            pred = model(batch)
            loss = loss_fn(pred, batch["expected_rgbs"])
            optim.zero_grad(set_to_none=True)
            loss.backward()
            optim.step()
            bs = idx.shape[0]
            acc_l2 += F.mse_loss(
                pred, batch["expected_rgbs"], reduction="sum").item()
            acc_loss += loss.item() * bs
            total += bs
        train_time = time.time() - t0
        train_loss = acc_loss / total
        train_psnr = epoch_psnr_from_l2(acc_l2 / total)

        model.eval()
        acc_loss = 0.0
        acc_l2 = 0.0
        total = 0
        with torch.no_grad():
            for i in range(n_val_batches):
                lo, hi = i * B, min((i + 1) * B, Nv)
                idx = torch.arange(lo, hi)
                batch = {
                    "eigenfunctions": gather_batch(E, va_vids, va_bary, idx),
                    "expected_rgbs": va_rgbs[idx],
                }
                pred = model(batch)
                loss = loss_fn(pred, batch["expected_rgbs"])
                bs = hi - lo
                acc_l2 += F.mse_loss(
                    pred, batch["expected_rgbs"], reduction="sum").item()
                acc_loss += loss.item() * bs
                total += bs
        val_loss = acc_loss / total
        val_psnr = epoch_psnr_from_l2(acc_l2 / total)

        if val_loss < min_val_loss:
            min_val_loss = val_loss
            torch.save(model.state_dict(), best_path)

        history.append({
            "epoch": epoch, "train_loss": train_loss,
            "train_psnr": train_psnr, "val_loss": val_loss,
            "val_psnr": val_psnr, "train_s": round(train_time, 2),
        })
        if epoch == 0 or (epoch + 1) % print_every == 0:
            print(
                f"Epoch: {epoch + 1} / {epochs}, Train Loss: {train_loss:.6f}, "
                f"Train PSNR: {train_psnr:.2f}, Val Loss: {val_loss:.6f}, "
                f"Val PSNR: {val_psnr:.2f}, Epoch Time: {train_time:.1f}s",
                flush=True,
            )
            with open(hist_path, "w") as f:
                json.dump(history, f)
        if (epoch + 1) % args.checkpoint_every == 0:
            tmp = ckpt_path + ".tmp"
            torch.save({
                "epoch": epoch,
                "model_state_dict": model.state_dict(),
                "optimizer_state_dict": optim.state_dict(),
                "torch_rng_state": torch.get_rng_state(),
                "py_rng_state": random.getstate(),
                "np_rng_state": np.random.get_state(),
                "min_val_loss": min_val_loss,
                "history": history,
            }, tmp)
            os.replace(tmp, ckpt_path)

    torch.save(model.state_dict(), last_path)
    with open(hist_path, "w") as f:
        json.dump(history, f)
    print(f"Done in {time.time() - t_start:.0f}s. Best val loss "
          f"{min_val_loss:.6f}. Wrote {best_path}, {last_path}, {hist_path}")


if __name__ == "__main__":
    main()
