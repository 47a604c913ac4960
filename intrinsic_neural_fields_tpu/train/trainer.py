"""Training orchestration (reference trainer.py:18-337).

The host-side loop is thin: one jitted `train_epoch` call + one jitted
`val_epoch` call per epoch (see steps.py), TensorBoard scalars, periodic
full-view renders, best/interval/final checkpoints, and resume. Scalar tags
and print formats mirror the reference so existing tooling reads the logs.

Deviations (deliberate, per SURVEY section 2.4):
  - min_val_loss starts at +inf, not 1.0, so the best snapshot exists even if
    the first epochs have loss > 1 (reference trainer.py:237).
  - RNG state in checkpoints is the single JAX PRNG key that drives batch
    shuffling — restoring it reproduces the exact batch order on resume.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import MeshroomRadialK3Dataset
from ..evaluation.metrics import epoch_psnr, psnr
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.io import imread, load_cameras, load_obj_mask_as_numpy
from .plateau import ReduceLROnPlateau
from .steps import (
    TrainState,
    create_train_state,
    fused_pre_embed_eligible,
    fused_viewdep_eligible,
    make_epoch_fns,
    make_variables,
)


def reference_adam_opt_state(optimizer, params, adam):
    """Optax state for `optimizer` (inject_hyperparams(optax.adam)(lr), see
    config.get_model_and_optim) carrying a reference-trained torch Adam state
    (utils/torch_convert.load_reference_train_checkpoint's ``adam`` dict):
    step count, first/second moments, and the group lr/betas/eps. Torch's
    update  p -= lr * m_hat / (sqrt(v_hat) + eps)  is optax.adam's with
    eps_root=0, so the moments carry over verbatim."""
    import jax.numpy as jnp

    opt_state = optimizer.init(params)
    # separate buffers for the outer/inner counts: the epoch jit donates the
    # whole opt_state, and one buffer appearing twice breaks donation
    count = lambda: jnp.array(adam["count"], jnp.int32)  # noqa: E731
    cast = lambda tree: jax.tree_util.tree_map(  # noqa: E731
        lambda m, p: jnp.asarray(m, jnp.asarray(p).dtype), tree, params
    )
    try:
        inner_adam, *rest = opt_state.inner_state
        inner_adam = inner_adam._replace(
            count=count(), mu=cast(adam["mu"]), nu=cast(adam["nu"])
        )
        hyper = dict(opt_state.hyperparams)
        for ours, theirs in (("learning_rate", "lr"), ("b1", "b1"),
                             ("b2", "b2"), ("eps", "eps")):
            hyper[ours] = jnp.asarray(adam[theirs], jnp.float32)
        return opt_state._replace(
            count=count(), hyperparams=hyper,
            inner_state=(inner_adam, *rest),
        )
    except (AttributeError, TypeError, ValueError) as e:
        raise ValueError(
            "optimizer state does not look like inject_hyperparams(optax.adam) "
            f"— cannot carry a reference Adam state into it: {e}"
        )


class Trainer:
    def __init__(self, model, variables, optimizer, loss_type, renderer, data, mesh, config):
        self.model = model
        self.optimizer = optimizer
        self.loss_type = loss_type
        self.renderer = renderer
        self.mesh = mesh
        self.config = config

        self.state = create_train_state(variables, optimizer)
        self.shuffle = config["training"].get("shuffle", "full")
        self.fused_mlp = config["training"].get("fused_mlp", False)

        self.train_data = data["train"]
        self.val_data = data["val"]
        self.test_data = data.get("test")

        # The model the EPOCH functions run. For xyz/ff/rff TextureFields
        # with training.fused_mlp, the input encoding is a fixed function of
        # the hit position, so all splits are pre-embedded once and the
        # epochs run the mlp_core_view (identical params tree) on the
        # embedded rows — which is what makes these families eligible for
        # the fused Pallas step. Rendering/eval keep the ORIGINAL model:
        # fresh rays embed in-forward.
        self.epoch_model = model
        self._pre_embed_buffers = None
        if self.fused_mlp and fused_pre_embed_eligible(model):
            import dataclasses

            from ..data.sampler import parse_precompute_dtype
            from ..models.texture_field import mlp_core_view

            self._pre_embed_dtype = parse_precompute_dtype(
                config["data"].get("precompute_dtype")
            )
            # Raw splits kept ONLY for a restore-time re-embed; their
            # precomputed hit-xyz tables are never read again (re-embedding
            # recomputes from the vertex table), so drop them rather than
            # pin N*3 floats per split in HBM for the Trainer's lifetime.
            strip = lambda d: (
                None if d is None else dataclasses.replace(d, hit_features=None)
            )
            self._raw_splits = (
                strip(data["train"]), strip(data["val"]), strip(data.get("test"))
            )
            if self._apply_pre_embedding(variables.get("buffers", {})):
                self.epoch_model = mlp_core_view(model)

        if self.fused_mlp and fused_viewdep_eligible(model) and (
            self.train_data.feature_strategy == "efuncs"
        ):
            # View-dependent fused training: pre-encode the directional
            # encoding per cached hit (a fixed function of the cached ray
            # dir + hit face) so the train kernels stream it in tail mode.
            import jax as _jax
            import jax.numpy as _jnp

            from ..data.sampler import (
                parse_precompute_dtype,
                precompute_hit_vencs,
            )
            from ..models.texture_field import view_encoder_apply
            from ..ops.fused_mlp import _round_up

            venc_fn = view_encoder_apply(model)
            venc_in = int(_jax.eval_shape(
                venc_fn,
                _jax.ShapeDtypeStruct((1, 3), _jnp.float32),
                _jax.ShapeDtypeStruct((1,), _jnp.int32),
            ).shape[1])
            venc_pad = _round_up(venc_in, 128)
            vdtype = parse_precompute_dtype(
                config["data"].get("precompute_dtype")
            )
            self.train_data = precompute_hit_vencs(
                venc_fn, self.train_data, venc_pad, dtype=vdtype
            )

        self.train_epoch_fn, self.val_epoch_fn = make_epoch_fns(
            self.epoch_model, optimizer, loss_type, shuffle=self.shuffle,
            fused=self.fused_mlp,
            # in-kernel Adam rides the fused streaming path by default;
            # training.fused_adam: false is the escape hatch
            fused_adam=config["training"].get("fused_adam", True),
            fused_interleave=config["training"].get("fused_interleave", 4),
            sorted_gather=config["training"].get("sorted_gather", False),
        )

        self.use_lr_scheduler = config["training"].get("use_lr_scheduler", False)
        self.lr_scheduler = ReduceLROnPlateau(factor=0.2)

        self.dataset_type = config["data"].get("type")
        self.H = config["data"]["img_height"]
        self.W = config["data"]["img_width"]

        if self.dataset_type is None:
            self.val_render_infos = list(
                zip(
                    config["data"].get("eval_render_input_paths", []),
                    config["data"].get("eval_render_img_names", []),
                )
            )

        self.out_dir = config["training"]["out_dir"]
        log_dir = os.path.join(self.out_dir, "logs")
        os.makedirs(log_dir, exist_ok=True)
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(log_dir)

        self.batch_size = config["training"]["batch_size"]
        self.drop_last = config["data"].get("train_drop_last", True)
        self.render_every = config["training"]["render_every"]
        self.print_every = config["training"]["print_every"]
        self.epochs = config["training"]["epochs"]
        self.checkpoint_every = config["training"].get("checkpoint_every")
        self.checkpoint_path = os.path.join(self.out_dir, "checkpoint.ckpt")

        self.best_model_weights_path = os.path.join(self.out_dir, "model.ckpt")
        self.model_last_epoch_path = os.path.join(self.out_dir, "model_last_epoch.ckpt")
        self.best_variables = jax.device_get(make_variables(self.state))

        seed = config.get("seed", 0)
        self.base_key = jax.random.PRNGKey(seed)

    # ------------------------------------------------------------------ utils

    def _apply_pre_embedding(self, buffers):
        """(Re)compute the pre-embedded splits for the fused xyz/ff/rff path
        using the encoder state in `buffers` (the RFF projection B lives
        there). Returns False — leaving the original model/data in place —
        when the embedded table would exceed the precompute budget (a table
        that large can't stream through the fused kernel's HBM layout
        anyway)."""
        from ..data.sampler import PRECOMPUTE_BYTES_LIMIT, pre_embed_ray_data
        from ..models.texture_field import input_encoder_apply

        train_raw, val_raw, test_raw = self._raw_splits
        enc = input_encoder_apply(
            self.model, {"params": {}, "buffers": buffers}
        )
        dtype = self._pre_embed_dtype
        emb_dim = np.asarray(enc(jnp.zeros((1, 3), jnp.float32))).shape[1]
        itemsize = 2 if dtype == jnp.bfloat16 else 4
        total_rows = sum(
            d.n for d in (train_raw, val_raw, test_raw) if d is not None
        )
        if total_rows * emb_dim * itemsize > PRECOMPUTE_BYTES_LIMIT:
            print(
                "fused_mlp: pre-embedded feature tables (all splits) would "
                "exceed the precompute budget — keeping the XLA in-forward "
                "path"
            )
            self.fused_mlp = False
            return False
        self.train_data = pre_embed_ray_data(enc, train_raw, dtype=dtype)
        self.val_data = pre_embed_ray_data(enc, val_raw, dtype=dtype)
        if test_raw is not None:
            self.test_data = pre_embed_ray_data(enc, test_raw, dtype=dtype)
        self._pre_embed_buffers = jax.device_get(buffers)
        return True

    def _refresh_pre_embedding_after_restore(self):
        """A restored checkpoint may carry DIFFERENT encoder buffers than the
        ones the constructor embedded with (a reference-trained torch
        checkpoint brings its own RFF projection B; our own checkpoints
        reproduce the init-time B only when seeds match). Stale embeddings
        would silently train against the wrong encoding — re-embed when the
        buffers changed."""
        if self._pre_embed_buffers is None:
            return
        restored = jax.device_get(self.state.buffers)
        same = jax.tree_util.tree_structure(restored) == (
            jax.tree_util.tree_structure(self._pre_embed_buffers)
        ) and all(
            np.array_equal(a, b)
            for a, b in zip(
                jax.tree_util.tree_leaves(restored),
                jax.tree_util.tree_leaves(self._pre_embed_buffers),
            )
        )
        if not same:
            print("Encoder buffers changed on restore — re-embedding splits...")
            self._apply_pre_embedding(self.state.buffers)

    def _checkpoint_payload(self, epoch):
        return {
            "epoch": np.int64(epoch),
            "params": self.state.params,
            "buffers": self.state.buffers,
            "opt_state": self.state.opt_state,
            "batch_stats": self.state.batch_stats,
            "rng_key": self.base_key,
        }

    def _save_checkpoint(self, path, epoch):
        save_checkpoint(path, self._checkpoint_payload(epoch))

    def _init_or_load_checkpoint(self):
        """Resume from out_dir/checkpoint.ckpt when present (reference
        trainer.py:214-230). Returns the epoch to start from."""
        if self.checkpoint_every is None:
            return 0
        if not os.path.exists(self.checkpoint_path):
            ref_path = os.path.join(self.out_dir, "checkpoint.pt")
            if os.path.exists(ref_path):
                return self._load_reference_checkpoint(ref_path)
            return 0
        print("Restoring from checkpoint...")
        template = jax.device_get(self._checkpoint_payload(0))
        ckpt = load_checkpoint(self.checkpoint_path, template)
        self.state = TrainState(
            params=ckpt["params"],
            buffers=ckpt["buffers"],
            opt_state=ckpt["opt_state"],
            batch_stats=ckpt.get("batch_stats", {}),
        )
        self.base_key = jax.numpy.asarray(ckpt["rng_key"])
        print("Done.")
        return int(ckpt["epoch"]) + 1

    def _load_reference_checkpoint(self, ref_path):
        """Resume from a reference-trained torch ``checkpoint.pt`` (reference
        trainer.py:302-313): weights and the full Adam trajectory (moments,
        step count, lr) carry over; the torch RNG states cannot seed a JAX
        PRNG, so batch order restarts from this config's seed."""
        print(f"Restoring from reference torch checkpoint {ref_path}...")
        from ..utils.torch_convert import (
            _check_against_template,
            load_reference_train_checkpoint,
        )

        info = load_reference_train_checkpoint(ref_path)
        template = jax.device_get(make_variables(self.state))
        variables = _check_against_template(info["variables"], template)
        params = variables["params"]
        self.state = TrainState(
            params=params,
            buffers=variables.get("buffers", {}),
            opt_state=reference_adam_opt_state(self.optimizer, params, info["adam"]),
            batch_stats=variables.get("batch_stats", {}),
        )
        print("Done (note: batch shuffling reseeds — torch RNG state does not "
              "transfer to a JAX PRNG; the optimizer state carries over exactly).")
        return info["epoch"] + 1

    def _current_lr(self):
        try:
            return float(self.state.opt_state.hyperparams["learning_rate"])
        except (AttributeError, KeyError, TypeError):
            return float("nan")

    def _set_lr(self, lr):
        self.state.opt_state.hyperparams["learning_rate"] = jax.numpy.asarray(
            lr, dtype=jax.numpy.float32
        )

    # ----------------------------------------------------------------- phases

    def evaluate(self, epoch=None):
        metrics = jax.device_get(
            self.val_epoch_fn(self.state, self.val_data, self.batch_size)
        )
        val_loss = float(metrics["loss"])
        val_psnr = float(epoch_psnr(metrics["sq_err_per_sample"]))
        self.writer.add_scalar("Val_Loss", val_loss, epoch)
        self.writer.add_scalar("Val Epoch-PSNR", val_psnr, epoch)
        return val_loss, val_psnr

    def test(self):
        """Evaluate the best model on the test split (functional here, unlike
        the reference where the test loader was never built; trainer.py:189-191)."""
        if self.test_data is None:
            return None
        best_state = TrainState(
            params=self.best_variables["params"],
            buffers=self.best_variables.get("buffers", {}),
            opt_state=self.state.opt_state,
            batch_stats=self.best_variables.get("batch_stats", {}),
        )
        metrics = jax.device_get(self.val_epoch_fn(best_state, self.test_data, self.batch_size))
        test_loss = float(metrics["loss"])
        self.writer.add_scalar("Test Loss", test_loss)
        print(f"Test Loss: {test_loss}")
        return test_loss

    def write_vis_metrics_to_tensorboard(self, img_name, rendered_img, gt_img, obj_mask_1d, epoch):
        self.writer.add_image(img_name, rendered_img.transpose(2, 0, 1), global_step=epoch)
        self.writer.add_scalar(f"{img_name}_psnr", psnr(rendered_img, gt_img, obj_mask_1d), epoch)

        mean_distance_2d = 1.0 - np.mean(np.abs(rendered_img - gt_img), -1)
        mean_distance_2d = np.repeat(mean_distance_2d[None, ...], 3, axis=0)
        self.writer.add_image(f"{img_name}_2d_mean_distance", mean_distance_2d, global_step=epoch)

        fake = rendered_img.reshape(-1, 3)[obj_mask_1d]
        real = gt_img.reshape(-1, 3)[obj_mask_1d]
        self.writer.add_scalar(f"{img_name}_dist", np.abs(real - fake).sum(), epoch)

    def _render_view_for_tensorboard(self, input_path, img_name, epoch):
        obj_mask_1d = load_obj_mask_as_numpy(input_path).reshape(-1)
        camCv2world, K = load_cameras(input_path)
        # cache_key: the ray trace of a fixed vis view is identical every
        # epoch — only the MLP inference reruns.
        rendered_img = self.renderer.render(
            camCv2world, K, obj_mask_1d=obj_mask_1d, cache_key=input_path
        )

        gt_img = imread(os.path.join(input_path, "image", "000.png")).astype(np.float32) / 255.0
        shape = gt_img.shape
        gt_img = gt_img.reshape(-1, 3)
        gt_img[~obj_mask_1d] = 1.0
        gt_img = gt_img.reshape(shape)

        self.write_vis_metrics_to_tensorboard(img_name, rendered_img, gt_img, obj_mask_1d, epoch)

    def _render_views_for_tensorboard_meshroom(self, epoch):
        vis = MeshroomRadialK3Dataset(
            self.config["data"]["vis_dataset_path"],
            self.config["data"]["vis_split"],
            H=self.H,
            W=self.W,
        )
        for idx, item in enumerate(vis):
            rendered = self.renderer.render(
                item["camCv2world"],
                item["K"],
                distortion_coeffs=item["distortion_params"],
                distortion_type=item["distortion_type"],
                cache_key=f"meshroom_vis_{idx}",
            )
            self.write_vis_metrics_to_tensorboard(
                f"meshroom_radial_k3_view_{idx}", rendered, item["img"], item["obj_mask_1d"], epoch
            )

    def _visualize(self, epoch):
        self.renderer.update_variables(make_variables(self.state))
        print("Visualizing...")
        vis_start = time.time()
        if self.dataset_type is None:
            for i, (input_path, _img_name) in enumerate(self.val_render_infos):
                self._render_view_for_tensorboard(input_path, f"img{i:03d}", epoch)
        elif self.dataset_type == "meshroom_radial_k3":
            self._render_views_for_tensorboard_meshroom(epoch)
        else:
            raise NotImplementedError(f"Unknown dataset type: {self.dataset_type}!")
        print(f"Done with visualizations after {time.time() - vis_start} seconds.")

    # ------------------------------------------------------------------ train

    def train(self):
        print("Starting training...")
        epoch_start_idx = self._init_or_load_checkpoint()
        self._refresh_pre_embedding_after_restore()

        num_batches = (
            self.train_data.n // self.batch_size
            if self.drop_last
            else -(-self.train_data.n // self.batch_size)
        )
        assert num_batches > 0, "training set smaller than one batch"

        min_val_loss = float("inf")

        # Optional jax profiler capture of one post-warmup epoch
        # (SURVEY.md section 5: the reference has no tracing; this framework
        # exposes it via training.profile_dir).
        profile_dir = self.config["training"].get("profile_dir")
        profile_epoch = self.config["training"].get("profile_epoch", 1)

        for epoch in range(epoch_start_idx, self.epochs):
            key = jax.random.fold_in(self.base_key, epoch)

            profiling = profile_dir is not None and epoch == profile_epoch
            if profiling:
                jax.profiler.start_trace(profile_dir)

            t0 = time.time()
            self.state, metrics = self.train_epoch_fn(
                self.state, key, self.train_data, num_batches, self.batch_size
            )
            metrics = jax.device_get(metrics)
            t1 = time.time()

            if profiling:
                jax.profiler.stop_trace()
                print(f"Wrote profiler trace for epoch {epoch} to {profile_dir}")

            rays_per_sec = num_batches * self.batch_size / max(t1 - t0, 1e-9)
            self.writer.add_scalar("Train Rays-per-sec", rays_per_sec, epoch)

            train_loss = float(metrics["loss"])
            train_psnr = float(epoch_psnr(metrics["sq_err_per_sample"]))
            self.writer.add_scalar("Train_Loss", train_loss, epoch)
            self.writer.add_scalar("Train Epoch-PSNR", train_psnr, epoch)

            val_loss, val_psnr = self.evaluate(epoch)

            if val_loss < min_val_loss:
                min_val_loss = val_loss
                self.best_variables = jax.device_get(make_variables(self.state))
                save_checkpoint(self.best_model_weights_path, self.best_variables)

            if self.use_lr_scheduler:
                self._set_lr(self.lr_scheduler.step(val_loss, self._current_lr()))

            if epoch == 0 or (epoch + 1) % self.print_every == 0:
                print(
                    f"Epoch: {epoch + 1} / {self.epochs}, Train Loss: {train_loss}, "
                    f"Train PSNR: {train_psnr}, Val Loss: {val_loss}, Val PSNR: {val_psnr} "
                    f"Epoch Time: {t1 - t0}s ({rays_per_sec / 1e6:.2f}M rays/s)"
                )

            if epoch == 0 or (epoch + 1) % self.render_every == 0:
                self._visualize(epoch)

            if self.checkpoint_every is not None and epoch % self.checkpoint_every == 0:
                print("Saving checkpoint...")
                self._save_checkpoint(self.checkpoint_path, epoch)
                print("Done.")

            if epoch > 0 and (epoch + 1) == 200:
                # Persistent snapshot at epoch 200 (reference trainer.py:315-331).
                print(f"Persisting checkpoint at {epoch}...")
                self._save_checkpoint(os.path.join(self.out_dir, f"checkpoint_{epoch}.ckpt"), epoch)
                save_checkpoint(
                    os.path.join(self.out_dir, f"best_model_checkpoint_{epoch}.ckpt"),
                    self.best_variables,
                )
                print("Done.")

        self.test()
        print("Done.")
        save_checkpoint(self.model_last_epoch_path, jax.device_get(make_variables(self.state)))
