"""Neural texture field models (reference model.py:12-191), as flax modules.

A TextureField is a `num_layers`-deep MLP with one input re-injection ("skip")
at `skip_layer_idx`, sigmoid RGB head (or ReLU feature head), fed by one of
four input strategies: LBO eigenfunction embeddings ("efuncs", the intrinsic
path), raw xyz, Fourier features of xyz ("ff"), or random Fourier features
("rff"). The view-dependent variant splits into a spatial MLP producing a
bottleneck vector plus a small directional MLP conditioned on an encoded view
direction — either extrinsic (the unit ray direction) or intrinsic (the angle
between the incoming ray and the hit-face normal, reference model.py:175-184).

The forward pass is a pure function of (variables, batch-dict) so the whole
model sits inside the jitted train/render step. The hidden width (default 128)
matches the TPU lane width; batches are padded to sublane multiples upstream.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .encoders import FourierFeatEnc, RandomFourierFeatEnc

RGB_COLOR_DIM = 3

# Xavier-uniform kernel init, matching the reference's explicit re-init of
# every Linear layer (reference model.py:194-196). Torch's default bias init
# is uniform(+-1/sqrt(fan_in)) and is NOT overridden there; we use zeros —
# statistically immaterial for these depths, and friendlier to pruning.
_dense = lambda feats: nn.Dense(feats, kernel_init=nn.initializers.xavier_uniform())


def _activation(name_or_fn):
    if callable(name_or_fn):
        return name_or_fn
    if name_or_fn == "relu":
        return nn.relu
    if name_or_fn == "sine":
        return jnp.sin
    raise NotImplementedError(f"Activation function {name_or_fn} not implemented.")


class TextureField(nn.Module):
    """MLP texture field with one input skip (reference model.py:12-112)."""

    num_layers: int
    hidden_dim: int
    skip_layer_idx: int
    input_feature_embed: Optional[str] = None  # None/"efuncs" | "xyz" | "ff" | "rff"
    embed_dim: Optional[int] = None
    embed_include_input: bool = True
    embed_std: float = 1.0
    embed_use_logspace: bool = True
    embed_max_freq: Optional[float] = None
    return_rgb: bool = True
    out_dim: int = RGB_COLOR_DIM
    batchnorm: bool = False
    activation: Any = "relu"
    # Cross-replica BatchNorm: when set (the data-parallel path clones the
    # model with the mesh axis name), batch statistics are pmean'd over the
    # axis so every device normalizes with the GLOBAL batch stats and the
    # running stats stay replicated (sync-BN; the reference's DataParallel
    # equivalent, train.py:46-48 + model.py:44-51).
    bn_axis_name: Optional[str] = None

    def setup(self):
        assert self.num_layers > 2 and 0 < self.skip_layer_idx < self.num_layers - 1

    def _embed_input(self, batch):
        if self.input_feature_embed == "ff":
            enc = FourierFeatEnc(
                self.embed_dim,
                include_input=self.embed_include_input,
                use_logspace=self.embed_use_logspace,
                max_freq=self.embed_max_freq,
            )
            return enc(batch["xyz"])
        if self.input_feature_embed == "rff":
            enc = RandomFourierFeatEnc(
                self.embed_dim, std=self.embed_std, include_input=self.embed_include_input
            )
            return enc(batch["xyz"])
        if self.input_feature_embed == "xyz":
            return batch["xyz"]
        return batch["eigenfunctions"]

    @nn.compact
    def __call__(self, batch, train=False):
        act = _activation(self.activation)
        features = self._embed_input(batch)

        def maybe_bn(h):
            if not self.batchnorm:
                return h
            # BatchNorm AFTER the activation, torch-default momentum
            # (reference model.py:44-51, layers.py:56-62).
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                axis_name=self.bn_axis_name,
            )(h)

        h = features
        for i in range(self.num_layers - 1):
            if i == self.skip_layer_idx:
                # Input re-injection: act(Lx(h) + Ly(features))
                # (reference layers.py:50-62).
                h = maybe_bn(
                    act(_dense(self.hidden_dim)(h) + _dense(self.hidden_dim)(features))
                )
            else:
                h = maybe_bn(act(_dense(self.hidden_dim)(h)))
        out = _dense(self.out_dim)(h)
        return nn.sigmoid(out) if self.return_rgb else nn.relu(out)


def input_encoder_apply(model, variables):
    """Pure function xyz -> the model's embedded MLP input, or None when the
    model consumes raw eigenfunctions (nothing to precompute).

    The xyz/ff/rff input encodings are FIXED functions of the hit position:
    Fourier bands are constants and the random projection B is a persistent
    non-trainable buffer (reference layers.py:28-39; gradient never flows
    into it). They can therefore be evaluated once per cached hit and the
    training loop run on the pre-embedded rows — which is what lets the
    fused Pallas train step cover these model families too (train/steps.py
    fused_pre_embed_eligible)."""
    embed = model.input_feature_embed
    if embed in (None, "efuncs"):
        return None
    if embed == "xyz":
        return lambda x: x
    if embed == "ff":
        enc = FourierFeatEnc(
            model.embed_dim,
            include_input=model.embed_include_input,
            use_logspace=model.embed_use_logspace,
            max_freq=model.embed_max_freq,
        )
        return lambda x: enc.apply({}, x)
    if embed == "rff":
        B = variables["buffers"]["RandomFourierFeatEnc_0"]["B"]
        enc = RandomFourierFeatEnc(
            model.embed_dim,
            std=model.embed_std,
            include_input=model.embed_include_input,
        )
        return lambda x: enc.apply({"buffers": {"B": B}}, x)
    raise ValueError(f"Unknown input feature embed: {embed}")


def mlp_core_view(model):
    """The same TextureField over PRE-EMBEDDED inputs: input_feature_embed
    dropped, everything else identical. The encoders hold no trainable
    parameters (RFF's B is a buffer), so the Dense-layer numbering — hence
    the params pytree — is identical to `model`'s and one TrainState serves
    both. Feed it batches whose "eigenfunctions" key holds
    input_encoder_apply(model, ...)(hit_xyz)."""
    return TextureField(
        num_layers=model.num_layers,
        hidden_dim=model.hidden_dim,
        skip_layer_idx=model.skip_layer_idx,
        input_feature_embed=None,
        return_rgb=model.return_rgb,
        out_dim=model.out_dim,
        batchnorm=model.batchnorm,
        activation=model.activation,
        bn_axis_name=model.bn_axis_name,
    )


def view_encoder_apply(model):
    """Pure function (unit_ray_dirs [N,3], hit_face_idxs [N]) -> the
    view-direction encoding TextureFieldWithViewDependency concatenates to
    its bottleneck (reference model.py:175-184). The encoding holds no
    trainable parameters (Fourier bands are constants; face normals are a
    fixed buffer), so — like input_encoder_apply — it can be evaluated
    outside the module, which is what lets the fused inference kernel cover
    this family (ops/fused_mlp.make_fused_apply_viewdep)."""
    enc = FourierFeatEnc(
        model.view_dir_embedding_size,
        include_input=model.include_view_dir,
        use_logspace=True,
    )
    if model.view_dir_strategy == "intrinsic":
        normals = jnp.asarray(model.face_normals, jnp.float32)

        def fn(dirs, face_idxs):
            hit_face_normals = jnp.take(normals, face_idxs, axis=0)
            angles = calculate_angle_between_vectors(-dirs, hit_face_normals)
            return enc.apply({}, angles[..., None])

        return fn
    if model.view_dir_strategy == "extrinsic":
        return lambda dirs, face_idxs: enc.apply({}, dirs)
    raise RuntimeError("Unknown viewing direction strategy.")


def calculate_angle_between_vectors(a, b):
    """Angle between row vectors via clipped cosine similarity
    (reference model.py:115-120)."""
    cos = jnp.sum(a * b, axis=-1) / (
        jnp.maximum(jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), 1e-12)
    )
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


class TextureFieldWithViewDependency(nn.Module):
    """Spatial MLP -> bottleneck, directional MLP -> RGB
    (reference model.py:123-191)."""

    num_layers: int
    hidden_dim: int
    skip_layer_idx: int
    bottleneck_vec_dim: int
    in_dim_view_dir: int
    include_view_dir: bool
    view_dir_embedding_size: int
    directional_hidden_dim: int
    input_feature_embed: Optional[str] = None
    embed_dim: Optional[int] = None
    embed_include_input: bool = True
    embed_std: float = 1.0
    embed_use_logspace: bool = True
    embed_max_freq: Optional[float] = None
    face_normals: Optional[np.ndarray] = None  # [F,3], required for "intrinsic"
    view_dir_strategy: str = "intrinsic"
    batchnorm: bool = False
    activation: Any = "relu"
    bn_axis_name: Optional[str] = None  # see TextureField.bn_axis_name

    def _embedded_view_dir(self, batch):
        enc = FourierFeatEnc(
            self.view_dir_embedding_size,
            include_input=self.include_view_dir,
            use_logspace=True,
        )
        if self.view_dir_strategy == "intrinsic":
            normals = jnp.asarray(self.face_normals, jnp.float32)
            hit_face_normals = jnp.take(normals, batch["hit_face_idxs"], axis=0)
            # Flip the ray so it points away from the surface, like the normal
            # (reference model.py:178-182).
            angles = calculate_angle_between_vectors(
                -batch["unit_ray_dirs"], hit_face_normals
            )
            return enc(angles[..., None])
        if self.view_dir_strategy == "extrinsic":
            return enc(batch["unit_ray_dirs"])
        raise RuntimeError("Unknown viewing direction strategy.")

    @nn.compact
    def __call__(self, batch, train=False):
        act = _activation(self.activation)
        spatial = TextureField(
            num_layers=self.num_layers,
            hidden_dim=self.hidden_dim,
            skip_layer_idx=self.skip_layer_idx,
            input_feature_embed=self.input_feature_embed,
            embed_dim=self.embed_dim,
            embed_include_input=self.embed_include_input,
            embed_std=self.embed_std,
            embed_use_logspace=self.embed_use_logspace,
            embed_max_freq=self.embed_max_freq,
            return_rgb=False,
            out_dim=self.bottleneck_vec_dim,
            batchnorm=self.batchnorm,
            activation=self.activation,
            bn_axis_name=self.bn_axis_name,
            name="spatial_mlp",
        )
        bottleneck = spatial(batch, train=train)
        view_dir = self._embedded_view_dir(batch)
        h = jnp.concatenate([bottleneck, view_dir], axis=-1)
        h = act(_dense(self.directional_hidden_dim)(h))
        return nn.sigmoid(_dense(RGB_COLOR_DIM)(h))
