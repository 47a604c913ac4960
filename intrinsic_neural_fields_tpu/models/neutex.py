"""NeuTex baseline: AtlasNet sphere-primitive neural texture
(reference neutex/ package, itself adapted from fbxiang/NeuTex).

Architecture (primitive_type="sphere", primitive_count=1, the only released
configuration — reference neutex/neutex.py:14-21,139-147):

  - InverseAtlasnet (3D -> UV): per-primitive MLP 3 -> 128 -> 128 -> 128 -> 4
    (relu); first 3 outputs L2-normalized onto the unit sphere (the UV
    domain), last output is the primitive-selection logit, softmaxed into
    mixture weights (reference atlasnet_inverse.py:60-101).
  - Atlasnet (UV -> 3D): per-primitive MLP 3 -> 512 -> 512 -> 512 -> 3 (relu
    or softplus) decoding sphere points to surface points (reference
    atlasnet_networks.py:10-91,174-277).
  - TextureMlpMix: per-primitive texture MLP FourierFeatEnc(uv) ->
    Linear(width) -> LeakyReLU(0.2) -> num_layers x [Linear, LeakyReLU] ->
    Linear(3) -> sigmoid, mixed by the inverse weights (reference
    texture_mlp.py:36-110).
  - Train-mode loss = MSE(rgb) + inverse-mapping cycle loss
    mean_N sum_p w_p ||xyz - Atlasnet(InverseAtlasnet(xyz))_p||^2, with the
    weights hardcoded to 1 (reference neutex.py:40-46,70-148; the
    loss_origin branch is dead code there, `and False`).

The mapping networks are pretrained with chamfer + UV-cycle losses
(reference neutex_pretrain_mapping.ipynb; see tools/pretrain_neutex_mapping.py)
and then loaded frozen-format (not frozen weights — they keep training) from
a checkpoint; `load_pretrained_mapping` accepts both this framework's msgpack
checkpoints and the reference's torch .pt format, converted in-place.

Initialization matches the reference's per-layer-gain Xavier-uniform
(network_utils.py:114-167): gain 1 everywhere except texture layers followed
by LeakyReLU(0.2), which use gain sqrt(2 / (1 + 0.2^2)).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .encoders import FourierFeatEnc

DEFAULT_OPT = {
    "primitive_count": 1,
    "primitive_type": "sphere",
    "texture_num_layers": 6,
    "texture_decoder_width": 128,
    "atlasnet_activation": "relu",
    "num_freqs": 10,
}

_LEAKY_SLOPE = 0.2
_LEAKY_GAIN = float(np.sqrt(2.0 / (1.0 + _LEAKY_SLOPE ** 2)))


def xavier_uniform_gain(gain=1.0):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        limit = gain * np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


def _dense(feats, gain=1.0, name=None):
    return nn.Dense(feats, kernel_init=xavier_uniform_gain(gain), name=name)


class MappingMLP(nn.Module):
    """linear1 -> num_layers x linear -> last_linear with relu/softplus
    (reference atlasnet_inverse.py:11-57 / atlasnet_networks.py:10-53)."""

    out_dim: int
    hidden_size: int = 128
    num_layers: int = 2
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        act = nn.relu if self.activation == "relu" else nn.softplus
        h = act(_dense(self.hidden_size, name="linear1")(x))
        for i in range(self.num_layers):
            h = act(_dense(self.hidden_size, name=f"linear_{i}")(h))
        return _dense(self.out_dim, name="last_linear")(h)


class InverseAtlasnet(nn.Module):
    """3D points -> (uv on the primitive domain, mixture weights, logits)."""

    num_primitives: int = 1
    primitive_type: str = "sphere"

    @nn.compact
    def __call__(self, points):
        uv_dim = 2 if self.primitive_type == "square" else 3
        outs = [
            MappingMLP(uv_dim + 1, hidden_size=128, num_layers=2, name=f"encoder_{i}")(points)
            for i in range(self.num_primitives)
        ]
        out = jnp.stack(outs, axis=-2)  # [..., P, uv_dim+1]
        raw_uv = out[..., :-1]
        if uv_dim == 2:
            uv = jnp.tanh(raw_uv)
        else:
            uv = raw_uv / jnp.maximum(
                jnp.linalg.norm(raw_uv, axis=-1, keepdims=True), 1e-12
            )
        logits = out[..., -1]
        weights = jax.nn.softmax(logits, axis=-1)
        return uv, weights, logits


class Atlasnet(nn.Module):
    """UV points -> 3D surface points, one 512-wide decoder per primitive."""

    num_primitives: int = 1
    primitive_type: str = "sphere"
    activation: str = "relu"

    @nn.compact
    def __call__(self, uvs):
        # uvs: [..., P, uv_dim]
        outs = [
            MappingMLP(
                3, hidden_size=512, num_layers=2, activation=self.activation,
                name=f"decoder_{i}",
            )(uvs[..., i, :])
            for i in range(self.num_primitives)
        ]
        return jnp.stack(outs, axis=-2)  # [..., P, 3]


class TextureMlp(nn.Module):
    """Sphere texture: FourierFeatEnc(uv) -> LeakyReLU MLP -> sigmoid RGB."""

    num_freqs: int
    num_layers: int = 6
    width: int = 128
    use_logspace: bool = True
    max_freq: Optional[float] = None

    @nn.compact
    def __call__(self, uv):
        enc = FourierFeatEnc(
            self.num_freqs,
            include_input=True,
            use_logspace=self.use_logspace,
            max_freq=self.max_freq,
        )
        h = enc(uv)
        h = nn.leaky_relu(_dense(self.width, gain=_LEAKY_GAIN)(h), _LEAKY_SLOPE)
        for _ in range(self.num_layers):
            h = nn.leaky_relu(_dense(self.width, gain=_LEAKY_GAIN)(h), _LEAKY_SLOPE)
        return nn.sigmoid(_dense(3)(h))


class TextureMlpMix(nn.Module):
    num_primitives: int
    num_freqs: int
    num_layers: int = 6
    width: int = 128
    use_logspace: bool = True
    max_freq: Optional[float] = None

    @nn.compact
    def __call__(self, uvs, weights):
        values = [
            TextureMlp(
                self.num_freqs,
                num_layers=self.num_layers,
                width=self.width,
                use_logspace=self.use_logspace,
                max_freq=self.max_freq,
                name=f"texture_{i}",
            )(uvs[..., i, :])
            for i in range(self.num_primitives)
        ]
        stacked = jnp.stack(values, axis=-2)  # [..., P, 3]
        return jnp.sum(stacked * weights[..., None], axis=-2)


class NeuTex(nn.Module):
    primitive_count: int = 1
    primitive_type: str = "sphere"
    texture_num_layers: int = 6
    texture_decoder_width: int = 128
    atlasnet_activation: str = "relu"
    num_freqs: int = 10
    use_logspace: bool = True
    max_freq: Optional[float] = None

    def setup(self):
        assert self.primitive_type == "sphere" and self.primitive_count == 1
        self.net_atlasnet_uv_to_3d = Atlasnet(
            num_primitives=self.primitive_count,
            primitive_type=self.primitive_type,
            activation=self.atlasnet_activation,
        )
        self.net_inverse_atlasnet_3d_to_uv = InverseAtlasnet(
            num_primitives=self.primitive_count, primitive_type=self.primitive_type
        )
        self.net_texture = TextureMlpMix(
            num_primitives=self.primitive_count,
            num_freqs=self.num_freqs,
            num_layers=self.texture_num_layers,
            width=self.texture_decoder_width,
            use_logspace=self.use_logspace,
            max_freq=self.max_freq,
        )

    def __call__(self, batch, compute_inverse_mapping=True):
        points_3d = batch["xyz"]
        uv, weights, logits = self.net_inverse_atlasnet_3d_to_uv(points_3d)
        output = {
            "points_original": points_3d,
            "rgbs": self.net_texture(uv, weights),
        }
        if compute_inverse_mapping:
            output["points_inverse"] = self.net_atlasnet_uv_to_3d(uv)
            output["points_inverse_primitive_weights"] = weights
        return output

    def map_uvs_to_3d(self, uv_points):
        """uv_points [..., P, uv_dim] -> [..., P, 3] (pretraining)."""
        return self.net_atlasnet_uv_to_3d(uv_points)

    def invert_points(self, points_3d):
        """3D -> (uv, weights, logits) (pretraining)."""
        return self.net_inverse_atlasnet_3d_to_uv(points_3d)


class NeuTexTrainWrapper(nn.Module):
    """Training wrapper computing the composite NeuTex loss
    (reference neutex.py:37-148). Loss weights follow the released setup:
    color MSE weight 1, inverse-mapping weight 1, all others disabled."""

    primitive_count: int = 1
    primitive_type: str = "sphere"
    texture_num_layers: int = 6
    texture_decoder_width: int = 128
    atlasnet_activation: str = "relu"
    num_freqs: int = 10
    use_logspace: bool = True
    max_freq: Optional[float] = None

    # marker consumed by train/steps.py: model computes its own loss
    computes_loss: bool = True

    def setup(self):
        self.neutex = NeuTex(
            primitive_count=self.primitive_count,
            primitive_type=self.primitive_type,
            texture_num_layers=self.texture_num_layers,
            texture_decoder_width=self.texture_decoder_width,
            atlasnet_activation=self.atlasnet_activation,
            num_freqs=self.num_freqs,
            use_logspace=self.use_logspace,
            max_freq=self.max_freq,
        )

    def __call__(self, batch):
        """Inference: RGB predictions only."""
        return self.neutex(batch, compute_inverse_mapping=False)["rgbs"]

    def loss_and_rgbs(self, batch):
        output = self.neutex(batch, compute_inverse_mapping=True)
        gt = batch["expected_rgbs"]
        loss_color = jnp.mean((output["rgbs"] - gt) ** 2)

        gt_points = output["points_original"]
        points = output["points_inverse"]  # [..., P, 3]
        ppw = output["points_inverse_primitive_weights"]
        dist = jnp.sum((gt_points[..., None, :] - points) ** 2, axis=-1)
        loss_inverse_mapping = jnp.mean(jnp.sum(dist * ppw, axis=-1))

        return loss_color + loss_inverse_mapping, output["rgbs"]


def make_neutex_train_wrapper_default(model_config):
    """Reference factory semantics (neutex.py:26-35): num_freqs comes from
    model k, pretrained mapping weights are required."""
    pretrained_path = model_config["pretrained_path"]
    assert os.path.exists(pretrained_path), pretrained_path
    return NeuTexTrainWrapper(
        num_freqs=model_config.get("k", 10),
        use_logspace=model_config.get("use_logspace", True),
        max_freq=model_config.get("max_freq"),
    )


# --------------------------------------------------------------------------
# Pretrained mapping weights
# --------------------------------------------------------------------------

def _convert_torch_mapping_state(state):
    """Convert the reference's torch checkpoint
    {net_inverse_atlasnet_3d_to_uv, net_atlasnet_uv_to_3d} state dicts into
    flax param subtrees (kernel = weight^T)."""

    def convert_mlp(sd, prefix):
        out = {}
        for torch_name, flax_name in [("linear1", "linear1"), ("last_linear", "last_linear")]:
            out[flax_name] = {
                "kernel": np.asarray(sd[f"{prefix}.{torch_name}.weight"]).T,
                "bias": np.asarray(sd[f"{prefix}.{torch_name}.bias"]),
            }
        i = 0
        while f"{prefix}.linear_list.{i}.weight" in sd:
            out[f"linear_{i}"] = {
                "kernel": np.asarray(sd[f"{prefix}.linear_list.{i}.weight"]).T,
                "bias": np.asarray(sd[f"{prefix}.linear_list.{i}.bias"]),
            }
            i += 1
        return out

    inv_sd = {k: v.numpy() for k, v in state["net_inverse_atlasnet_3d_to_uv"].items()}
    dec_sd = {k: v.numpy() for k, v in state["net_atlasnet_uv_to_3d"].items()}

    inverse = {}
    i = 0
    while any(k.startswith(f"encoders.{i}.") for k in inv_sd):
        inverse[f"encoder_{i}"] = convert_mlp(inv_sd, f"encoders.{i}")
        i += 1
    atlas = {}
    i = 0
    while any(k.startswith(f"decoder.{i}.") for k in dec_sd):
        atlas[f"decoder_{i}"] = convert_mlp(dec_sd, f"decoder.{i}")
        i += 1
    return inverse, atlas


def load_pretrained_mapping(variables, pretrained_path):
    """Return a copy of `variables` with the mapping-network params replaced
    by the pretrained ones. Accepts the reference torch .pt format or this
    framework's msgpack checkpoint of a full variables dict."""
    params = jax.device_get(variables)["params"]
    # The wrapper nests everything under "neutex".
    root = params["neutex"] if "neutex" in params else params

    if pretrained_path.endswith(".pt"):
        import torch

        state = torch.load(pretrained_path, map_location="cpu", weights_only=False)
        inverse, atlas = _convert_torch_mapping_state(state)
    else:
        from ..utils.checkpoint import load_npz_pytree

        loaded = load_npz_pytree(pretrained_path)
        inverse = loaded["net_inverse_atlasnet_3d_to_uv"]
        atlas = loaded["net_atlasnet_uv_to_3d"]

    def assign(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                assign(dst[k], v)
            else:
                assert dst[k].shape == np.asarray(v).shape, (k, dst[k].shape, v.shape)
                dst[k] = np.asarray(v, dtype=np.float32)

    assign(root["net_inverse_atlasnet_3d_to_uv"], inverse)
    assign(root["net_atlasnet_uv_to_3d"], atlas)
    out = dict(jax.device_get(variables))
    out["params"] = params
    return out


def sample_sphere_points(key, n):
    """Uniform points on S^2 (pretraining template sampling; the reference's
    SphereTemplate normalizes gaussians — `* 2 - 1` there is a no-op bug
    before normalize, reference atlasnet_networks.py:115-121)."""
    p = jax.random.normal(key, (n, 3))
    return p / jnp.linalg.norm(p, axis=-1, keepdims=True)


def chamfer_distance(a, b, chunk=4096):
    """Symmetric mean chamfer between point sets a [N,3] and b [M,3],
    computed in tiles so the NxM distance matrix never materializes."""
    def one_sided(x, y):
        # for each x: min over y, scanning y in chunks
        M = y.shape[0]
        n_chunks = -(-M // chunk)
        pad = n_chunks * chunk - M
        # pad with a distant finite sentinel: inf would produce inf*0 = NaN
        # inside the matmul expansion
        y_p = jnp.pad(y, ((0, pad), (0, 0)), constant_values=1e6)
        y_t = y_p.reshape(n_chunks, chunk, 3)

        def body(carry, yc):
            d = (
                jnp.sum(x * x, -1, keepdims=True)
                - 2.0 * x @ yc.T
                + jnp.sum(yc * yc, -1)[None, :]
            )
            return jnp.minimum(carry, jnp.min(d, axis=1)), None

        init = jnp.full((x.shape[0],), jnp.inf)
        best, _ = jax.lax.scan(body, init, y_t)
        return jnp.mean(jnp.maximum(best, 0.0))

    return one_sided(a, b) + one_sided(b, a)
