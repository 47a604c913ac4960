"""Device-resident ray dataset + batch gathering.

Replaces the reference's GPU-resident RayDataLoader (ray_dataloader.py:57-145)
with a TPU-native design: all hit records and the per-vertex feature matrix
live in device memory as jnp arrays; each epoch draws one
`jax.random.permutation` and the per-batch index slice + feature gather +
barycentric interpolation happen INSIDE the jitted epoch scan (see
train/steps.py) — zero host involvement in the hot loop.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.interpolate import interpolate_vertex_features
from ..spectral.features import load_first_k_eigenfunctions
from .load import load_preprocessed_data


@jax.tree_util.register_pytree_node_class
@dataclass
class RayData:
    """All ray-hit supervision records, device-resident.

    Registered as a pytree (feature_strategy rides as static aux data) so a
    RayData passes straight through jit/scan/shard_map.
    """

    features: jnp.ndarray                  # [V,k] eigenfeatures or [V,3] vertices
    feature_strategy: str                  # "efuncs" | "ff" | "rff" | "xyz"
    vertex_idxs_of_hit_faces: jnp.ndarray  # [N,3] i32
    barycentric_coords: jnp.ndarray        # [N,3] f32
    expected_rgbs: jnp.ndarray             # [N,3] f32
    unit_ray_dirs: Optional[jnp.ndarray]   # [N,3] f32 or None
    face_idxs: Optional[jnp.ndarray]       # [N] i32 or None
    # Optional [N,k] features pre-interpolated at every hit (see
    # precompute_hit_features): turns the per-step 3-row vertex gather into a
    # single-row gather / contiguous stream. Bitwise-identical math.
    hit_features: Optional[jnp.ndarray] = None
    # Optional [N, venc_pad] pre-encoded view directions (see
    # precompute_hit_vencs): the view-dependent family's directional encoding
    # is a fixed function of the cached hit, so the fused train kernel
    # streams these rows next to hit_features.
    hit_vencs: Optional[jnp.ndarray] = None

    @property
    def n(self):
        return self.vertex_idxs_of_hit_faces.shape[0]

    def tree_flatten(self):
        children = (
            self.features,
            self.vertex_idxs_of_hit_faces,
            self.barycentric_coords,
            self.expected_rgbs,
            self.unit_ray_dirs,
            self.face_idxs,
            self.hit_features,
            self.hit_vencs,
        )
        return children, self.feature_strategy

    @classmethod
    def tree_unflatten(cls, aux, children):
        (features, vids, bary, rgbs, dirs, fidx, hit_features,
         hit_vencs) = children
        return cls(features, aux, vids, bary, rgbs, dirs, fidx, hit_features,
                   hit_vencs)


def parse_precompute_dtype(dtype):
    """data.precompute_dtype config value (None / "bfloat16" / "float32" /
    a jnp dtype) -> jnp dtype or None. The single place the accepted
    strings live — the Trainer's pre-embed path and create_ray_data must
    agree on them."""
    if dtype is None or not isinstance(dtype, str):
        return dtype
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype]


def _chunked_hit_map(row_fn, data: RayData, chunk, dtype):
    """[N,*] rows = row_fn(vids_chunk, bary_chunk) evaluated on device over
    fixed-size chunks of the cached hits (zero-padded tail dropped), stored
    as `dtype` (None keeps f32). The shared scaffolding of
    precompute_hit_features and pre_embed_ray_data."""
    import jax
    from jax import lax

    n = data.n
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    vids = jnp.pad(data.vertex_idxs_of_hit_faces, ((0, pad), (0, 0)))
    bary = jnp.pad(data.barycentric_coords, ((0, pad), (0, 0)))
    vids = vids.reshape(n_chunks, chunk, 3)
    bary = bary.reshape(n_chunks, chunk, 3)

    @jax.jit
    def run(vids, bary):
        def one(args):
            out = row_fn(*args)
            return out if dtype is None else out.astype(dtype)

        return lax.map(one, (vids, bary))

    rows = run(vids, bary)
    return rows.reshape(-1, rows.shape[-1])[:n]


def precompute_hit_features(data: RayData, chunk=1 << 16, dtype=None):
    """Interpolate the per-vertex features at every cached hit ONCE, on
    device, in chunks. The training gather then reads one [k] row per sample
    instead of three [k] vertex rows + an einsum — a 3x cut in the hot loop's
    HBM gather traffic with bitwise-identical batch features.

    dtype: storage dtype for the [N,k] matrix. bfloat16 halves memory and
    stream bandwidth; since TPU matmuls ingest bf16 operands at default
    precision anyway, the first Dense layer sees (almost) the same numbers —
    interpolation still happens in f32.
    """
    features = data.features
    hit_features = _chunked_hit_map(
        lambda vids, bary: interpolate_vertex_features(features, vids, bary),
        data, chunk, dtype,
    )
    return RayData(
        features=data.features,
        feature_strategy=data.feature_strategy,
        vertex_idxs_of_hit_faces=data.vertex_idxs_of_hit_faces,
        barycentric_coords=data.barycentric_coords,
        expected_rgbs=data.expected_rgbs,
        unit_ray_dirs=data.unit_ray_dirs,
        face_idxs=data.face_idxs,
        hit_features=hit_features,
        hit_vencs=data.hit_vencs,
    )


def pre_embed_ray_data(encoder_apply, data: RayData, chunk=1 << 16, dtype=None):
    """RayData whose hit_features hold the model's EMBEDDED MLP input, one
    row per cached hit: emb = encoder_apply(interp(vertices)) computed once,
    on device, in chunks.

    The xyz/ff/rff encodings are fixed functions of the hit position (the
    RFF projection is a non-trainable buffer), so embedding per hit instead
    of per step is exact — and it makes these families eligible for the
    fused Pallas train step, which streams [N, emb_dim] rows the way it
    streams eigenfeature rows (train/steps.py fused_pre_embed_eligible).

    The hit xyz is recomputed from the f32 vertex table (not read from a
    possibly-bf16 precomputed hit_features) so the encoding sees full
    precision; `dtype` then controls the STORAGE dtype of the embedded rows,
    exactly like precompute_hit_features.

    Returned RayData reports feature_strategy "efuncs": the embedded rows
    feed the MLP directly under the "eigenfunctions" batch key, which is
    what the mlp_core_view model consumes. The [V,*] features table is
    replaced by a [1, emb_dim] placeholder — its width carries the fused
    kernel's k_in; vertex interpolation of a nonlinear embedding would be
    wrong and every consumer of pre-embedded data reads hit_features only.
    """
    assert data.feature_strategy in ("ff", "rff", "xyz"), data.feature_strategy
    verts = data.features  # [V, 3] f32 vertex positions for these strategies
    assert verts.shape[1] == 3, verts.shape

    emb = _chunked_hit_map(
        lambda vids, bary: encoder_apply(
            interpolate_vertex_features(verts, vids, bary)
        ),
        data, chunk, dtype,
    )
    return RayData(
        features=jnp.zeros((1, emb.shape[1]), jnp.float32),
        feature_strategy="efuncs",
        vertex_idxs_of_hit_faces=data.vertex_idxs_of_hit_faces,
        barycentric_coords=data.barycentric_coords,
        expected_rgbs=data.expected_rgbs,
        unit_ray_dirs=data.unit_ray_dirs,
        face_idxs=data.face_idxs,
        hit_features=emb,
    )


# Precompute hit features only while the [N,k] matrix stays under this budget
# (f32 bytes); above it the per-step vertex gather is used instead.
PRECOMPUTE_BYTES_LIMIT = 6 << 30


def create_ray_data(
    preproc_data_path,
    eigenfunctions_path,
    k,
    feature_strategy,
    mesh,
    rescale_strategy="standard",
    embed_strategy=None,
    eigenvalues_path=None,
    hks_timesteps=128,
    precompute="auto",
    precompute_dtype=None,
    shuffle_once=True,
    seed=0,
):
    """Build a device-resident RayData (reference ray_dataloader.py:7-54).

    NOTE: the reference's config.py:64-66 passes embed_strategy/eigenvalues_path
    swapped w.r.t. create_ray_dataloader's signature (harmless there because
    released configs leave both unset); this function takes them as proper
    keywords so the bug class cannot recur.
    """
    if feature_strategy == "efuncs":
        features = load_first_k_eigenfunctions(
            eigenfunctions_path,
            k,
            rescale_strategy=rescale_strategy,
            embed_strategy=embed_strategy,
            eigenvalues_path=eigenvalues_path,
            ts=hks_timesteps,
        )
    elif feature_strategy in ("ff", "rff", "xyz"):
        assert mesh is not None
        features = np.asarray(mesh.vertices, dtype=np.float32)
    else:
        raise ValueError(f"Unknown input feature strategy: {feature_strategy}")

    data = load_preprocessed_data(preproc_data_path)
    unit_ray_dirs = data.get("unit_ray_dirs")
    face_idxs = data.get("face_idxs")
    ray_data = RayData(
        features=jnp.asarray(features),
        feature_strategy=feature_strategy,
        vertex_idxs_of_hit_faces=jnp.asarray(data["vertex_idxs_of_hit_faces"]),
        barycentric_coords=jnp.asarray(data["barycentric_coords"]),
        expected_rgbs=jnp.asarray(data["expected_rgbs"]),
        unit_ray_dirs=None if unit_ray_dirs is None else jnp.asarray(unit_ray_dirs),
        face_idxs=None if face_idxs is None else jnp.asarray(face_idxs),
    )

    if shuffle_once and ray_data.n > 1:
        # One global permutation at load time decorrelates the view-raster
        # write order, so contiguous blocks are uniform samples — the
        # precondition for the streaming "blocks" shuffle (train/steps.py).
        perm = jax.random.permutation(jax.random.PRNGKey(seed), ray_data.n)
        take = lambda a: None if a is None else jnp.take(a, perm, axis=0)
        ray_data = RayData(
            features=ray_data.features,
            feature_strategy=ray_data.feature_strategy,
            vertex_idxs_of_hit_faces=take(ray_data.vertex_idxs_of_hit_faces),
            barycentric_coords=take(ray_data.barycentric_coords),
            expected_rgbs=take(ray_data.expected_rgbs),
            unit_ray_dirs=take(ray_data.unit_ray_dirs),
            face_idxs=take(ray_data.face_idxs),
        )

    n, kdim = ray_data.n, ray_data.features.shape[1]
    itemsize = 2 if precompute_dtype in ("bfloat16", jnp.bfloat16) else 4
    if precompute is True or (
        precompute == "auto" and n * kdim * itemsize <= PRECOMPUTE_BYTES_LIMIT
    ):
        ray_data = precompute_hit_features(
            ray_data, dtype=parse_precompute_dtype(precompute_dtype)
        )
    return ray_data


def num_train_batches(n, batch_size, drop_last=True):
    return n // batch_size if drop_last else -(-n // batch_size)


def _feature_key(data: RayData):
    # ff / rff / xyz all consume the interpolated hit position
    return "eigenfunctions" if data.feature_strategy == "efuncs" else "xyz"


def gather_batch(data: RayData, idx):
    """Assemble the model batch dict for indices idx (traced, inside jit).

    Mirrors RayDataLoader.__next__ (reference ray_dataloader.py:115-145).
    With precomputed hit features this is a single-row gather; otherwise it
    gathers the three face-vertex rows and interpolates barycentrically.
    """
    batch = {"expected_rgbs": jnp.take(data.expected_rgbs, idx, axis=0)}

    if data.hit_features is not None:
        batch[_feature_key(data)] = jnp.take(data.hit_features, idx, axis=0)
    else:
        vids = jnp.take(data.vertex_idxs_of_hit_faces, idx, axis=0)
        bary = jnp.take(data.barycentric_coords, idx, axis=0)
        batch[_feature_key(data)] = interpolate_vertex_features(
            data.features, vids, bary
        )

    if data.unit_ray_dirs is not None:
        batch["unit_ray_dirs"] = jnp.take(data.unit_ray_dirs, idx, axis=0)
        batch["hit_face_idxs"] = jnp.take(data.face_idxs, idx, axis=0)
    return batch


def slice_batch(data: RayData, start, batch_size):
    """Contiguous batch slice starting at traced offset `start` — the
    streaming fast path for block-shuffled epochs (full-bandwidth reads, no
    gather). Requires precomputed hit features."""
    assert data.hit_features is not None

    def take(arr):
        return jax.lax.dynamic_slice(
            arr, (start,) + (0,) * (arr.ndim - 1), (batch_size,) + arr.shape[1:]
        )

    batch = {
        "expected_rgbs": take(data.expected_rgbs),
        _feature_key(data): take(data.hit_features),
    }
    if data.unit_ray_dirs is not None:
        batch["unit_ray_dirs"] = take(data.unit_ray_dirs)
        batch["hit_face_idxs"] = take(data.face_idxs)
    return batch


def precompute_hit_vencs(view_encoder, data: RayData, venc_pad, chunk=1 << 16,
                         dtype=None):
    """RayData with hit_vencs = the view-dependent directional encoding of
    every cached hit, padded to `venc_pad` lanes with zeros.

    view_encoder: models/texture_field.view_encoder_apply(model) — a FIXED
    function of (unit_ray_dirs, hit_face_idxs), both cached per hit, so like
    pre-embedding this is exact and turns the view-dependent family into a
    streamable fused-kernel workload (ops/fused_mlp tail mode). dtype:
    storage dtype (bf16 halves the stream bandwidth; the kernel's matmuls
    ingest bf16 anyway).
    """
    import jax
    from jax import lax

    assert data.unit_ray_dirs is not None and data.face_idxs is not None, (
        "view-dependent pre-encoding needs cached ray dirs + hit face ids"
    )
    n = data.n
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    dirs = jnp.pad(data.unit_ray_dirs, ((0, pad), (0, 0))).reshape(
        n_chunks, chunk, 3)
    fids = jnp.pad(data.face_idxs, (0, pad)).reshape(n_chunks, chunk)

    @jax.jit
    def run(dirs, fids):
        def one(args):
            enc = view_encoder(*args)
            enc = jnp.pad(enc, ((0, 0), (0, venc_pad - enc.shape[1])))
            return enc if dtype is None else enc.astype(dtype)

        return lax.map(one, (dirs, fids))

    vencs = run(dirs, fids).reshape(-1, venc_pad)[:n]
    return RayData(
        features=data.features,
        feature_strategy=data.feature_strategy,
        vertex_idxs_of_hit_faces=data.vertex_idxs_of_hit_faces,
        barycentric_coords=data.barycentric_coords,
        expected_rgbs=data.expected_rgbs,
        unit_ray_dirs=data.unit_ray_dirs,
        face_idxs=data.face_idxs,
        hit_features=data.hit_features,
        hit_vencs=vencs,
    )
