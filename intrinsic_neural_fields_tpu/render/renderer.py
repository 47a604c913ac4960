"""Full-view rendering, fully on-device.

The reference renders by tracing rays with Embree on the host, then running
model inference in 2^15-ray chunks with a host->device->host copy per chunk
(reference renderer.py:112-119). Here the whole pipeline — ray generation,
tiled intersection, feature interpolation, MLP inference — is ONE jitted
device computation over fixed-shape padded ray arrays; the host only selects
masked pixels up front and scatters the returned colors into the image.

Shapes: the number of masked pixels L is data-dependent, so rays are padded
to the next multiple of a bucket size; jit caches one executable per bucket.
"""
from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from ..geometry.cameras import DistortionTypes, undistort_pixels_meshroom_radial_k3
from ..geometry.mesh import load_mesh
from ..ops.intersect import intersect_rays
from ..ops.interpolate import interpolate_vertex_features
from ..ops.morton import face_morton_order, pixel_morton_order
from ..ops.raster import intersect_coords_pinhole_core
from ..ops.ray_gen import ray_origins_and_directions

_PAD_BUCKET = 1 << 15      # rays are padded to a multiple of this
_INFER_CHUNK = 1 << 13     # model/feature-gather chunk inside the jit
_TRACE_CACHE_MAX = 8       # LRU bound: device arrays per cached trace are
                           # ~Lpad*(3+3+3+1+1)*4B; unbounded growth over a
                           # long render_video session would accumulate HBM
_PIXEL_CACHE_MAX = 8       # LRU bound on cached per-view pixel-index bundles
                           # (device int32 [Lpad] + host scatter metadata)


class _PixelEntry(NamedTuple):
    """Per-(H, W, mask) pixel bundle — a pure function of the view's pixel
    SET, shared by every camera pose that renders it (all frames of a
    turntable/video, every TensorBoard view of an unmasked render)."""
    pix_idx: object   # [L] host int32, masked pixel ids in Morton order
    morton: object    # [L] host permutation (scatter-back order)
    L: int
    Lpad: int
    hull: object      # [2,2] f32 (cmin; cmax) pixel hull (raster tracer)
    idx_dev: object   # [Lpad] int32 committed device array


class _PendingRender(NamedTuple):
    """An in-flight render dispatched by Renderer.render_async: device arrays
    plus the host-side scatter metadata render_fetch needs to finish."""
    rgb_dev: object
    valid_dev: object
    morton: object
    L: int
    obj_mask_1d: object
    bg: float
    H: int
    W: int
    eval_render: bool


def make_renderer_with_trained_model(config, weights_name="model.ckpt", n_devices=None,
                                     wire_u8=False, tracer="raster", infer="auto"):
    """Rebuild a Renderer from a training out_dir (reference renderer.py:9-32).

    n_devices: shard every render D-way over a device mesh (see Renderer's
    mesh_devices); None = single device. wire_u8: uint8 device->host color
    transfers — for 8-bit sinks only (see Renderer). tracer: see Renderer."""
    from ..models.factory import init_model, make_model
    from ..spectral.features import load_first_k_eigenfunctions
    from ..utils.checkpoint import load_checkpoint

    mesh = load_mesh(config["data"]["mesh_path"])
    feature_strategy = config["model"].get("feature_strategy", "efuncs")

    efuncs = None
    if feature_strategy == "efuncs":
        efuncs = load_first_k_eigenfunctions(
            config["data"]["eigenfunctions_path"],
            config["model"].get("k"),
            rescale_strategy=config["data"].get("rescale_strategy", "standard"),
            embed_strategy=config["data"].get("embed_strategy"),
            eigenvalues_path=config["data"].get("eigenvalues_path"),
            ts=config["model"].get("hks_timesteps", 128),
        )

    model = make_model(config["model"], mesh=mesh)
    template = init_model(model, config["model"], mesh=mesh)
    from ..utils.checkpoint import resolve_weights_path

    weights_path = resolve_weights_path(config["training"]["out_dir"], weights_name)
    variables = load_checkpoint(weights_path, jax.device_get(template))

    mesh_devices = None
    if n_devices is not None and n_devices > 1:
        from ..parallel.data_parallel import make_device_mesh

        mesh_devices = make_device_mesh(n_devices)

    return Renderer(
        model,
        variables,
        mesh,
        eigenfunctions=efuncs,
        feature_strategy=feature_strategy,
        H=config["data"]["img_height"],
        W=config["data"]["img_width"],
        mesh_devices=mesh_devices,
        wire_u8=wire_u8,
        # Render with the same feature precision the model was trained on
        # (data.precompute_dtype: bfloat16 configs train on bf16 features);
        # bf16 also cuts the per-view feature-gather time ~20% (the TPU row
        # gather of wide f32 rows is the renderer's slowest primitive —
        # tools/profile_infer.py).
        feature_dtype=config["data"].get("precompute_dtype"),
        tracer=tracer,
        infer=infer,
    )


class Renderer:
    """Renders views of a trained texture field (reference renderer.py:35-146)."""

    def __init__(
        self,
        model,
        variables,
        mesh,
        eigenfunctions=None,
        feature_strategy="efuncs",
        background="white",
        *,
        H,
        W,
        mesh_devices=None,
        shard_axis="data",
        feature_dtype=None,
        wire_u8=False,
        tracer="raster",
        infer="auto",
    ):
        """mesh_devices: optional jax.sharding.Mesh. When given, tracing and
        inference are shard_map'd over its `shard_axis`: every padded ray
        bucket splits D ways (rays are embarrassingly parallel; geometry,
        features and weights replicate), so a full-view render runs D-way
        data-parallel over ICI (SURVEY §5 "shard the ray axis across chips").
        Per-ray math is unchanged — output is bit-equal to single-device
        (tested). _PAD_BUCKET is a multiple of any power-of-two D.

        tracer: "raster" (default) traces camera bundles with the
        projective-binning tracer (ops/raster.py — ~1.8-3x less device time
        per view than the cone tracer at cat scale); "cone" keeps the tiled
        cone-culling tracer. Hit arithmetic is identical per (ray, face);
        the paths differ only on exact-t ties (measure-zero).

        infer: "auto" (default) runs MLP inference through the fused Pallas
        forward kernel (ops/fused_mlp.make_fused_apply) on TPU whenever the
        model is fused-eligible (plain TextureField, incl. the pre-embedded
        xyz/ff/rff families via mlp_core_view — the same coverage as the
        fused train step), falling back to the XLA path otherwise; "fused"
        forces the kernel (pallas interpreter on CPU — for tests); "xla"
        keeps the flax apply. Both paths run the same bf16-multiply /
        f32-accumulate matmuls; outputs differ only by contraction order
        (quality-neutral, see tests/test_renderer_fused.py)."""
        assert tracer in ("raster", "cone"), tracer
        assert infer in ("auto", "fused", "xla"), infer
        self._tracer = tracer
        self._mesh = mesh_devices
        self._axis = shard_axis
        if mesh_devices is not None:
            D = int(np.prod(mesh_devices.devices.shape))
            assert _PAD_BUCKET % D == 0, (D, _PAD_BUCKET)
        self.model = model
        # Committed to device once: a host (numpy) pytree here — e.g. from
        # make_renderer_with_trained_model's checkpoint load — would ride
        # the host->device wire on EVERY jitted dispatch (multi-MB per
        # frame on the tunneled chip, dwarfing the cached pixel uploads).
        self.variables = self._commit_replicated(variables)
        self.mesh = mesh
        self.feature_strategy = feature_strategy
        # wire_u8: ship rendered colors device->host as uint8 instead of
        # f16. Bit-identical FINAL output for 8-bit image sinks (render_video
        # frames, PNGs) since they quantize to the same grid; keep False for
        # eval, whose metrics are computed on float images (reference
        # eval.py:171-176).
        self._wire_u8 = bool(wire_u8)
        # feature_dtype: storage dtype of the feature table ("bfloat16" to
        # match a precompute_dtype:bfloat16 training run; None = float32,
        # the reference-parity default). Interpolation stays f32.
        self._feature_dtype = (
            jnp.bfloat16 if feature_dtype in ("bfloat16", jnp.bfloat16)
            else jnp.float32
        )
        if feature_strategy == "efuncs":
            assert eigenfunctions is not None
            self.features = jnp.asarray(eigenfunctions, self._feature_dtype)
        elif feature_strategy in ("ff", "rff", "xyz"):
            self.features = jnp.asarray(mesh.vertices, jnp.float32)
        else:
            raise ValueError(f"Unknown feature strategy: {feature_strategy}")
        self.H = H
        self.W = W
        self.background = background
        # Pixel-index / undistorted-coords bundles are pure functions of
        # (H, W, mask[, K, coeffs]) — NOT of geometry or camera pose — so
        # they live outside the per-geometry trace cache and survive
        # variables/eigenfunction swaps. See _pixels_for_view.
        self._pixel_cache = OrderedDict()
        self._coords_cache = OrderedDict()
        self._infer_mode = infer
        self._fused = self._resolve_fused_infer(infer)
        self._refresh_geometry()

    def _resolve_fused_infer(self, infer):
        """Resolve the `infer` mode to (spec, tail, apply_fn, pre_embed,
        view_fn) or None.

        pre_embed: True when the interpolated features are hit POSITIONS that
        must run through the model's fixed input encoding before the MLP
        core (the mlp_core_view transformation the fused train step uses).
        tail/view_fn: set for the view-dependent family — the directional
        ViewDepTailSpec and the fixed (dirs, face_idxs) -> encoding function
        (models/texture_field.view_encoder_apply) evaluated outside the
        kernel."""
        if infer == "xla":
            return None
        if infer == "auto" and jax.default_backend() != "tpu":
            return None  # pallas interpret on CPU is correctness-only
        from ..train.steps import (
            fused_mlp_eligible,
            fused_pre_embed_eligible,
            fused_viewdep_eligible,
        )

        viewdep = fused_viewdep_eligible(self.model)
        spatial_eligible = viewdep or fused_mlp_eligible(self.model)
        pre_embed_ok = (
            fused_pre_embed_eligible(self.model)
            or (viewdep
                and getattr(self.model, "input_feature_embed", None)
                in ("xyz", "ff"))  # rff buffers live under spatial_mlp scope
        )
        if self.feature_strategy == "efuncs" and spatial_eligible:
            k_in = int(self.features.shape[1])
            pre_embed = False
        elif self.feature_strategy in ("xyz", "ff", "rff") and pre_embed_ok:
            from ..models.texture_field import input_encoder_apply

            enc = input_encoder_apply(self.model, self.variables)
            k_in = int(
                jax.eval_shape(
                    enc, jax.ShapeDtypeStruct((1, 3), jnp.float32)
                ).shape[1]
            )
            pre_embed = True
        else:
            assert infer != "fused", (
                "infer='fused' requires a fused-eligible TextureField "
                "(train/steps.fused_mlp_eligible / fused_pre_embed_eligible "
                "/ fused_viewdep_eligible)"
            )
            return None
        from ..ops.fused_mlp import (
            FusedMLPSpec,
            ViewDepTailSpec,
            make_fused_apply,
            make_fused_apply_viewdep,
        )

        spec = FusedMLPSpec(
            num_layers=self.model.num_layers,
            k_in=k_in,
            hidden=self.model.hidden_dim,
            skip_idx=self.model.skip_layer_idx,
            out_dim=(self.model.bottleneck_vec_dim if viewdep else 3),
        )
        tail = None
        view_fn = None
        if viewdep:
            from ..models.texture_field import view_encoder_apply

            view_fn = view_encoder_apply(self.model)
            venc_in = int(
                jax.eval_shape(
                    view_fn,
                    jax.ShapeDtypeStruct((1, 3), jnp.float32),
                    jax.ShapeDtypeStruct((1,), jnp.int32),
                ).shape[1]
            )
            tail = ViewDepTailSpec(
                venc_in=venc_in,
                d_hidden=self.model.directional_hidden_dim,
            )
        # VMEM-budgeted tile (VERDICT r4 weak #8): _pick_fused_tile models
        # the heavier TRAINING working set (grad accumulators, saved
        # activations), so its choice is strictly safe for the forward-only
        # inference kernel and shrinks automatically for wide feature tables.
        # The tail is passed for the view-dependent family so the budget
        # also covers the venc tiles and directional-head weights.
        from ..train.steps import _pick_fused_tile

        tile = _pick_fused_tile(spec, _INFER_CHUNK, x_bytes=4, tail=tail)
        if tile >= _INFER_CHUNK:
            # fallback value: no tile fit the VMEM budget (very wide k) —
            # keep the XLA inference path instead of risking a Mosaic OOM
            assert infer != "fused", (
                f"infer='fused': k_in={k_in} busts the fused kernel's VMEM "
                "budget at every tile size; use the XLA path"
            )
            return None
        batch_tile = min(1024, tile)
        assert _INFER_CHUNK % batch_tile == 0
        if viewdep:
            apply_fn = make_fused_apply_viewdep(spec, tail, batch_tile=batch_tile)
            return spec, tail, apply_fn, pre_embed, view_fn
        return spec, None, make_fused_apply(spec, batch_tile=batch_tile), pre_embed, None

    def _refresh_geometry(self):
        # Intrinsic view-dependent models snapshot face normals into the
        # flax module (models/factory.py) and the fused view_fn closes over
        # them — after a mesh transform/swap both would silently keep the
        # STALE normals and every view angle (hence every color) would be
        # wrong. Rebuild them whenever the mesh's normals changed.
        if getattr(self.model, "view_dir_strategy", None) == "intrinsic":
            fresh = np.asarray(self.mesh.face_normals, np.float32)
            if not np.array_equal(fresh, np.asarray(self.model.face_normals)):
                self.model = self.model.clone(face_normals=fresh)
                self._fused = self._resolve_fused_infer(self._infer_mode)
        self._verts = jnp.asarray(self.mesh.vertices, jnp.float32)
        # Faces sorted spatially (Morton) so the tracer's tile culling bites;
        # _face_orig_ids maps sorted hit ids back to original mesh face ids
        # (needed for face-normal lookups in view-dependent models).
        order = face_morton_order(self.mesh.vertices, self.mesh.faces)
        self._faces_sorted = jnp.asarray(self.mesh.faces[order])
        self._face_orig_ids = jnp.asarray(order.astype(np.int32))
        if self._tracer == "raster":
            # W/H are static for the raster tracer (they size its screen-tile
            # grid), so the trace callables close over them and are rebuilt
            # by set_height/set_width (which call _refresh_geometry).
            trace_idx, trace_coords = (
                self._trace_from_indices_raster, self._trace_from_coords_raster
            )
        else:
            trace_idx, trace_coords = (
                self._trace_from_indices, self._trace_from_coords
            )
        if self._mesh is None:
            self._trace_idx = jax.jit(trace_idx)
            self._trace_coords = jax.jit(trace_coords)
            self._infer = jax.jit(self._infer_impl)
        else:
            Pd = P(self._axis)
            self._trace_idx = jax.jit(shard_map(
                trace_idx, mesh=self._mesh,
                in_specs=(Pd, P(), P(), P()), out_specs=(Pd,) * 5,
                check_vma=False,
            ))
            self._trace_coords = jax.jit(shard_map(
                trace_coords, mesh=self._mesh,
                in_specs=(Pd, P(), P()) + ((P(),) if self._tracer == "raster" else ()),
                out_specs=(Pd,) * 5,
                check_vma=False,
            ))
            self._infer = jax.jit(shard_map(
                self._infer_impl, mesh=self._mesh,
                in_specs=(P(), P(), (Pd,) * 5, P()), out_specs=(Pd, Pd),
                check_vma=False,
            ))
        # Geometry-dependent per-view trace cache, LRU-bounded and keyed on
        # (cache_key, H, W) so a resolution change can never serve a stale
        # trace even without the explicit clears (see render(cache_key=...)).
        self._trace_cache = OrderedDict()

    def set_height(self, height):
        self.H = height
        self._trace_cache.clear()  # cached traces are resolution-dependent
        self._pixel_cache.clear()  # keys include (H, W) — clear to free HBM
        self._coords_cache.clear()
        self._refresh_geometry()   # raster tile grid is sized by (H, W)

    def set_width(self, width):
        self.W = width
        self._trace_cache.clear()
        self._pixel_cache.clear()
        self._coords_cache.clear()
        self._refresh_geometry()

    def _commit_rays(self, arr):
        """Host ray-axis array -> committed device array (sharded over the
        device mesh's ray axis when rendering D-way)."""
        if self._mesh is None:
            return jax.device_put(arr)
        return jax.device_put(
            arr, jax.sharding.NamedSharding(self._mesh, P(self._axis))
        )

    def _pixels_for_view(self, obj_mask_1d):
        """LRU-cached per-view pixel bundle (see _PixelEntry).

        The Morton-ordered pixel-index array is identical for every frame of
        a video/turntable (and for every unmasked render at a given H, W),
        yet it used to ride the host->device wire on EVERY dispatch — ~1 MB
        of int32 per 512^2 frame, comparable to the whole color downlink on
        the tunneled chip. Caching the committed device array makes repeated
        views ship only the 4x4 camera matrix and 3x3 K."""
        H, W = self.H, self.W
        if obj_mask_1d is not None:
            key = (H, W, hashlib.blake2b(
                np.packbits(obj_mask_1d).tobytes(), digest_size=16).digest())
        else:
            key = (H, W, None)
        entry = self._pixel_cache.get(key)
        if entry is not None:
            self._pixel_cache.move_to_end(key)
            return key, entry
        if obj_mask_1d is not None:
            pix_idx = np.nonzero(obj_mask_1d)[0].astype(np.int32)
        else:
            pix_idx = np.arange(H * W, dtype=np.int32)
        L = pix_idx.shape[0]
        assert L > 0
        # Z-order the pixels so each tracer ray-tile is a compact image block
        # (tight bounding cone -> effective tile culling).
        xy = np.stack([pix_idx % W, pix_idx // W], axis=-1)
        morton = pixel_morton_order(xy)
        pix_idx = pix_idx[morton]
        hull = np.stack([xy.min(0), xy.max(0)]).astype(np.float32)
        Lpad = -(-L // _PAD_BUCKET) * _PAD_BUCKET
        idx_dev = self._commit_rays(np.pad(pix_idx, (0, Lpad - L), mode="edge"))
        entry = _PixelEntry(pix_idx=pix_idx, morton=morton, L=L, Lpad=Lpad,
                            hull=hull, idx_dev=idx_dev)
        self._pixel_cache[key] = entry
        while len(self._pixel_cache) > _PIXEL_CACHE_MAX:
            self._pixel_cache.popitem(last=False)
        return key, entry

    def _coords_for_view(self, pix_key, px, K, distortion_coeffs):
        """LRU-cached undistorted pixel coordinates (committed) + their hull.

        Undistortion is a pure function of (pixel set, K, coeffs) — camera
        POSE does not enter — so a Meshroom video/eval sweep with one
        intrinsic block undistorts and uploads once."""
        key = (pix_key, np.asarray(K, np.float64).tobytes(),
               np.asarray(distortion_coeffs, np.float64).tobytes())
        hit = self._coords_cache.get(key)
        if hit is not None:
            self._coords_cache.move_to_end(key)
            return hit
        pix_idx_pad = np.pad(px.pix_idx, (0, px.Lpad - px.L), mode="edge")
        coords = np.stack(
            [pix_idx_pad % self.W, pix_idx_pad // self.W], axis=-1
        ).astype(np.float64)
        coords = undistort_pixels_meshroom_radial_k3(coords, K, distortion_coeffs)
        coords = coords.astype(np.float32)
        hull = np.stack([coords[: px.L].min(0), coords[: px.L].max(0)])
        entry = (self._commit_rays(coords), hull)
        self._coords_cache[key] = entry
        while len(self._coords_cache) > _PIXEL_CACHE_MAX:
            self._coords_cache.popitem(last=False)
        return entry

    def apply_mesh_transform(self, transform):
        self.mesh.apply_transform(transform)
        if self.feature_strategy in ("ff", "rff", "xyz"):
            self.features = jnp.asarray(self.mesh.vertices, jnp.float32)
        self._refresh_geometry()

    def _commit_replicated(self, tree):
        """Host pytree -> device-resident (replicated over the render mesh);
        a no-op view for leaves that already live on device."""
        if self._mesh is None:
            return jax.device_put(tree)
        return jax.device_put(
            tree, jax.sharding.NamedSharding(self._mesh, P())
        )

    def update_variables(self, variables):
        """Point the renderer at new weights (no recompile: same structure)."""
        self.variables = self._commit_replicated(variables)

    def set_eigenfunctions(self, eigenfunctions):
        """Swap the eigenbasis (texture transfer / discretization change)."""
        assert self.feature_strategy == "efuncs"
        self.features = jnp.asarray(eigenfunctions, self._feature_dtype)

    def _rays_from_indices(self, pix_idx, camCv2world, K, width):
        """Pixel indices -> rays on device (halves the host->device traffic
        vs shipping float coords; ray gen is traced anyway). width is a
        traced argument — reading self.W here would bake the construction-time
        value into the jitted executable and survive set_width()."""
        x = (pix_idx % width).astype(jnp.float32)
        y = (pix_idx // width).astype(jnp.float32)
        coords = jnp.stack([x, y], axis=-1)
        return ray_origins_and_directions(camCv2world, K, coords)

    def _trace_from_indices(self, pix_idx, camCv2world, K, width):
        origins, dirs = self._rays_from_indices(pix_idx, camCv2world, K, width)
        return self._trace_impl(origins, dirs)

    def _trace_from_coords(self, coords, camCv2world, K):
        """Explicit (possibly undistorted) pixel coordinates."""
        origins, dirs = ray_origins_and_directions(camCv2world, K, coords)
        return self._trace_impl(origins, dirs)

    def _trace_from_indices_raster(self, pix_idx, camCv2world, K, coord_hull):
        """Raster-tracer twin of _trace_from_indices. coord_hull is the FULL
        view's [2,2] (cmin; cmax) pixel hull, computed host-side once per
        view: under shard_map each device sees only its ray shard, and a
        per-shard hull would make the binning tables (hence exact-t
        tie-breaks) differ between sharded and single-device renders."""
        W = self.W  # static: raster's tile grid is sized by (H, W)
        x = (pix_idx % W).astype(jnp.float32)
        y = (pix_idx // W).astype(jnp.float32)
        coords = jnp.stack([x, y], axis=-1)
        return self._trace_impl_raster(coords, camCv2world, K, coord_hull)

    def _trace_from_coords_raster(self, coords, camCv2world, K, coord_hull):
        return self._trace_impl_raster(coords, camCv2world, K, coord_hull)

    def _trace_impl_raster(self, coords, camCv2world, K, coord_hull):
        hits, dirs = intersect_coords_pinhole_core(
            self._verts, self._faces_sorted, camCv2world, K, coords,
            W=self.W, H=self.H, coord_hull=coord_hull, return_dirs=True,
        )
        safe_face_sorted = jnp.where(hits.valid, hits.face_idx, 0)
        vids = jnp.take(self._faces_sorted, safe_face_sorted, axis=0)
        safe_face = jnp.take(self._face_orig_ids, safe_face_sorted)
        return vids, hits.bary, dirs, safe_face, hits.valid

    def _trace_impl(self, origins, dirs):
        """[Lpad,3] rays -> per-ray hit records (device arrays)."""
        # shared_origin: every ray of a view starts at the camera center
        # (ray_origins_and_directions broadcasts it), which hoists the
        # origin-side contractions out of the rays x faces loop — measured
        # ~35% faster full-view trace (tools/sweep_tracer_tiles.py).
        hits = intersect_rays(
            self._verts, self._faces_sorted, origins, dirs, shared_origin=True
        )
        safe_face_sorted = jnp.where(hits.valid, hits.face_idx, 0)
        vids = jnp.take(self._faces_sorted, safe_face_sorted, axis=0)
        # map back to original face ids for downstream normal lookups
        safe_face = jnp.take(self._face_orig_ids, safe_face_sorted)
        return vids, hits.bary, dirs, safe_face, hits.valid

    def _infer_impl(self, variables, features, trace, bg):
        """Hit records -> ([Lpad,3] bg-composited rgb f16, [Lpad] valid).

        bg is a traced scalar (not read from self at trace time): eval_cli
        mutates renderer.background after construction, which must not be
        baked into the cached executable."""
        vids, bary, dirs, safe_face, valid = trace
        Lpad = vids.shape[0]
        n_chunks = -(-Lpad // _INFER_CHUNK)
        pad = n_chunks * _INFER_CHUNK - Lpad

        def pad0(x):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)

        chunked = jax.tree_util.tree_map(
            lambda x: pad0(x).reshape(n_chunks, _INFER_CHUNK, *x.shape[1:]),
            (vids, bary, dirs, safe_face),
        )

        if self._fused is not None:
            spec, tail, fused_apply, pre_embed, view_fn = self._fused
            encode = None
            if pre_embed:
                from ..models.texture_field import input_encoder_apply

                encode = input_encoder_apply(self.model, variables)
            from ..ops.fused_mlp import params_to_list, viewdep_params_to_list

            if tail is None:
                wb = params_to_list(spec, variables["params"])
            else:
                wb = viewdep_params_to_list(spec, tail, variables["params"])

            def infer(args):
                c_vids, c_bary, c_dirs, c_face = args
                feats = interpolate_vertex_features(features, c_vids, c_bary)
                x = encode(feats) if encode is not None else feats
                x = jnp.pad(
                    x.astype(jnp.float32),
                    ((0, 0), (0, spec.k_pad - x.shape[1])),
                )
                if tail is None:
                    return fused_apply(wb, x)
                venc = view_fn(c_dirs, c_face).astype(jnp.float32)
                venc = jnp.pad(
                    venc, ((0, 0), (0, tail.venc_pad - venc.shape[1]))
                )
                return fused_apply(wb, x, venc)

        else:

            def infer(args):
                c_vids, c_bary, c_dirs, c_face = args
                feats = interpolate_vertex_features(features, c_vids, c_bary)
                batch = {"unit_ray_dirs": c_dirs, "hit_face_idxs": c_face}
                if self.feature_strategy == "efuncs":
                    batch["eigenfunctions"] = feats
                else:
                    batch["xyz"] = feats
                return self.model.apply(variables, batch)

        preds = lax.map(infer, chunked).reshape(-1, 3)[:Lpad]
        # Composite the background on device: the wire then carries ONE
        # ready-to-scatter rgb array instead of preds + a separate valid
        # fetch (the axon tunnel charges per byte and per round trip; the
        # measured host+wire share of a cached 512^2 render was ~200 ms —
        # larger than trace or inference). f16 on the wire: quantization is
        # ~5e-4 in [0,1] rgb, far below the 8-bit image grid.
        rgb = jnp.where(valid[:, None], preds.astype(jnp.float16), bg.astype(jnp.float16))
        if self._wire_u8:
            rgb = jnp.round(
                jnp.clip(rgb.astype(jnp.float32), 0.0, 1.0) * 255.0
            ).astype(jnp.uint8)
        return rgb, valid

    def render(
        self,
        camCv2world,
        K,
        obj_mask_1d=None,
        eval_render=False,
        distortion_coeffs=None,
        distortion_type=None,
        cache_key=None,
    ):
        """Render one view. Returns an [H,W,3] float32 numpy image, or
        (image, hit_ray_idxs) when eval_render=True (reference renderer.py:64-146).
        hit_ray_idxs indexes the masked-pixel array (all pixels if no mask).

        cache_key: optional hashable identifying this (camera, mask) view —
        the ray trace is geometry-only and gets reused across renders of the
        same view (e.g. the trainer's TensorBoard views each epoch); only the
        model inference reruns. The cache is invalidated on geometry changes.
        """
        return self.render_fetch(
            self.render_async(
                camCv2world, K, obj_mask_1d=obj_mask_1d,
                eval_render=eval_render, distortion_coeffs=distortion_coeffs,
                distortion_type=distortion_type, cache_key=cache_key,
            )
        )

    def render_async(
        self,
        camCv2world,
        K,
        obj_mask_1d=None,
        eval_render=False,
        distortion_coeffs=None,
        distortion_type=None,
        cache_key=None,
    ):
        """Dispatch one view's render and return a pending handle WITHOUT
        waiting for the device or the wire. `render_fetch(handle)` completes
        it. JAX dispatch is asynchronous, so a caller that dispatches view
        i+1 before fetching view i overlaps view i's device->host transfer
        (the dominant cost on a tunneled chip — RESULTS.md) with view i+1's
        on-device trace+inference. render() == render_fetch(render_async()).
        """
        H, W = self.H, self.W
        assert self.background in ("white", "black")
        bg = 1.0 if self.background == "white" else 0.0
        if obj_mask_1d is not None:
            obj_mask_1d = np.asarray(obj_mask_1d).reshape(-1)
            assert obj_mask_1d.shape[0] == H * W
            if not obj_mask_1d.any():
                # Empty object mask (fully occluded / out-of-frame view):
                # trivially an all-background image — nothing to trace.
                return _PendingRender(
                    rgb_dev=np.zeros((0, 3), np.float32),
                    valid_dev=np.zeros((0,), bool),
                    morton=np.zeros(0, np.int64), L=0,
                    obj_mask_1d=obj_mask_1d, bg=bg, H=H, W=W,
                    eval_render=eval_render,
                )
        pix_key, px = self._pixels_for_view(obj_mask_1d)
        L, morton = px.L, px.morton

        full_key = None if cache_key is None else (cache_key, H, W)
        trace = None
        if full_key is not None and full_key in self._trace_cache:
            cached_pix, trace = self._trace_cache[full_key]
            if cached_pix != pix_key:
                # Same cache_key, different pixel mask: reusing the stale
                # trace would silently scatter mismatched colors.
                raise ValueError(
                    f"render cache_key {cache_key!r} reused with a "
                    "different object mask/resolution bundle — use a new "
                    "cache_key per distinct view selection"
                )
            self._trace_cache.move_to_end(full_key)
        if trace is None:
            raster = self._tracer == "raster"
            if distortion_type is not None:
                assert distortion_coeffs is not None
                if distortion_type != DistortionTypes.MESHROOM_RADIAL_K3:
                    raise ValueError(f"Unknown distortion type: {distortion_type}")
                coords_dev, hull = self._coords_for_view(
                    pix_key, px, K, distortion_coeffs
                )
                args = (
                    coords_dev,
                    np.asarray(camCv2world, np.float32), np.asarray(K, np.float32),
                )
                if raster:
                    args += (hull,)
                trace = self._trace_coords(*args)
            else:
                # Full-view pixel hull, host-side (see
                # _trace_from_indices_raster for why not per-shard).
                last = px.hull if raster else np.int32(W)
                trace = self._trace_idx(
                    px.idx_dev,
                    np.asarray(camCv2world, np.float32), np.asarray(K, np.float32),
                    last,
                )
            if full_key is not None:
                # Stored with its pixel-bundle key so a cache_key reused
                # with a different mask fails loudly on hit (see above).
                self._trace_cache[full_key] = (pix_key, trace)
                while len(self._trace_cache) > _TRACE_CACHE_MAX:
                    self._trace_cache.popitem(last=False)

        rgb_dev, valid_dev = self._infer(
            self.variables, self.features, trace, jnp.float32(bg)
        )
        return _PendingRender(
            rgb_dev=rgb_dev, valid_dev=valid_dev, morton=morton, L=L,
            obj_mask_1d=obj_mask_1d, bg=bg, H=H, W=W, eval_render=eval_render,
        )

    def render_fetch(self, pending):
        """Complete a render_async dispatch: ONE device->host fetch (the rgb
        already carries the background; valid rides along only when the
        caller needs hit indices), then the host scatter."""
        L, morton, H, W, bg = (
            pending.L, pending.morton, pending.H, pending.W, pending.bg
        )
        if pending.eval_render:
            rgb_m, valid_m = jax.device_get(
                (pending.rgb_dev[:L], pending.valid_dev[:L])
            )
            valid = np.empty_like(valid_m)
            valid[morton] = valid_m
        else:
            rgb_m = jax.device_get(pending.rgb_dev[:L])
        if rgb_m.dtype == np.uint8:
            rgb_m = rgb_m.astype(np.float32) / 255.0
        img_masked = np.empty((L, 3), dtype=np.float32)
        img_masked[morton] = np.float32(rgb_m)

        if pending.obj_mask_1d is not None:
            img = np.full((H * W, 3), bg, dtype=np.float32)
            img[pending.obj_mask_1d] = img_masked
        else:
            img = img_masked

        img = img.reshape(H, W, 3)
        if pending.eval_render:
            return img, np.nonzero(valid)[0]
        return img
