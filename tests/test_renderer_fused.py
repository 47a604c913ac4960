"""Fused-kernel render inference (Renderer(infer=...), round 4).

The renderer's MLP inference can run through ops/fused_mlp.make_fused_apply
instead of the chunked XLA flax apply — same coverage gate as the fused train
step. These tests pin (a) image parity between the two paths on the plain
efuncs family and the pre-embedded rff family (both paths use bf16-multiply /
f32-accumulate matmuls; only contraction order differs), (b) the eligibility
fallback behavior. On CPU the kernel runs in the pallas interpreter
(infer="fused" forces it; "auto" falls back to XLA off-TPU)."""
import numpy as np
import pytest

from intrinsic_neural_fields_tpu.geometry.primitives import icosphere
from intrinsic_neural_fields_tpu.models import init_model, make_model
from intrinsic_neural_fields_tpu.render.renderer import Renderer

from test_render_regressions import _look_at_cam, _simple_K


def _render_pair(cfg, feature_strategy="efuncs", k_feats=None, H=40, W=40,
                 seed=0):
    m = icosphere(3)
    rng = np.random.default_rng(seed)
    efuncs = None
    if feature_strategy == "efuncs":
        efuncs = rng.normal(size=(m.num_vertices, k_feats)).astype(np.float32)
    model = make_model(cfg, mesh=m)
    variables = init_model(model, cfg, mesh=m)
    kw = dict(
        eigenfunctions=efuncs, feature_strategy=feature_strategy, H=H, W=W
    )
    r_xla = Renderer(model, variables, m, infer="xla", **kw)
    r_fused = Renderer(model, variables, m, infer="fused", **kw)
    assert r_fused._fused is not None
    cam = _look_at_cam(np.array([0.4, -2.8, 0.7]))
    K = _simple_K(H, W)
    return r_xla.render(cam, K), r_fused.render(cam, K)


def test_fused_infer_matches_xla_efuncs():
    cfg = {"k": 16, "num_layers": 4, "mlp_hidden_dim": 128,
           "skip_layer_idx": 2}
    img_xla, img_fused = _render_pair(cfg, k_feats=16)
    hit = np.any(img_xla != 1.0, axis=-1)
    assert hit.any()
    # Background pixels composite identically (valid masks must agree).
    np.testing.assert_array_equal(img_xla[~hit], img_fused[~hit])
    assert np.abs(img_xla - img_fused).max() < 2e-2


@pytest.mark.slow
def test_fused_infer_matches_xla_rff_pre_embed():
    cfg = {"k": 24, "num_layers": 4, "mlp_hidden_dim": 128,
           "skip_layer_idx": 2, "feature_strategy": "rff"}
    img_xla, img_fused = _render_pair(cfg, feature_strategy="rff")
    hit = np.any(img_xla != 1.0, axis=-1)
    assert hit.any()
    np.testing.assert_array_equal(img_xla[~hit], img_fused[~hit])
    assert np.abs(img_xla - img_fused).max() < 2e-2


def test_auto_falls_back_off_tpu():
    import jax

    cfg = {"k": 16, "num_layers": 4, "mlp_hidden_dim": 128,
           "skip_layer_idx": 2}
    m = icosphere(2)
    efuncs = np.random.default_rng(0).normal(
        size=(m.num_vertices, 16)).astype(np.float32)
    model = make_model(cfg)
    variables = init_model(model, cfg)
    r = Renderer(model, variables, m, eigenfunctions=efuncs, H=16, W=16,
                 infer="auto")
    if jax.default_backend() != "tpu":
        assert r._fused is None


def test_fused_requires_eligible_model():
    # hidden 32 is not MXU-aligned -> not fused-eligible; forcing must fail.
    cfg = {"k": 16, "num_layers": 4, "mlp_hidden_dim": 32,
           "skip_layer_idx": 2}
    m = icosphere(2)
    efuncs = np.random.default_rng(0).normal(
        size=(m.num_vertices, 16)).astype(np.float32)
    model = make_model(cfg)
    variables = init_model(model, cfg)
    with pytest.raises(AssertionError):
        Renderer(model, variables, m, eigenfunctions=efuncs, H=16, W=16,
                 infer="fused")


VIEWDEP_COMMON = {"k": 16, "num_layers": 4, "mlp_hidden_dim": 128,
                  "skip_layer_idx": 2}


@pytest.mark.parametrize("strategy,in_dim", [("intrinsic", 1), ("extrinsic", 3)])
def test_fused_infer_matches_xla_viewdep(strategy, in_dim):
    """View-dependent family through the fused kernel (VERDICT r4 next #3):
    spatial core + bottleneck/view-dir concat + directional tail, parity vs
    the flax apply for both view-dir strategies."""
    cfg = dict(VIEWDEP_COMMON)
    cfg["view_dependence"] = {
        "bottleneck_vec_dim": 128,
        "include_view_dir": True,
        "embed_size": 4,
        "directional_hidden_dim": 128,
        "in_dim_view_dir": in_dim,
        "strategy": strategy,
    }
    img_xla, img_fused = _render_pair(cfg, k_feats=16)
    hit = np.any(img_xla != 1.0, axis=-1)
    assert hit.any()
    np.testing.assert_array_equal(img_xla[~hit], img_fused[~hit])
    assert np.abs(img_xla - img_fused).max() < 2e-2
