"""LPIPS-JAX architecture sanity (real weights are not downloadable here;
these tests run on randomly generated weights with the correct shapes)."""
import numpy as np
import pytest

from intrinsic_neural_fields_tpu.evaluation.lpips_jax import _ALEX_CFG, LPIPS


@pytest.fixture(scope="module")
def random_lpips(tmp_path_factory):
    rng = np.random.default_rng(0)
    arrays = {}
    in_ch = 3
    for i, (out_ch, k, stride, pad, _) in enumerate(_ALEX_CFG):
        arrays[f"conv{i}_w"] = rng.normal(scale=0.05, size=(out_ch, in_ch, k, k)).astype(np.float32)
        arrays[f"conv{i}_b"] = np.zeros(out_ch, dtype=np.float32)
        arrays[f"lin{i}_w"] = np.abs(rng.normal(size=(1, out_ch, 1, 1))).astype(np.float32)
        in_ch = out_ch
    path = str(tmp_path_factory.mktemp("lpips") / "w.npz")
    np.savez(path, **arrays)
    return LPIPS(path)


def test_lpips_unavailable_by_default(tmp_path):
    assert not LPIPS(str(tmp_path / "missing.npz")).available()


def test_lpips_zero_on_identical_and_monotone_in_noise(random_lpips):
    assert random_lpips.available()
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    assert abs(random_lpips(img, img)) < 1e-6
    d_small = random_lpips(np.clip(img + rng.normal(scale=0.02, size=img.shape), 0, 1), img)
    d_large = random_lpips(np.clip(img + rng.normal(scale=0.2, size=img.shape), 0, 1), img)
    assert 0 < d_small < d_large
