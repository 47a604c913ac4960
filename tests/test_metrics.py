import numpy as np

from intrinsic_neural_fields_tpu.evaluation.metrics import (
    dssim,
    epoch_psnr,
    psnr,
    structural_similarity,
)
from intrinsic_neural_fields_tpu.train.losses import elementwise_loss, get_loss_fn


def test_psnr_basics():
    img = np.random.default_rng(0).uniform(size=(16, 16, 3))
    assert psnr(img, img) == float("inf")
    noisy = np.clip(img + 0.1, 0, 1)
    p = psnr(noisy, img)
    assert 15 < p < 25

    mask = np.zeros(16 * 16, dtype=bool)
    mask[:10] = True
    img2 = img.copy().reshape(-1, 3)
    img2[10:] = 0.0  # corrupt unmasked pixels only
    img2 = img2.reshape(16, 16, 3)
    assert psnr(img2, img, mask) == float("inf")


def test_epoch_psnr():
    np.testing.assert_allclose(epoch_psnr(0.01), 20.0)


def test_ssim_self_and_symmetry():
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(32, 32, 3))
    b = np.clip(a + rng.normal(scale=0.05, size=a.shape), 0, 1)
    s_aa = structural_similarity(a, a)
    assert abs(s_aa - 1.0) < 1e-10
    s_ab = structural_similarity(a, b)
    s_ba = structural_similarity(b, a)
    assert 0 < s_ab < 1
    np.testing.assert_allclose(s_ab, s_ba, atol=1e-12)
    d = dssim(a, b)
    np.testing.assert_allclose(d, (1 - s_ab) / 2)


def test_ssim_monotone_in_noise():
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(48, 48, 3))
    vals = []
    for scale in (0.01, 0.05, 0.2):
        b = np.clip(a + rng.normal(scale=scale, size=a.shape), 0, 1)
        vals.append(structural_similarity(a, b))
    assert vals[0] > vals[1] > vals[2]


def test_losses():
    import jax.numpy as jnp

    pred = jnp.asarray([[0.5, 0.5, 0.5]])
    gt = jnp.asarray([[0.0, 1.0, 0.5]])
    np.testing.assert_allclose(float(get_loss_fn("L1")(pred, gt)), 1.0 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(float(get_loss_fn("L2")(pred, gt)), 0.5 / 3.0, rtol=1e-6)
    c2 = (20 / 255) ** 2
    expected = c2 * np.log1p(0.25 / c2) * 2 / 3
    np.testing.assert_allclose(float(get_loss_fn("cauchy")(pred, gt)), expected, rtol=1e-4)
    elem = elementwise_loss("L1")(pred, gt)
    assert elem.shape == (1, 3)


def test_ssim_matches_skimage_formula_on_constant_shift():
    # For a constant luminance shift, SSIM has a closed form:
    # l = (2 mu (mu+d) + C1) / (mu^2 + (mu+d)^2 + C1); contrast/structure = 1.
    mu, d = 0.5, 0.1
    a = np.full((64, 64, 3), mu)
    b = np.full((64, 64, 3), mu + d)
    C1 = (0.01 * 2.0) ** 2  # data_range=2.0 float default, as the reference uses
    expected = (2 * mu * (mu + d) + C1) / (mu ** 2 + (mu + d) ** 2 + C1)
    np.testing.assert_allclose(structural_similarity(a, b), expected, rtol=1e-10)
