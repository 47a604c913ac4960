"""LPIPS-JAX validation.

Real (ImageNet-trained) weights are not downloadable in this environment, but
the *port's correctness* is pinned here anyway: a torch-side twin of the LPIPS
graph — built exactly like the upstream `lpips` package (torchvision AlexNet
`features` Sequential sliced at the five ReLU taps, ScalingLayer, 1x1
NetLinLayer convs, normalize_tensor with eps outside the sqrt, spatial
average, sum over stages; richzhang/PerceptualSimilarity lpips/__init__.py +
lpips/pretrained_networks.py) — is loaded with the SAME random weights as the
JAX port and must agree to ~1e-5 across image sizes. Any pad/stride/pool/
normalization slip in the port breaks this parity.
"""
import numpy as np
import pytest

from intrinsic_neural_fields_tpu.evaluation.lpips_jax import _ALEX_CFG, LPIPS


def _random_weight_arrays(seed=0):
    rng = np.random.default_rng(seed)
    arrays = {}
    in_ch = 3
    for i, (out_ch, k, stride, pad, _) in enumerate(_ALEX_CFG):
        arrays[f"conv{i}_w"] = rng.normal(scale=0.05, size=(out_ch, in_ch, k, k)).astype(np.float32)
        arrays[f"conv{i}_b"] = rng.normal(scale=0.02, size=out_ch).astype(np.float32)
        arrays[f"lin{i}_w"] = np.abs(rng.normal(size=(1, out_ch, 1, 1))).astype(np.float32)
        in_ch = out_ch
    return arrays


@pytest.fixture(scope="module")
def random_weights():
    return _random_weight_arrays()


@pytest.fixture(scope="module")
def random_lpips(tmp_path_factory, random_weights):
    path = str(tmp_path_factory.mktemp("lpips") / "w.npz")
    np.savez(path, **random_weights)
    return LPIPS(path)


def _torch_lpips_twin(weights):
    """The upstream `lpips` package's alex graph rebuilt from torch.nn alone.

    Structure mirrors lpips/pretrained_networks.py (torchvision
    alexnet().features sliced [0:2][2:5][5:8][8:10][10:12]) and
    lpips/__init__.py (ScalingLayer, normalize_tensor eps=1e-10 outside the
    sqrt, NetLinLayer = 1x1 Conv2d(ch,1,bias=False), spatial_average, sum) —
    deliberately NOT a mirror of the JAX port's loop so the two
    implementations are structurally independent.
    """
    import torch
    from torch import nn

    features = nn.Sequential(
        nn.Conv2d(3, 64, kernel_size=11, stride=4, padding=2), nn.ReLU(inplace=True),
        nn.MaxPool2d(kernel_size=3, stride=2),
        nn.Conv2d(64, 192, kernel_size=5, padding=2), nn.ReLU(inplace=True),
        nn.MaxPool2d(kernel_size=3, stride=2),
        nn.Conv2d(192, 384, kernel_size=3, padding=1), nn.ReLU(inplace=True),
        nn.Conv2d(384, 256, kernel_size=3, padding=1), nn.ReLU(inplace=True),
        nn.Conv2d(256, 256, kernel_size=3, padding=1), nn.ReLU(inplace=True),
        nn.MaxPool2d(kernel_size=3, stride=2),
    )
    convs = [m for m in features if isinstance(m, nn.Conv2d)]
    lins = []
    with torch.no_grad():
        for i, conv in enumerate(convs):
            conv.weight.copy_(torch.from_numpy(weights[f"conv{i}_w"]))
            conv.bias.copy_(torch.from_numpy(weights[f"conv{i}_b"]))
            lin = nn.Conv2d(conv.out_channels, 1, 1, bias=False)
            lin.weight.copy_(torch.from_numpy(weights[f"lin{i}_w"]).reshape(1, -1, 1, 1))
            lins.append(lin)
    slices = [features[0:2], features[2:5], features[5:8], features[8:10], features[10:12]]
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def normalize_tensor(in_feat, eps=1e-10):
        norm_factor = torch.sqrt(torch.sum(in_feat ** 2, dim=1, keepdim=True))
        return in_feat / (norm_factor + eps)

    @torch.no_grad()
    def fn(fake_img, real_img):
        to_t = lambda im: torch.from_numpy(np.asarray(im, np.float32)).permute(2, 0, 1)[None]
        in0, in1 = (to_t(fake_img) - shift) / scale, (to_t(real_img) - shift) / scale
        val = torch.zeros(())
        h0, h1 = in0, in1
        for sl, lin in zip(slices, lins):
            h0, h1 = sl(h0), sl(h1)
            diff = (normalize_tensor(h0) - normalize_tensor(h1)) ** 2
            val = val + lin(diff).mean(dim=(2, 3), keepdim=True).squeeze()
        return float(val)

    return fn


@pytest.mark.parametrize("hw", [(64, 64), (127, 131), (224, 224)])
def test_lpips_matches_torch_twin(random_lpips, random_weights, hw):
    torch_fn = _torch_lpips_twin(random_weights)
    rng = np.random.default_rng(42)
    H, W = hw
    for _ in range(2):
        fake = rng.uniform(size=(H, W, 3)).astype(np.float32)
        real = np.clip(fake + rng.normal(scale=0.1, size=fake.shape), 0, 1).astype(np.float32)
        d_jax = random_lpips(fake, real)
        d_torch = torch_fn(fake, real)
        assert abs(d_jax - d_torch) <= 1e-5 * max(1.0, abs(d_torch)), (d_jax, d_torch)


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
