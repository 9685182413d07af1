"""VGG16 perceptual/LPIPS tower: live torch parity with synthetic weights
(the pretrained files are absent from this image; the converter + forward
are validated against a torch replica built from the same state_dict)."""
import numpy as np
import jax.numpy as jnp
import pytest

from f3d_gaus_tpu.models import vgg

torch = pytest.importorskip("torch")


def _torch_vgg16_features():
    """torchvision.models.vgg16().features replica (torchvision itself is
    not installed here) — layer indices match _CONV_IDX."""
    import torch.nn as nn
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU()]
            cin = v
    return nn.Sequential(*layers)


@pytest.fixture(scope="module")
def towers():
    torch.manual_seed(0)
    net = _torch_vgg16_features()
    sd = {f"features.{k}": v for k, v in net.state_dict().items()}
    params = vgg.convert_torch_vgg16(sd)
    lin_sd = {f"lin.{i}.1.weight":
              torch.rand(1, c, 1, 1) for i, c in enumerate(vgg.N_CHANNELS)}
    lin = vgg.convert_torch_lpips_lin(lin_sd)
    return net, params, lin_sd, lin


def test_features_match_torch(towers):
    net, params, _, _ = towers
    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    taps = vgg.features(params, jnp.asarray(x))
    with torch.no_grad():
        t = torch.from_numpy(x)
        idx_from1 = {4: 0, 9: 1, 16: 2, 23: 3, 30: 4}
        got_t = {}
        for i, layer in enumerate(net, 1):
            t = layer(t)
            if i in idx_from1:
                got_t[idx_from1[i]] = t.numpy()
    for j, tap in enumerate(taps):
        np.testing.assert_allclose(np.asarray(tap), got_t[j],
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"tap {j}")


def test_lpips_matches_reference_math(towers):
    net, params, lin_sd, lin = towers
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    y = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    got = float(vgg.lpips(params, lin, jnp.asarray(x), jnp.asarray(y))[0])

    # literal torch restatement of lpips.py:33-38
    with torch.no_grad():
        def feats(a):
            t = (torch.from_numpy(a)
                 - torch.tensor([-.030, -.088, -.188])[None, :, None, None]) \
                / torch.tensor([.458, .448, .450])[None, :, None, None]
            out = []
            for i, layer in enumerate(net, 1):
                t = layer(t)
                if i in (4, 9, 16, 23, 30):
                    n = t / (t.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
                    out.append(n)
            return out
        fx, fy = feats(x), feats(y)
        want = 0.0
        for j, (a, b) in enumerate(zip(fx, fy)):
            d = (a - b) ** 2
            w = lin_sd[f"lin.{j}.1.weight"].reshape(1, -1, 1, 1)
            want += float((d * w).sum(1).mean((1, 2))[0])
    assert abs(got - want) < 1e-4 * max(abs(want), 1.0)


def test_perceptual_loss_basic(towers):
    _, params, _, _ = towers
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32))
    assert float(vgg.perceptual_loss(params, x, x)) == 0.0
    y = jnp.clip(x + 0.1, 0, 1)
    v = float(vgg.perceptual_loss(params, x, y))
    assert np.isfinite(v) and v > 0
