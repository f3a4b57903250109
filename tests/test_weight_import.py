"""Metric-weight import converters (scripts/import_inception_weights.py).

Validates the exact path the reference FID/LPIPS protocols would take the
day a standard `pt_inception-2015-12-05` / vgg16+lpips checkpoint file
lands in this zero-egress environment: export the torch mirrors from
tests/test_torch_crossval.py (whose attribute names match the real
checkpoint key layout) through the converter and assert feature/distance
equality against the flax evaluators (r3 verdict item 6)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import test_torch_crossval as tc  # noqa: E402  (torch mirrors)

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/scripts")
import import_inception_weights as iw  # noqa: E402

# end-to-end / multiprocess module: excluded from the fast lane (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _randomize_torch_inception(tmodel, seed=0):
    """Random conv weights + NON-TRIVIAL bn (gamma incl. negative channels,
    random stats) so the gamma-fold and stats mapping are actually
    exercised (fresh init is gamma=1/mean=0/var=1 — near-identity)."""
    g = torch.Generator().manual_seed(seed)
    for mod in tmodel.modules():
        if isinstance(mod, torch.nn.Conv2d):
            torch.nn.init.normal_(mod.weight, 0.0, 0.05, generator=g)
        elif isinstance(mod, torch.nn.BatchNorm2d):
            n = mod.weight.numel()
            gamma = 0.5 + torch.rand(n, generator=g)
            flip = torch.rand(n, generator=g) < 0.25
            mod.weight.data = torch.where(flip, -gamma, gamma)
            mod.bias.data = 0.1 * torch.randn(n, generator=g)
            mod.running_mean.data = 0.1 * torch.randn(n, generator=g)
            mod.running_var.data = 0.9 + torch.rand(n, generator=g)


def test_inception_checkpoint_import_feature_parity(tmp_path):
    tmodel = tc.TInceptionV3Features().eval()
    _randomize_torch_inception(tmodel)
    sd = {k: v for k, v in tmodel.state_dict().items()}
    # the real pt_inception file also carries heads the converter must skip
    sd["fc.weight"] = torch.zeros(1008, 2048)
    sd["fc.bias"] = torch.zeros(1008)
    sd["AuxLogits.conv0.conv.weight"] = torch.zeros(128, 768, 1, 1)
    npz = iw.convert_inception(
        {k: v.numpy() for k, v in sd.items()})
    path = str(tmp_path / "inception.npz")
    np.savez(path, **npz)

    from tpu_diffusion.eval.inception import load_inception_fn
    feat_fn = load_inception_fn(path)

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    got = np.asarray(feat_fn(jnp.asarray(x)))
    with torch.no_grad():
        want = tmodel(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    assert got.shape == want.shape == (2, 2048)
    rel = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-8)
    assert rel < 5e-3, f"feature mismatch: rel err {rel}"


def test_inception_import_rejects_non_inception():
    with pytest.raises(KeyError):
        iw.convert_inception({"blah.conv.weight": np.zeros((4, 4, 3, 3))})


class _TVgg16LPIPS(torch.nn.Module):
    """Minimal torch mirror of vgg16-features + the official lpips formula
    (scaling layer, unit-normalize, learned lin heads, spatial average)."""

    TAPS = (3, 8, 15, 22, 29)  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3

    def __init__(self, vgg_sd, lins):
        super().__init__()
        layers, cin = [], 3
        for i in range(31):
            key = f"features.{i}.weight"
            if key in vgg_sd:
                w = torch.tensor(vgg_sd[key])
                conv = torch.nn.Conv2d(w.shape[1], w.shape[0], 3, padding=1)
                conv.weight.data = w
                conv.bias.data = torch.tensor(vgg_sd[f"features.{i}.bias"])
                layers.append(conv)
            elif i in (4, 9, 16, 23):
                layers.append(torch.nn.MaxPool2d(2, 2))
            else:
                layers.append(torch.nn.ReLU())
        self.features = torch.nn.Sequential(*layers)
        self.lins = [torch.tensor(l) for l in lins]
        self.shift = torch.tensor(iw.LPIPS_SHIFT).view(1, 3, 1, 1)
        self.scale = torch.tensor(iw.LPIPS_SCALE).view(1, 3, 1, 1)

    def _feats(self, x):
        x = (x - self.shift) / self.scale
        out = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in self.TAPS:
                out.append(x / torch.sqrt(
                    (x**2).sum(1, keepdim=True) + 1e-10))
        return out

    def forward(self, x, y):
        total = 0.0
        for lin, a, b in zip(self.lins, self._feats(x), self._feats(y)):
            d = (a - b) ** 2 * lin.view(1, -1, 1, 1)
            total = total + d.sum(1).mean((1, 2))
        return total


def test_lpips_checkpoint_import_distance_parity(tmp_path):
    rng = np.random.default_rng(2)
    vgg_sd, cin = {}, 3
    widths = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    for idx, w in zip(iw.VGG16_CONV_IDX, widths):
        vgg_sd[f"features.{idx}.weight"] = rng.normal(
            0, 0.08, (w, cin, 3, 3)).astype(np.float32)
        vgg_sd[f"features.{idx}.bias"] = rng.normal(
            0, 0.05, (w,)).astype(np.float32)
        cin = w
    taps = [64, 128, 256, 512, 512]
    lpips_sd = {f"lin{layer}.model.1.weight":
                rng.uniform(0, 0.2, (1, c, 1, 1)).astype(np.float32)
                for layer, c in enumerate(taps)}
    npz = iw.convert_vgg_lpips(vgg_sd, lpips_sd)
    path = str(tmp_path / "lpips.npz")
    np.savez(path, **npz)

    from tpu_diffusion.eval.lpips import load_lpips_fn
    dist = load_lpips_fn(path)

    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(dist(jnp.asarray(x), jnp.asarray(y)))
    # identity and symmetry
    assert np.allclose(np.asarray(dist(jnp.asarray(x), jnp.asarray(x))),
                       0.0, atol=1e-6)
    np.testing.assert_allclose(
        got, np.asarray(dist(jnp.asarray(y), jnp.asarray(x))), rtol=1e-5)
    # numeric parity with the torch lpips formula
    tnet = _TVgg16LPIPS(vgg_sd, [npz[f"lin/{l}"] for l in range(5)]).eval()
    with torch.no_grad():
        want = tnet(torch.tensor(x.transpose(0, 3, 1, 2)),
                    torch.tensor(y.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)
