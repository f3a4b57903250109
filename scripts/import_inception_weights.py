"""Convert standard pretrained metric-network checkpoints into the .npz
trees tpu_diffusion's evaluators load — the metric-parity bootstrap for the
day weight files become available in this (zero-egress) environment.

Two converters:

* Inception: a `pt_inception-2015-12-05`-layout torch state_dict
  (torchvision attribute names: `Conv2d_1a_3x3.conv.weight`,
  `Mixed_5b.branch1x1.bn.running_mean`, ... — the file the reference's FID
  protocol downloads via cleanfid/pytorch-fid, cifar10/compute_fid.py:92-100
  and experiments/main.py:261-269) -> the flat .npz
  `eval/inception.py:load_inception_fn` expects
  (`params/Mixed_5b/branch1x1/conv/kernel` HWIO, `batch_stats/.../bn/mean`).

  The flax BasicConv uses `use_scale=False` (TF-Inception has no gamma);
  checkpoints that do carry `bn.weight` are folded EXACTLY into the
  running statistics:  y = g*(x-mu)/sqrt(v+eps) + b  ==
  (x'-mu')/sqrt(v'+eps) + b  with  x' = sign(g)*x (kernel sign flip),
  mu' = sign(g)*mu,  v' = (v+eps)/g^2 - eps.

* VGG16+LPIPS: a torchvision `vgg16` state_dict (`features.{i}.weight`)
  plus the lpips package's learned linear heads (`lin{l}.model.1.weight`)
  -> the .npz `eval/lpips.py:load_lpips_fn` expects.

Usage:
  python scripts/import_inception_weights.py inception IN.pth OUT.npz
  python scripts/import_inception_weights.py lpips VGG.pth LINS.pth OUT.npz

IN files may be torch .pth state dicts or .npz archives of the same key
names (for hosts without torch).

Unit-tested in tests/test_weight_import.py by exporting the torch mirrors
from tests/test_torch_crossval.py through the converter and asserting
feature/distance equality.
"""

from __future__ import annotations

import sys

import numpy as np

INCEPTION_BN_EPS = 1e-3

# torchvision vgg16: indices of the 13 conv layers inside `features`
VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)

# lpips 'vgg' scaling layer constants (input in [-1, 1])
LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _load_state_dict(path: str) -> dict:
    """torch .pth or .npz -> {name: np.ndarray}."""
    if path.endswith(".npz"):
        return {k: np.asarray(v) for k, v in np.load(path).items()}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def convert_inception(sd: dict) -> dict:
    """torchvision-layout FID-Inception state dict -> load_inception_fn npz.

    Ignores classifier/aux heads and num_batches_tracked; folds bn.weight
    (gamma) into kernel sign + running variance (see module docstring).
    """
    out = {}
    modules = sorted({k.rsplit(".", 2)[0] for k in sd
                      if k.endswith(".conv.weight")})
    for mod in modules:
        if mod.startswith(("AuxLogits", "fc")):
            continue
        pre = mod.replace(".", "/")
        w = np.asarray(sd[f"{mod}.conv.weight"], np.float32)
        kernel = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        bias = np.asarray(sd[f"{mod}.bn.bias"], np.float32)
        mean = np.asarray(sd[f"{mod}.bn.running_mean"], np.float32)
        var = np.asarray(sd[f"{mod}.bn.running_var"], np.float32)
        gamma = sd.get(f"{mod}.bn.weight")
        if gamma is not None:
            gamma = np.asarray(gamma, np.float32)
            if np.any(gamma == 0):
                raise ValueError(f"{mod}: bn.weight has zero entries; "
                                 "cannot fold into use_scale=False stats")
            sign = np.sign(gamma)
            kernel = kernel * sign[None, None, None, :]
            mean = mean * sign
            var = (var + INCEPTION_BN_EPS) / gamma**2 - INCEPTION_BN_EPS
        out[f"params/{pre}/conv/kernel"] = kernel
        out[f"params/{pre}/bn/bias"] = bias
        out[f"batch_stats/{pre}/bn/mean"] = mean
        out[f"batch_stats/{pre}/bn/var"] = var
    if not any(k.startswith("params/Mixed_7c") for k in out):
        raise KeyError("input does not look like an Inception FID "
                       "checkpoint (no Mixed_7c.* entries)")
    return out


def convert_vgg_lpips(vgg_sd: dict, lpips_sd: dict) -> dict:
    """torchvision vgg16 + lpips lin heads -> load_lpips_fn npz."""
    out = {"shift": LPIPS_SHIFT, "scale": LPIPS_SCALE}
    for i, idx in enumerate(VGG16_CONV_IDX):
        w = np.asarray(vgg_sd[f"features.{idx}.weight"], np.float32)
        out[f"params/Conv_{i}/kernel"] = w.transpose(2, 3, 1, 0)
        out[f"params/Conv_{i}/bias"] = np.asarray(
            vgg_sd[f"features.{idx}.bias"], np.float32)
    for layer in range(5):
        # lpips stores the head as a 1x1 conv [1, C, 1, 1]; keep [C]
        key = f"lin{layer}.model.1.weight"
        if key not in lpips_sd:  # some exports drop the Sequential wrapper
            key = f"lins.{layer}.model.1.weight"
        out[f"lin/{layer}"] = np.asarray(
            lpips_sd[key], np.float32).reshape(-1)
    return out


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in ("inception", "lpips"):
        print(__doc__)
        return 2
    if argv[0] == "inception":
        _, src, dst = argv
        out = convert_inception(_load_state_dict(src))
    else:
        _, vgg, lins, dst = argv
        out = convert_vgg_lpips(_load_state_dict(vgg),
                                _load_state_dict(lins))
    np.savez(dst, **out)
    print(f"[import_weights] wrote {len(out)} arrays -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
