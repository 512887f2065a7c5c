"""LPIPS from local weights (metrics.lpips_from_weights).

The reference's third metric is LPIPS(vgg) via the downloading ``lpips``
package (``main_ddpir.py:543-544``); `lpips_from_weights` rebuilds the graph
in JAX from an on-disk weights file.  Validated here against an independent
torch transcription of the LPIPS forward pass (VGG16 features + unit-norm +
lin heads) on random weights — same math, different framework.
"""

import numpy as np
import pytest

from diffpir_tpu.metrics import (_VGG16_CONVS, _VGG16_STAGES, _LPIPS_SCALE,
                                 _LPIPS_SHIFT, lpips_from_weights, make_lpips)

# channel plan of VGG16 features (per conv layer, torchvision indexing)
_CH = {0: (3, 64), 2: (64, 64), 5: (64, 128), 7: (128, 128),
       10: (128, 256), 12: (256, 256), 14: (256, 256),
       17: (256, 512), 19: (512, 512), 21: (512, 512),
       24: (512, 512), 26: (512, 512), 28: (512, 512)}
_TAP_CH = (64, 128, 256, 512, 512)


def _random_weights(rng, scale=0.05):
    flat = {}
    for i, (cin, cout) in _CH.items():
        flat[f"features.{i}.weight"] = (
            rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * scale)
        flat[f"features.{i}.bias"] = (
            rng.standard_normal((cout,)).astype(np.float32) * scale)
    for k, c in enumerate(_TAP_CH):
        flat[f"lin{k}.model.1.weight"] = np.abs(
            rng.standard_normal((1, c, 1, 1)).astype(np.float32)) * scale
    return flat


def _torch_lpips(flat, a, b):
    """Independent transcription of the lpips-package forward (vgg variant)
    in torch: ScalingLayer -> VGG16 slices -> normalize_tensor -> lin ->
    spatial mean -> sum."""
    import torch
    import torch.nn.functional as F

    def feats(x):
        taps = []
        for s, stage in enumerate(_VGG16_STAGES):
            if s:
                x = F.max_pool2d(x, 2, 2)
            for i in stage:
                w = torch.from_numpy(flat[f"features.{i}.weight"])
                bias = torch.from_numpy(flat[f"features.{i}.bias"])
                x = F.relu(F.conv2d(x, w, bias, padding=1))
            taps.append(x)
        return taps

    shift = torch.from_numpy(_LPIPS_SHIFT.reshape(1, 3, 1, 1))
    scale = torch.from_numpy(_LPIPS_SCALE.reshape(1, 3, 1, 1))
    ta = torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())
    tb = torch.from_numpy(np.transpose(b, (0, 3, 1, 2)).copy())
    fa = feats((ta - shift) / scale)
    fb = feats((tb - shift) / scale)
    total = 0.0
    for xa, xb, k in zip(fa, fb, range(5)):
        na = xa / torch.sqrt((xa * xa).sum(1, keepdim=True) + 1e-10)
        nb = xb / torch.sqrt((xb * xb).sum(1, keepdim=True) + 1e-10)
        lin = torch.from_numpy(flat[f"lin{k}.model.1.weight"])
        d = ((na - nb) ** 2 * lin).sum(1).mean((1, 2))
        total = total + d
    return float(total.mean())


@pytest.fixture(scope="module")
def weights_npz(tmp_path_factory):
    flat = _random_weights(np.random.default_rng(0))
    path = tmp_path_factory.mktemp("lpips") / "lpips_vgg.npz"
    np.savez(str(path), **flat)
    return str(path), flat


def test_lpips_from_weights_matches_torch_transcription(weights_npz):
    path, flat = weights_npz
    fn = lpips_from_weights(path)
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape), -1, 1).astype(np.float32)
    got = fn(a, b)
    want = _torch_lpips(flat, a, b)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
    # basic metric sanity
    assert fn(a, a) < 1e-6
    assert got > fn(a, a)


def test_lpips_reachable_through_make_lpips_and_torch_pt(weights_npz,
                                                         tmp_path):
    """make_lpips(weights_path=...) routes to the local builder; a torch
    state_dict .pt file is accepted too and agrees with the npz."""
    import torch

    path, flat = weights_npz
    fn_npz = make_lpips(weights_path=path)
    pt_path = str(tmp_path / "lpips_vgg.pt")
    torch.save({k: torch.from_numpy(v) for k, v in flat.items()}, pt_path)
    fn_pt = make_lpips(weights_path=pt_path)
    rng = np.random.default_rng(2)
    a = rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
    np.testing.assert_allclose(fn_npz(a, b), fn_pt(a, b), rtol=1e-6)


def test_lpips_malformed_file_raises(tmp_path):
    path = str(tmp_path / "bad.npz")
    np.savez(path, **{"features.0.weight":
                      np.zeros((64, 3, 3, 3), np.float32)})
    with pytest.raises(ValueError, match="missing"):
        lpips_from_weights(path)
