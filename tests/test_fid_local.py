"""FID from local weights (metrics.fid_from_weights / diffpir_tpu.inception).

The reference's result tables report FID (``/root/reference/README.md:121``)
but its code never computes it — pytorch-fid convention: InceptionV3 pool3
features (2048-d) + Fréchet distance.  The JAX transcription is validated
here against an independent hand-written torch transcription of the
pytorch-fid forward pass (BasicConv2d = conv + BatchNorm(eps=1e-3) + relu,
count_include_pad=False average pools, max pool in Mixed_7c's pool branch) on
random weights — same math, different framework, different code structure
(the torch oracle does NOT read the library's architecture tables, so block
wiring/concat-order errors can't cancel).  The Fréchet statistics are pinned
against closed forms.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from diffpir_tpu.inception import (
    FidScorer, N_FEATURES, expected_conv_shapes, feature_stats,
    fid_from_weights, frechet_distance, inception_pool3_from_weights)


@pytest.fixture(scope="module")
def weights(tmp_path_factory):
    """Random weights in the torchvision inception_v3 state_dict layout."""
    rng = np.random.default_rng(0)
    flat = {}
    for prefix, (cout, cin, kh, kw) in expected_conv_shapes().items():
        # small fan-in-scaled weights keep 94 stacked relu-conv layers from
        # exploding/dying with BN applied at random statistics
        flat[f"{prefix}.conv.weight"] = (
            rng.standard_normal((cout, cin, kh, kw))
            * (1.5 / np.sqrt(cin * kh * kw))).astype(np.float32)
        flat[f"{prefix}.bn.weight"] = rng.uniform(
            0.7, 1.3, cout).astype(np.float32)
        flat[f"{prefix}.bn.bias"] = (
            rng.standard_normal(cout).astype(np.float32) * 0.05)
        flat[f"{prefix}.bn.running_mean"] = (
            rng.standard_normal(cout).astype(np.float32) * 0.05)
        flat[f"{prefix}.bn.running_var"] = rng.uniform(
            0.7, 1.3, cout).astype(np.float32)
    path = tmp_path_factory.mktemp("fid") / "inception_rand.npz"
    np.savez(path, **flat)
    return str(path), flat


# ---------------------------------------------------------------------------
# independent torch oracle (pytorch-fid inception.py structure, hand-written)
# ---------------------------------------------------------------------------

def _bc(x, flat, p, stride=1, pad=0):
    t = lambda k: torch.from_numpy(flat[f"{p}.{k}"])
    x = F.conv2d(x, t("conv.weight"), None, stride, pad)
    x = F.batch_norm(x, t("bn.running_mean"), t("bn.running_var"),
                     t("bn.weight"), t("bn.bias"), False, 0.0, 1e-3)
    return F.relu(x)


def _avg(x):  # FIDInception A/C/E pool branch
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


def _inc_a(x, f, b):
    b1 = _bc(x, f, f"{b}.branch1x1")
    b5 = _bc(_bc(x, f, f"{b}.branch5x5_1"), f, f"{b}.branch5x5_2", pad=2)
    b3 = _bc(_bc(_bc(x, f, f"{b}.branch3x3dbl_1"), f, f"{b}.branch3x3dbl_2",
                 pad=1), f, f"{b}.branch3x3dbl_3", pad=1)
    bp = _bc(_avg(x), f, f"{b}.branch_pool")
    return torch.cat([b1, b5, b3, bp], 1)


def _inc_b(x, f, b):
    b3 = _bc(x, f, f"{b}.branch3x3", stride=2)
    bd = _bc(_bc(_bc(x, f, f"{b}.branch3x3dbl_1"), f, f"{b}.branch3x3dbl_2",
                 pad=1), f, f"{b}.branch3x3dbl_3", stride=2)
    return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)


def _inc_c(x, f, b):
    b1 = _bc(x, f, f"{b}.branch1x1")
    b7 = _bc(x, f, f"{b}.branch7x7_1")
    b7 = _bc(b7, f, f"{b}.branch7x7_2", pad=(0, 3))
    b7 = _bc(b7, f, f"{b}.branch7x7_3", pad=(3, 0))
    bd = _bc(x, f, f"{b}.branch7x7dbl_1")
    bd = _bc(bd, f, f"{b}.branch7x7dbl_2", pad=(3, 0))
    bd = _bc(bd, f, f"{b}.branch7x7dbl_3", pad=(0, 3))
    bd = _bc(bd, f, f"{b}.branch7x7dbl_4", pad=(3, 0))
    bd = _bc(bd, f, f"{b}.branch7x7dbl_5", pad=(0, 3))
    bp = _bc(_avg(x), f, f"{b}.branch_pool")
    return torch.cat([b1, b7, bd, bp], 1)


def _inc_d(x, f, b):
    b3 = _bc(_bc(x, f, f"{b}.branch3x3_1"), f, f"{b}.branch3x3_2", stride=2)
    b7 = _bc(x, f, f"{b}.branch7x7x3_1")
    b7 = _bc(b7, f, f"{b}.branch7x7x3_2", pad=(0, 3))
    b7 = _bc(b7, f, f"{b}.branch7x7x3_3", pad=(3, 0))
    b7 = _bc(b7, f, f"{b}.branch7x7x3_4", stride=2)
    return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


def _inc_e(x, f, b, last):
    b1 = _bc(x, f, f"{b}.branch1x1")
    b3 = _bc(x, f, f"{b}.branch3x3_1")
    b3 = torch.cat([_bc(b3, f, f"{b}.branch3x3_2a", pad=(0, 1)),
                    _bc(b3, f, f"{b}.branch3x3_2b", pad=(1, 0))], 1)
    bd = _bc(_bc(x, f, f"{b}.branch3x3dbl_1"), f, f"{b}.branch3x3dbl_2",
             pad=1)
    bd = torch.cat([_bc(bd, f, f"{b}.branch3x3dbl_3a", pad=(0, 1)),
                    _bc(bd, f, f"{b}.branch3x3dbl_3b", pad=(1, 0))], 1)
    # FIDInceptionE_2 (Mixed_7c) uses a MAX pool in its pool branch
    pool = F.max_pool2d(x, 3, 1, 1) if last else _avg(x)
    bp = _bc(pool, f, f"{b}.branch_pool")
    return torch.cat([b1, b3, bd, bp], 1)


def _torch_pool3(flat, x01_nhwc, resize):
    x = torch.from_numpy(
        np.transpose(np.asarray(x01_nhwc, np.float32), (0, 3, 1, 2)).copy())
    if resize:
        x = F.interpolate(x, size=(299, 299), mode="bilinear",
                          align_corners=False)
    x = x * 2.0 - 1.0
    x = _bc(x, flat, "Conv2d_1a_3x3", stride=2)
    x = _bc(x, flat, "Conv2d_2a_3x3")
    x = _bc(x, flat, "Conv2d_2b_3x3", pad=1)
    x = F.max_pool2d(x, 3, 2)
    x = _bc(x, flat, "Conv2d_3b_1x1")
    x = _bc(x, flat, "Conv2d_4a_3x3")
    x = F.max_pool2d(x, 3, 2)
    for b in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _inc_a(x, flat, b)
    x = _inc_b(x, flat, "Mixed_6a")
    for b in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inc_c(x, flat, b)
    x = _inc_d(x, flat, "Mixed_7a")
    x = _inc_e(x, flat, "Mixed_7b", last=False)
    x = _inc_e(x, flat, "Mixed_7c", last=True)
    return x.mean(dim=(2, 3)).numpy()


# ---------------------------------------------------------------------------


def test_pool3_features_match_torch_oracle(weights):
    path, flat = weights
    rng = np.random.default_rng(1)
    # 75 px is the smallest grid that survives the stride chain to 1x1 —
    # resize_input=False keeps the oracle comparison cheap on one CPU core
    x = rng.random((2, 75, 75, 3)).astype(np.float32)
    got = inception_pool3_from_weights(path, resize_input=False)(x)
    want = _torch_pool3(flat, x, resize=False)
    assert got.shape == (2, N_FEATURES)
    np.testing.assert_allclose(got, want.astype(np.float64),
                               rtol=2e-4, atol=2e-4)


def test_pool3_resize_path_matches_torch(weights):
    path, flat = weights
    rng = np.random.default_rng(2)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    got = inception_pool3_from_weights(path, resize_input=True)(x)
    want = _torch_pool3(flat, x, resize=True)
    np.testing.assert_allclose(got, want.astype(np.float64),
                               rtol=2e-4, atol=2e-4)


def test_frechet_distance_closed_forms():
    rng = np.random.default_rng(3)
    d = 5
    mu = rng.standard_normal(d)
    a = rng.standard_normal((d, d))
    sigma = a @ a.T + np.eye(d)
    # identical distributions -> 0
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8
    # pure mean shift -> squared distance
    mu2 = mu + 3.0
    np.testing.assert_allclose(frechet_distance(mu, sigma, mu2, sigma),
                               9.0 * d, rtol=1e-9)
    # diagonal covariances: sum (sqrt(s1) - sqrt(s2))^2
    s1 = np.diag(rng.uniform(0.5, 2.0, d))
    s2 = np.diag(rng.uniform(0.5, 2.0, d))
    want = float(np.sum((np.sqrt(np.diag(s1)) - np.sqrt(np.diag(s2))) ** 2))
    np.testing.assert_allclose(frechet_distance(mu, s1, mu, s2), want,
                               rtol=1e-7, atol=1e-9)


def test_feature_stats_and_scorer_consistency(weights):
    path, _ = weights
    rng = np.random.default_rng(4)
    a = rng.random((4, 75, 75, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.25, a.shape), 0, 1).astype(np.float32)

    scorer = FidScorer(path, resize_input=False)
    scorer.add(a[:2], b[:2])
    scorer.add(a[2:], b[2:])
    batched = scorer.score()

    feats = inception_pool3_from_weights(path, resize_input=False)
    mu1, s1 = feature_stats(feats(a))
    mu2, s2 = feature_stats(feats(b))
    oneshot = frechet_distance(mu1, s1, mu2, s2)
    # batch-shape-dependent jit summation order wiggles the features ~1e-7
    np.testing.assert_allclose(batched, oneshot, rtol=1e-4)
    assert batched > 0.0
    # a set against itself is (numerically) zero — the eps clamp on the
    # ~2045 rank-deficient eigenvalues (N=4 samples) contributes O(1e-3)
    same = FidScorer(path, resize_input=False)
    same.add(a, a)
    assert abs(same.score()) < 0.02


def test_evaluate_hook_requires_weights_path():
    from diffpir_tpu.config import load_config
    from diffpir_tpu.runner import Runner

    cfg = load_config(None, overrides=dict(
        task="inpaint", model_name="tiny_test", iter_num=2, batch_size=1,
        calc_FID=True, save_E=False, save_L=False, dtype="float32"))
    with pytest.raises(ValueError, match="fid_weights"):
        Runner(cfg, use_mesh=False).evaluate()
