"""InceptionV3-pool3 features + Fréchet distance (FID) from local weights.

The reference's published tables report FID (``/root/reference/README.md:121``)
but its code never computes it — the numbers come from an external tool
(pytorch-fid convention: InceptionV3 pool3 features, 2048-d, of the standard
TF-ported ``pt_inception-2015-12-05`` checkpoint).  This module is the
in-framework equivalent, built exactly like ``metrics.lpips_from_weights``:
a pure-JAX transcription of the network that loads weights the caller
provides on disk (``.pt`` state_dict or ``.npz`` with torchvision
``inception_v3`` key naming, which the pytorch-fid checkpoint shares) — no
torchvision, no network egress.

Faithfulness notes (pytorch-fid ``inception.py`` FIDInception* subclasses):
  * every conv is BasicConv2d = conv(bias-free) + BatchNorm(eps=1e-3) + relu;
    BN is FOLDED into the conv weights at load time (inference-only module —
    one fused conv per layer instead of conv + 4-tensor normalization, the
    TPU-friendly form),
  * the in-block 3x3/stride-1 average pools use count_include_pad=False,
  * Mixed_7c (FIDInceptionE_2) uses a MAX pool in its pool branch — an
    intentional quirk of the FID reference implementation,
  * input preprocessing: bilinear resize to 299x299 (half-pixel centers,
    torch ``align_corners=False`` == ``jax.image.resize``) then [0,1]->[-1,1].

The Fréchet statistics (sample mean/covariance + trace of the matrix square
root of the covariance product) are computed in float64 on host via a
symmetric eigendecomposition: tr sqrtm(S1 S2) = sum sqrt eig(S1^1/2 S2 S1^1/2)
— equivalent to pytorch-fid's ``scipy.linalg.sqrtm`` path for PSD inputs but
dependency-free and numerically symmetric by construction.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

__all__ = ["inception_pool3_from_weights", "frechet_distance",
           "feature_stats", "fid_from_weights", "FidScorer"]

_EPS_BN = 1e-3

# ---------------------------------------------------------------------------
# architecture tables (torchvision inception_v3 state_dict naming)
# ---------------------------------------------------------------------------
# stem: (name, cin, cout, kh, kw, stride, pad_h, pad_w); "M" = maxpool 3x3/2
_STEM = (
    ("Conv2d_1a_3x3", 3, 32, 3, 3, 2, 0, 0),
    ("Conv2d_2a_3x3", 32, 32, 3, 3, 1, 0, 0),
    ("Conv2d_2b_3x3", 32, 64, 3, 3, 1, 1, 1),
    "M",
    ("Conv2d_3b_1x1", 64, 80, 1, 1, 1, 0, 0),
    ("Conv2d_4a_3x3", 80, 192, 3, 3, 1, 0, 0),
    "M",
)

# per-conv shape plan inside each block type: branch key ->
#   list of (suffix, cout, kh, kw, stride, pad_h, pad_w); cin chains.
def _block_convs(kind: str, cin: int, arg: int):
    if kind == "A":  # InceptionA(pool_features=arg) -> 224 + arg channels
        return {
            "branch1x1": [("branch1x1", 64, 1, 1, 1, 0, 0)],
            "branch5x5": [("branch5x5_1", 48, 1, 1, 1, 0, 0),
                          ("branch5x5_2", 64, 5, 5, 1, 2, 2)],
            "branch3x3dbl": [("branch3x3dbl_1", 64, 1, 1, 1, 0, 0),
                             ("branch3x3dbl_2", 96, 3, 3, 1, 1, 1),
                             ("branch3x3dbl_3", 96, 3, 3, 1, 1, 1)],
            "branch_pool": [("branch_pool", arg, 1, 1, 1, 0, 0)],
        }
    if kind == "B":  # InceptionB: stride-2 reduction -> 480 + cin channels
        return {
            "branch3x3": [("branch3x3", 384, 3, 3, 2, 0, 0)],
            "branch3x3dbl": [("branch3x3dbl_1", 64, 1, 1, 1, 0, 0),
                             ("branch3x3dbl_2", 96, 3, 3, 1, 1, 1),
                             ("branch3x3dbl_3", 96, 3, 3, 2, 0, 0)],
        }
    if kind == "C":  # InceptionC(channels_7x7=arg) -> 768 channels
        c7 = arg
        return {
            "branch1x1": [("branch1x1", 192, 1, 1, 1, 0, 0)],
            "branch7x7": [("branch7x7_1", c7, 1, 1, 1, 0, 0),
                          ("branch7x7_2", c7, 1, 7, 1, 0, 3),
                          ("branch7x7_3", 192, 7, 1, 1, 3, 0)],
            "branch7x7dbl": [("branch7x7dbl_1", c7, 1, 1, 1, 0, 0),
                             ("branch7x7dbl_2", c7, 7, 1, 1, 3, 0),
                             ("branch7x7dbl_3", c7, 1, 7, 1, 0, 3),
                             ("branch7x7dbl_4", c7, 7, 1, 1, 3, 0),
                             ("branch7x7dbl_5", 192, 1, 7, 1, 0, 3)],
            "branch_pool": [("branch_pool", 192, 1, 1, 1, 0, 0)],
        }
    if kind == "D":  # InceptionD: stride-2 reduction -> 512 + cin channels
        return {
            "branch3x3": [("branch3x3_1", 192, 1, 1, 1, 0, 0),
                          ("branch3x3_2", 320, 3, 3, 2, 0, 0)],
            "branch7x7x3": [("branch7x7x3_1", 192, 1, 1, 1, 0, 0),
                            ("branch7x7x3_2", 192, 1, 7, 1, 0, 3),
                            ("branch7x7x3_3", 192, 7, 1, 1, 3, 0),
                            ("branch7x7x3_4", 192, 3, 3, 2, 0, 0)],
        }
    if kind == "E":  # InceptionE -> 2048 channels (split 3x3 branches)
        return {
            "branch1x1": [("branch1x1", 320, 1, 1, 1, 0, 0)],
            "branch3x3": [("branch3x3_1", 384, 1, 1, 1, 0, 0)],
            "branch3x3a": [("branch3x3_2a", 384, 1, 3, 1, 0, 1)],
            "branch3x3b": [("branch3x3_2b", 384, 3, 1, 1, 1, 0)],
            "branch3x3dbl": [("branch3x3dbl_1", 448, 1, 1, 1, 0, 0),
                             ("branch3x3dbl_2", 384, 3, 3, 1, 1, 1)],
            "branch3x3dbla": [("branch3x3dbl_3a", 384, 1, 3, 1, 0, 1)],
            "branch3x3dblb": [("branch3x3dbl_3b", 384, 3, 1, 1, 1, 0)],
            "branch_pool": [("branch_pool", 192, 1, 1, 1, 0, 0)],
        }
    raise ValueError(kind)


# (block name, kind, cin, arg)
_BLOCKS = (
    ("Mixed_5b", "A", 192, 32),
    ("Mixed_5c", "A", 256, 64),
    ("Mixed_5d", "A", 288, 64),
    ("Mixed_6a", "B", 288, 0),
    ("Mixed_6b", "C", 768, 128),
    ("Mixed_6c", "C", 768, 160),
    ("Mixed_6d", "C", 768, 160),
    ("Mixed_6e", "C", 768, 192),
    ("Mixed_7a", "D", 768, 0),
    ("Mixed_7b", "E", 1280, 0),
    ("Mixed_7c", "E", 2048, 0),
)

N_FEATURES = 2048

# InceptionE's split 3x3 branches consume their PARENT conv's 384 channels,
# not the block input (the a/b legs fork after branch3x3_1 / branch3x3dbl_2)
_E_FORK_CIN = {"branch3x3a": 384, "branch3x3b": 384,
               "branch3x3dbla": 384, "branch3x3dblb": 384}


def expected_conv_shapes() -> dict:
    """{state_dict conv prefix: (cout, cin, kh, kw)} for the whole network.

    Shared by the loader (validation) and the tests (random-weight synthesis).
    """
    shapes = {}
    for e in _STEM:
        if e == "M":
            continue
        name, cin, cout, kh, kw, *_ = e
        shapes[name] = (cout, cin, kh, kw)
    for bname, kind, cin, arg in _BLOCKS:
        for key, convs in _block_convs(kind, cin, arg).items():
            c = _E_FORK_CIN.get(key, cin) if kind == "E" else cin
            for suffix, cout, kh, kw, *_ in convs:
                shapes[f"{bname}.{suffix}"] = (cout, c, kh, kw)
                c = cout
    return shapes


def _fold_bn(flat: dict, prefix: str, want_shape) -> tuple:
    """conv weight + BatchNorm(eps=1e-3) -> fused (HWIO weight, bias)."""
    try:
        w = flat[f"{prefix}.conv.weight"]
        gamma = flat[f"{prefix}.bn.weight"]
        beta = flat[f"{prefix}.bn.bias"]
        mean = flat[f"{prefix}.bn.running_mean"]
        var = flat[f"{prefix}.bn.running_var"]
    except KeyError as e:
        raise ValueError(
            f"FID weights: missing key {e} (expected torchvision "
            f"inception_v3 state_dict naming)") from e
    if tuple(w.shape) != tuple(want_shape):
        raise ValueError(f"FID weights: {prefix}.conv.weight has shape "
                         f"{w.shape}, expected {want_shape}")
    s = gamma / np.sqrt(var + _EPS_BN)
    w = w * s[:, None, None, None]          # OIHW scale per output channel
    b = beta - mean * s
    # torch OIHW -> XLA HWIO
    return (np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)),
                                 dtype=np.float32),
            b.astype(np.float32).reshape(1, 1, 1, -1))


def inception_pool3_from_weights(weights_path: str,
                                 resize_input: bool = True) -> Callable:
    """Build the pool3 feature extractor; returns ``f(x01) -> (B, 2048)``.

    ``x01``: (B, H, W, 3) float in [0, 1] (any H, W when ``resize_input``).
    jit-compiled; fp32 throughout (FID statistics are covariance-sensitive).
    """
    import jax
    import jax.numpy as jnp

    from diffpir_tpu.metrics import _load_weight_file

    flat = _load_weight_file(weights_path)
    shapes = expected_conv_shapes()
    fused = {name: _fold_bn(flat, name, shp) for name, shp in shapes.items()}
    fused = {k: (jnp.asarray(w), jnp.asarray(b)) for k, (w, b) in fused.items()}

    def conv(x, name, stride, ph, pw):
        w, b = fused[name]
        x = jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        return jax.nn.relu(x + b)

    def maxpool3x3s2(x):
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (1, 3, 3, 1), (1, 2, 2, 1), "VALID")

    def avgpool3x3s1(x):
        # count_include_pad=False (pytorch-fid FIDInception A/C/E): divide
        # the padded window sum by the number of VALID taps per position
        pads = ((0, 0), (1, 1), (1, 1), (0, 0))
        s = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                  (1, 3, 3, 1), (1, 1, 1, 1), pads)
        ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
        n = jax.lax.reduce_window(ones, 0.0, jax.lax.add,
                                  (1, 3, 3, 1), (1, 1, 1, 1), pads)
        return s / n

    def maxpool3x3s1(x):  # FIDInceptionE_2 (Mixed_7c) pool branch
        pads = ((0, 0), (1, 1), (1, 1), (0, 0))
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (1, 3, 3, 1), (1, 1, 1, 1), pads)

    def run_chain(x, bname, convs):
        for suffix, _co, _kh, _kw, stride, ph, pw in convs:
            x = conv(x, f"{bname}.{suffix}", stride, ph, pw)
        return x

    def block(x, bname, kind, cin, arg):
        c = _block_convs(kind, cin, arg)
        if kind == "A":
            outs = [run_chain(x, bname, c["branch1x1"]),
                    run_chain(x, bname, c["branch5x5"]),
                    run_chain(x, bname, c["branch3x3dbl"]),
                    run_chain(avgpool3x3s1(x), bname, c["branch_pool"])]
        elif kind == "B":
            outs = [run_chain(x, bname, c["branch3x3"]),
                    run_chain(x, bname, c["branch3x3dbl"]),
                    maxpool3x3s2(x)]
        elif kind == "C":
            outs = [run_chain(x, bname, c["branch1x1"]),
                    run_chain(x, bname, c["branch7x7"]),
                    run_chain(x, bname, c["branch7x7dbl"]),
                    run_chain(avgpool3x3s1(x), bname, c["branch_pool"])]
        elif kind == "D":
            outs = [run_chain(x, bname, c["branch3x3"]),
                    run_chain(x, bname, c["branch7x7x3"]),
                    maxpool3x3s2(x)]
        else:  # E
            b3 = run_chain(x, bname, c["branch3x3"])
            b3 = jnp.concatenate([run_chain(b3, bname, c["branch3x3a"]),
                                  run_chain(b3, bname, c["branch3x3b"])], -1)
            bd = run_chain(x, bname, c["branch3x3dbl"])
            bd = jnp.concatenate([run_chain(bd, bname, c["branch3x3dbla"]),
                                  run_chain(bd, bname, c["branch3x3dblb"])],
                                 -1)
            pool = maxpool3x3s1(x) if bname == "Mixed_7c" else avgpool3x3s1(x)
            outs = [run_chain(x, bname, c["branch1x1"]), b3, bd,
                    run_chain(pool, bname, c["branch_pool"])]
        return jnp.concatenate(outs, axis=-1)

    @jax.jit
    def features(x01):
        x = x01.astype(jnp.float32)
        if resize_input:
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        x = x * 2.0 - 1.0
        for e in _STEM:
            if e == "M":
                x = maxpool3x3s2(x)
            else:
                name, _ci, _co, _kh, _kw, stride, ph, pw = e
                x = conv(x, name, stride, ph, pw)
        for bname, kind, cin, arg in _BLOCKS:
            x = block(x, bname, kind, cin, arg)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)

    def compute(x01: np.ndarray) -> np.ndarray:
        out = features(jnp.asarray(np.asarray(x01, np.float32)))
        return np.asarray(out, np.float64)

    return compute


# ---------------------------------------------------------------------------
# Fréchet statistics
# ---------------------------------------------------------------------------

def feature_stats(feats: np.ndarray) -> tuple:
    """(mu, sigma) of an (N, D) feature matrix in float64."""
    f = np.asarray(feats, np.float64)
    if f.ndim != 2 or f.shape[0] < 2:
        raise ValueError(f"need (N>=2, D) features, got {f.shape}")
    return f.mean(axis=0), np.cov(f, rowvar=False)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + tr(S1 + S2 - 2 sqrtm(S1 S2)), PSD-safe.

    tr sqrtm(S1 S2) = sum sqrt eig(S1^1/2 S2 S1^1/2): symmetric
    eigendecompositions only (pytorch-fid reaches the same value through
    ``scipy.linalg.sqrtm`` on the non-symmetric product, then has to patch up
    imaginary leakage; the congruent form never leaves the reals).
    """
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    s1 = np.atleast_2d(np.asarray(sigma1, np.float64))
    s2 = np.atleast_2d(np.asarray(sigma2, np.float64))
    diff = mu1 - mu2

    # S1^1/2 via symmetric eigendecomposition (clip tiny negatives)
    w, v = np.linalg.eigh(s1)
    root1 = (v * np.sqrt(np.clip(w, 0.0, None))) @ v.T
    m = root1 @ s2 @ root1
    ev = np.linalg.eigvalsh((m + m.T) / 2.0)
    # eps guard mirrors pytorch-fid's singular-product fallback
    tr_sqrt = float(np.sum(np.sqrt(np.clip(ev, eps * eps, None))))
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2.0 * tr_sqrt)


class FidScorer:
    """Streaming FID between two image sets (e.g. restored vs ground truth).

    ``add(a_batch, b_batch)`` accumulates pool3 features batch by batch
    ((B,H,W,3) float [0,1]); ``score()`` returns the Fréchet distance of the
    accumulated sets.  Used by ``Runner.evaluate`` so FID costs one extra
    forward per batch instead of a second pass over saved images.
    """

    def __init__(self, weights_path: str, resize_input: bool = True):
        self.features = inception_pool3_from_weights(weights_path,
                                                     resize_input)
        self._a, self._b = [], []

    def add(self, a: np.ndarray, b: Optional[np.ndarray] = None) -> None:
        self._a.append(self.features(a))
        if b is not None:
            self._b.append(self.features(b))

    def score(self) -> float:
        mu1, s1 = feature_stats(np.concatenate(self._a, axis=0))
        mu2, s2 = feature_stats(np.concatenate(self._b, axis=0))
        return frechet_distance(mu1, s1, mu2, s2)


def fid_from_weights(weights_path: str) -> Callable:
    """Return ``fid(a_set, b_set) -> float`` on (N,H,W,3) [0,1] arrays.

    The one-shot form of ``FidScorer`` (mirrors ``lpips_from_weights``).
    """
    feats = inception_pool3_from_weights(weights_path)

    def compute(a: np.ndarray, b: np.ndarray, batch: int = 16) -> float:
        def all_feats(x):
            x = np.asarray(x, np.float32)
            return np.concatenate([feats(x[i:i + batch])
                                   for i in range(0, len(x), batch)], axis=0)

        mu1, s1 = feature_stats(all_feats(a))
        mu2, s2 = feature_stats(all_feats(b))
        return frechet_distance(mu1, s1, mu2, s2)

    return compute
