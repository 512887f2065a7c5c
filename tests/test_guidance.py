"""Gradient-guidance modes: first-order prox vs reference grad_and_value, and
DPS trajectories through the runner."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffpir_tpu.config import load_config
from diffpir_tpu.guidance import frobenius_residual, make_degrade_op, make_grad_prox
from diffpir_tpu.ops.degrade import fspecial_gaussian
from diffpir_tpu.runner import Runner
from diffpir_tpu.utils import image as im
from tests.conftest import add_reference_to_path, reference_available

IMG = 64


def test_grad_matches_reference_grad_and_value():
    if not reference_available():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    import torch
    from utils.utils_model import grad_and_value

    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    y = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    k = fspecial_gaussian(5, 1.0).astype(np.float32)

    # torch side: reflection-pad depthwise conv in [0,1] domain
    xt = torch.from_numpy(x0.transpose(0, 3, 1, 2)).requires_grad_()
    k4 = torch.einsum("ab,cd->abcd", torch.eye(3), torch.from_numpy(k))

    def op_t(v):
        v = v / 2 + 0.5
        pad = torch.nn.ReflectionPad2d(2)
        return torch.nn.functional.conv2d(pad(v), k4)

    ref_grad, ref_norm = grad_and_value(
        operator=op_t, x=xt, x_hat=xt,
        measurement=torch.from_numpy(y.transpose(0, 3, 1, 2)))

    op_j = make_degrade_op("deblur", kernel=jnp.asarray(k)[None])
    norm, grad = jax.value_and_grad(
        lambda v: frobenius_residual(op_j, v, jnp.asarray(y)))(jnp.asarray(x0))
    assert float(norm) == pytest.approx(float(ref_norm), rel=1e-5)
    np.testing.assert_allclose(np.asarray(grad).transpose(0, 3, 1, 2),
                               ref_grad.detach().numpy(), atol=1e-5)


def test_grad_prox_reduces_residual():
    rng = np.random.default_rng(1)
    k = fspecial_gaussian(5, 1.0).astype(np.float32)
    op = make_degrade_op("deblur", kernel=jnp.asarray(k)[None])
    x_true = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32) * 2 - 1)
    y = op(x_true)
    x0 = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32) * 2 - 1)
    prox = make_grad_prox(op, y)
    r_before = float(frobenius_residual(op, x0, y))
    x1 = prox(x0, jnp.asarray(10.0))
    r_after = float(frobenius_residual(op, x1, y))
    assert r_after < r_before


@pytest.fixture()
def tiny_testset(tmp_path):
    rng = np.random.default_rng(0)
    tdir = tmp_path / "testsets" / "tiny"
    tdir.mkdir(parents=True)
    for i in range(2):
        x = np.zeros((IMG, IMG, 3), np.float32)
        x[:, :] = rng.random(3)
        x[20:44, 20:44] = rng.random(3)
        im.imsave(im.single2uint(x), str(tdir / f"img{i}.png"))
    return tmp_path


def _config(tmp_path, task, **over):
    overrides = dict(task=task, model_name="tiny_test", testset_name="tiny",
                     cwd=str(tmp_path), iter_num=3, batch_size=2, seed=0,
                     save_E=False, save_L=False, dtype="float32",
                     noise_level_img=2.0)
    overrides.update(over)
    return load_config(None, overrides)


@pytest.mark.parametrize("mode", ["DPS_y0", "DPS_yt"])
def test_dps_modes_run(tiny_testset, mode):
    cfg = _config(tiny_testset, "deblur", generate_mode=mode, kernel_size=9)
    cfg.kernel_std = 0.5
    runner = Runner(cfg, use_mesh=False)
    res = runner.evaluate(save=False)
    assert np.isfinite(res["psnr"])


def test_first_order_prox_mode(tiny_testset):
    cfg = _config(tiny_testset, "deblur", sub_1_analytic=False, kernel_size=9)
    cfg.kernel_std = 0.5
    runner = Runner(cfg, use_mesh=False)
    res = runner.evaluate(save=False)
    assert np.isfinite(res["psnr"])
