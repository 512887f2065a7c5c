"""Serving layer: warm-batch request handling and the folder frontend."""

import os

import numpy as np
import pytest

from diffpir_tpu.config import load_config
from diffpir_tpu.serve import RestorationService, serve_folder
from diffpir_tpu.utils import image as im

IMG = 64


@pytest.fixture()
def tiny_env(tmp_path):
    rng = np.random.default_rng(0)
    tdir = tmp_path / "testsets" / "tiny"
    tdir.mkdir(parents=True)
    for i in range(3):
        x = np.zeros((IMG, IMG, 3), np.float32)
        x[:, :] = rng.random(3)
        x[20:44, 20:44] = rng.random(3)
        im.imsave(im.single2uint(x), str(tdir / f"img{i}.png"))
    return tmp_path


def _cfg(tmp_path, **over):
    o = dict(task="inpaint", model_name="tiny_test", testset_name="tiny",
             cwd=str(tmp_path), iter_num=3, batch_size=2, seed=0,
             save_E=False, save_L=False, dtype="float32", noise_level_img=0,
             mask_prob_range=[0.3, 0.3], recover_known=True)
    o.update(over)
    return load_config(None, o)


def test_service_handles_arbitrary_request_sizes(tiny_env):
    cfg = _cfg(tiny_env)
    svc = RestorationService(cfg, use_mesh=False, allow_random_weights=True, service_batch=2)
    rng = np.random.default_rng(1)
    masks = [(rng.random((IMG, IMG)) > 0.3).astype(np.float32) for _ in range(3)]
    imgs = [rng.random((IMG, IMG, 3)).astype(np.float32) * m[:, :, None]
            for m in masks]
    outs = svc.restore(imgs, masks=masks)  # 3 requests through batch-2 programs
    assert len(outs) == 3
    for o, img, m in zip(outs, imgs, masks):
        assert o.shape == (IMG, IMG, 3)
        assert np.isfinite(o).all()
        # known pixels recovered (recover_known=True)
        np.testing.assert_allclose(o[m > 0], img[m > 0], atol=1e-5)
    # the compiled program is reused: second call must not retrace
    n_compiled = len(svc.runner._restore_jit)
    svc.restore(imgs[:1], masks=masks[:1])
    assert len(svc.runner._restore_jit) == n_compiled


def test_serve_folder(tiny_env, tmp_path):
    cfg = _cfg(tiny_env)
    out_dir = str(tmp_path / "served")
    stats = serve_folder(cfg, str(tiny_env / "testsets" / "tiny"), out_dir,
                         use_mesh=False, allow_random_weights=True)
    assert stats["n_images"] == 3
    files = os.listdir(out_dir)
    assert sum(f.startswith("restored_") for f in files) == 3


def test_request_validation(tiny_env):
    from diffpir_tpu.serve import RequestError

    svc = RestorationService(_cfg(tiny_env), use_mesh=False, allow_random_weights=True, service_batch=2)
    rng = np.random.default_rng(2)
    good = rng.random((IMG, IMG, 3)).astype(np.float32)
    good_mask = (rng.random((IMG, IMG)) > 0.5).astype(np.float32)

    with pytest.raises(RequestError, match="expected"):
        svc.restore([good[..., :1]])                       # wrong channels
    bad = good.copy(); bad[0, 0, 0] = np.nan
    with pytest.raises(RequestError, match="non-finite"):
        svc.restore([bad])
    with pytest.raises(RequestError, match="binary"):
        svc.restore([good], masks=[good_mask * 0.5])
    with pytest.raises(RequestError, match="shape"):
        svc.restore([good], masks=[good_mask[:32]])
    with pytest.raises(RequestError, match="normalized"):
        svc.restore([good], kernels=[np.ones((5, 5), np.float32)])
    with pytest.raises(RequestError, match="larger than image"):
        svc.restore([good], kernels=[np.full((IMG + 5, 5), 0.0, np.float32)
                                     + 1.0 / ((IMG + 5) * 5)])
    with pytest.raises(RequestError, match="1:1"):
        svc.restore([good, good], masks=[good_mask])


def test_mixed_shape_requests_grouped(tiny_env):
    """Requests of different sizes are served per-shape (np.stack on mixed
    shapes would crash); outputs come back in request order."""
    svc = RestorationService(_cfg(tiny_env), use_mesh=False, allow_random_weights=True, service_batch=2)
    rng = np.random.default_rng(3)
    imgs = [rng.random((IMG, IMG, 3)).astype(np.float32),
            rng.random((IMG * 2, IMG, 3)).astype(np.float32),
            rng.random((IMG, IMG, 3)).astype(np.float32)]
    masks = [(rng.random(im_.shape[:2]) > 0.3).astype(np.float32)
             for im_ in imgs]
    outs = svc.restore([i * m[:, :, None] for i, m in zip(imgs, masks)],
                       masks=masks)
    assert [o.shape for o in outs] == [i.shape for i in imgs]
    for o in outs:
        assert np.isfinite(o).all()


def test_non_modulo_sizes_pad_and_crop(tiny_env):
    """H/W not divisible by the UNet's downsample factor are padded to the
    modulo before dispatch and cropped back (the skip-connection concat would
    otherwise crash at trace time)."""
    svc = RestorationService(_cfg(tiny_env), use_mesh=False, allow_random_weights=True, service_batch=2)
    assert svc._pad_mod == 8  # tiny config: 4 levels
    rng = np.random.default_rng(5)
    shapes = [(50, 52), (61, 45)]
    masks = [(rng.random(s) > 0.3).astype(np.float32) for s in shapes]
    imgs = [rng.random(s + (3,)).astype(np.float32) * m[:, :, None]
            for s, m in zip(shapes, masks)]
    outs = svc.restore(imgs, masks=masks)
    assert [o.shape for o in outs] == [i.shape for i in imgs]
    for o, img, m in zip(outs, imgs, masks):
        assert np.isfinite(o).all()
        np.testing.assert_allclose(o[m > 0], img[m > 0], atol=1e-5)


def test_sr_non_modulo_pad_and_crop(tiny_env):
    """sf>1 output cropping after pad-to-modulo: a (h, w) LR observation is
    padded for the UNet, restored at sf x the padded size, and cropped back
    to exactly (h*sf, w*sf)."""
    svc = RestorationService(
        _cfg(tiny_env, task="sr", sf=2, sr_mode="blur", mask_prob_range=None),
        use_mesh=False, allow_random_weights=True, service_batch=2)
    rng = np.random.default_rng(7)
    shapes = [(30, 26), (32, 32)]  # padded vs already-modulo
    imgs = [rng.random(s + (3,)).astype(np.float32) for s in shapes]
    outs = svc.restore(imgs)
    assert [o.shape for o in outs] == [(60, 52, 3), (64, 64, 3)]
    for o in outs:
        assert np.isfinite(o).all()


def test_kernel_padding_preserves_otf(tiny_env):
    """_pad_kernel keeps the PSF center at size//2, so the OTF (and hence the
    FFT prox) is bit-identical under padding — including the odd-size-delta
    case that floor-centered padding gets wrong by one pixel."""
    from diffpir_tpu.ops.boundary import psf2otf

    svc = RestorationService(_cfg(tiny_env, task="deblur"), use_mesh=False, allow_random_weights=True,
                             service_batch=2)
    rng = np.random.default_rng(6)
    for size in (5, 7, 8, 11):
        k = rng.random((size, size)).astype(np.float32)
        k /= k.sum()
        kp = svc._pad_kernel(k, (IMG, IMG))
        assert kp.shape[0] % 8 == 0 or kp.shape[0] == size
        np.testing.assert_allclose(psf2otf(kp, (IMG, IMG)),
                                   psf2otf(k, (IMG, IMG)), atol=1e-6)
    # fixed service-wide kernel size pins the compile-cache key
    svc2 = RestorationService(_cfg(tiny_env, task="deblur"), use_mesh=False, allow_random_weights=True,
                              service_batch=2, kernel_size=16)
    shapes = {svc2._pad_kernel(rng.random((s, s)).astype(np.float32),
                               (IMG, IMG)).shape for s in (5, 7, 11, 13)}
    assert shapes == {(16, 16)}


def test_close_fails_queued_futures_and_restarts(tiny_env):
    """close() must resolve (not strand) queued futures; a later submit
    transparently restarts the worker."""
    from diffpir_tpu.serve import RequestError

    svc = RestorationService(_cfg(tiny_env), use_mesh=False, allow_random_weights=True, service_batch=2,
                             max_wait_ms=1.0)
    rng = np.random.default_rng(7)
    m = (rng.random((IMG, IMG)) > 0.3).astype(np.float32)
    img = rng.random((IMG, IMG, 3)).astype(np.float32) * m[:, :, None]

    # stall the device section so requests pile up in the queue
    import threading
    release = threading.Event()
    orig = svc.runner.restore_batch

    def slow(batch, *a, **kw):
        release.wait(timeout=60)
        return orig(batch, *a, **kw)

    svc.runner.restore_batch = slow
    futs = [svc.submit(img, mask=m) for _ in range(6)]
    release.set()
    svc.close()
    svc.runner.restore_batch = orig
    resolved = 0
    for f in futs:
        try:
            out = f.result(timeout=120)
            assert np.isfinite(out).all()
            resolved += 1
        except RequestError as e:
            assert "closed" in str(e)
    assert resolved >= 1  # the in-flight group completes; none hang

    fut = svc.submit(img, mask=m)  # restart after close
    assert np.isfinite(fut.result(timeout=300)).all()
    svc.close()


def test_drain_launches_use_distinct_seeds(tiny_env):
    """Coalesced launches must not reuse one diffusion noise stream."""
    svc = RestorationService(_cfg(tiny_env), use_mesh=False, allow_random_weights=True, service_batch=2,
                             max_wait_ms=1.0)
    seeds = []
    orig = svc.runner.restore_batch

    def recording(batch, *a, seed=0, **kw):
        seeds.append(seed)
        return orig(batch, *a, seed=seed, **kw)

    svc.runner.restore_batch = recording
    rng = np.random.default_rng(8)
    m = (rng.random((IMG, IMG)) > 0.3).astype(np.float32)
    img = rng.random((IMG, IMG, 3)).astype(np.float32) * m[:, :, None]
    for _ in range(3):
        svc.submit(img, mask=m).result(timeout=300)
    svc.close()
    assert len(seeds) == len(set(seeds)) == 3, seeds


def test_submit_coalesces_concurrent_requests(tiny_env):
    """The async front-end batches concurrent submits into shared launches."""
    svc = RestorationService(_cfg(tiny_env), use_mesh=False, allow_random_weights=True, service_batch=2,
                             max_wait_ms=300.0)
    rng = np.random.default_rng(4)
    masks = [(rng.random((IMG, IMG)) > 0.3).astype(np.float32)
             for _ in range(4)]
    imgs = [rng.random((IMG, IMG, 3)).astype(np.float32) * m[:, :, None]
            for m in masks]
    svc.warmup((IMG, IMG))

    calls = []
    orig = svc.runner.restore_batch

    def counting(batch, *a, **kw):
        calls.append(len(batch.names))
        return orig(batch, *a, **kw)

    svc.runner.restore_batch = counting
    futs = [svc.submit(i, mask=m) for i, m in zip(imgs, masks)]
    outs = [f.result(timeout=300) for f in futs]
    svc.close()
    assert all(o.shape == (IMG, IMG, 3) and np.isfinite(o).all() for o in outs)
    # 4 requests through batch-2 programs: at most 3 launches means at least
    # one launch carried 2 coalesced requests
    assert len(calls) <= 3


def test_service_refuses_random_weights(tiny_env):
    """A serving endpoint over the zoo's random-init fallback must hard-fail
    unless explicitly allowed (VERDICT r2: silent-garbage failure mode)."""
    with pytest.raises(RuntimeError, match="random"):
        RestorationService(_cfg(tiny_env), use_mesh=False, service_batch=2)
    with pytest.raises(RuntimeError, match="random"):
        serve_folder(_cfg(tiny_env), str(tiny_env / "testsets" / "tiny"),
                     str(tiny_env / "out"), use_mesh=False)


def test_per_request_operating_point(tiny_env):
    """(lambda, zeta) per request: distinct points give distinct outputs,
    coalesce into ONE batched launch (per-sample runtime arguments), and
    never add compiled programs."""
    svc = RestorationService(_cfg(tiny_env, task="deblur"), use_mesh=False,
                             allow_random_weights=True, service_batch=2,
                             max_wait_ms=200.0)
    rng = np.random.default_rng(7)
    img = rng.random((IMG, IMG, 3)).astype(np.float32)
    k = np.full((5, 5), 1.0 / 25.0, np.float32)

    launches = []
    orig = svc.runner.restore_batch

    def counting(batch, lam=None, zeta=None, **kw):
        launches.append(np.ndim(lam))
        return orig(batch, lam, zeta, **kw)

    svc.runner.restore_batch = counting
    futs = [svc.submit(img, kernel=k, lambda_=lam) for lam in (0.01, 400.0)]
    o_lo, o_hi = (f.result(timeout=600) for f in futs)
    svc.close()
    svc.runner.restore_batch = orig
    assert np.abs(o_lo - o_hi).max() > 1e-3
    # both requests shared one vector-lambda launch
    assert launches == [1], launches
    # and the vector output matches the same points run individually
    s_lo = svc.restore([img], kernels=[k], lambda_=0.01)[0]
    s_hi = svc.restore([img], kernels=[k], lambda_=400.0)[0]
    # (service seeds differ between submit rounds and direct calls; compare
    # through restore() with an explicit shared seed instead)
    v = svc.restore([img, img], kernels=[k, k], lambda_=[0.01, 400.0], seed=9)
    a = svc.restore([img, img], kernels=[k, k], lambda_=0.01, seed=9)
    b = svc.restore([img, img], kernels=[k, k], lambda_=400.0, seed=9)
    np.testing.assert_allclose(v[0], a[0], atol=1e-5)
    np.testing.assert_allclose(v[1], b[1], atol=1e-5)

    # same point, restore() path — zeta override flows too
    r1 = svc.restore([img], kernels=[k], zeta=0.0)[0]
    r2 = svc.restore([img], kernels=[k], zeta=1.0)[0]
    assert np.abs(r1 - r2).max() > 1e-3

    from diffpir_tpu.serve import RequestError
    for bad in (dict(lambda_=-1.0), dict(lambda_=float("nan")),
                dict(zeta=1.5), dict(zeta=-0.1)):
        with pytest.raises(RequestError):
            svc.submit(img, kernel=k, **bad)
    with pytest.raises(RequestError):
        svc.restore([img], kernels=[k], lambda_=[1.0, 2.0])  # 2 lams, 1 img
