"""HTTP serving frontend: concurrent clients, npz/png bodies, error paths."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from diffpir_tpu.config import load_config
from diffpir_tpu.serve import RestorationService
from diffpir_tpu.server_http import start_server


@pytest.fixture(scope="module")
def server():
    cfg = load_config(None, overrides=dict(
        task="inpaint", model_name="tiny_test", iter_num=2, iter_num_U=1,
        batch_size=2, noise_level_img=0.0, seed=0, dtype="float32",
        save_E=False, save_L=False))
    service = RestorationService(cfg, use_mesh=False, allow_random_weights=True, service_batch=2,
                                 max_wait_ms=40.0)
    httpd = start_server(service, port=0)
    host, port = httpd.server_address
    yield f"http://{host}:{port}", service
    httpd.shutdown()
    service.close()


def _post(url, body, ctype):
    req = urllib.request.Request(url + "/restore", data=body, method="POST",
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.headers.get("Content-Type"), r.read()


def _npz_body(image, mask=None):
    buf = io.BytesIO()
    arrs = {"image": image}
    if mask is not None:
        arrs["mask"] = mask
    np.savez(buf, **arrs)
    return buf.getvalue()


def test_healthz_and_stats(server):
    url, _ = server
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok" and info["task"] == "inpaint"
    with urllib.request.urlopen(url + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert {"requests", "images", "errors", "avg_latency_s"} <= set(stats)


def test_concurrent_npz_requests_coalesce(server):
    url, service = server
    rng = np.random.default_rng(0)
    imgs = [rng.uniform(size=(16, 16, 3)).astype(np.float32) for _ in range(4)]
    masks = [(rng.uniform(size=(16, 16, 3)) > 0.3).astype(np.float32)
             for _ in range(4)]
    results = [None] * 4
    errs = []

    def call(i):
        try:
            ctype, body = _post(url, _npz_body(imgs[i] * masks[i], masks[i]),
                                "application/x-npz")
            assert ctype == "application/x-npz"
            with np.load(io.BytesIO(body)) as z:
                results[i] = z["restored"]
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errs, errs
    for r in results:
        assert r is not None and r.shape == (16, 16, 3)
        assert np.isfinite(r).all()


def test_png_roundtrip(server):
    from PIL import Image

    url, _ = server
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(u8).save(buf, format="PNG")
    ctype, body = _post(url, buf.getvalue(), "image/png")
    assert ctype == "image/png"
    out = np.asarray(Image.open(io.BytesIO(body)))
    assert out.shape == (16, 16, 3)


def test_bad_requests_return_400(server):
    url, _ = server
    # wrong content type
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(url, b"junk", "text/plain")
    assert ei.value.code == 400
    # npz without 'image'
    buf = io.BytesIO()
    np.savez(buf, foo=np.zeros((4, 4, 3), np.float32))
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(url, buf.getvalue(), "application/x-npz")
    assert ei.value.code == 400
    # malformed image shape (validation error from the service)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(url, _npz_body(np.zeros((4, 4), np.float32)), "application/x-npz")
    assert ei.value.code == 400
    # unknown route
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(url + "/nope", b"", "application/x-npz")
    assert ei.value.code == 404


def test_deblur_kernel_request():
    """A deblur service accepts per-request PSF kernels over HTTP."""
    cfg = load_config(None, overrides=dict(
        task="deblur", model_name="tiny_test", iter_num=2, iter_num_U=1,
        batch_size=2, noise_level_img=0.0, seed=0, dtype="float32",
        save_E=False, save_L=False))
    service = RestorationService(cfg, use_mesh=False, allow_random_weights=True, service_batch=2,
                                 max_wait_ms=5.0)
    httpd = start_server(service, port=0)
    try:
        host, port = httpd.server_address
        url = f"http://{host}:{port}"
        rng = np.random.default_rng(2)
        img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        k = np.zeros((5, 5), np.float32)
        k[1:4, 1:4] = 1.0 / 9.0
        buf = io.BytesIO()
        np.savez(buf, image=img, kernel=k)
        ctype, body = _post(url, buf.getvalue(), "application/x-npz")
        with np.load(io.BytesIO(body)) as z:
            out = z["restored"]
        assert out.shape == (16, 16, 3) and np.isfinite(out).all()
        # unnormalized PSF must be rejected before dispatch
        buf = io.BytesIO()
        np.savez(buf, image=img, kernel=k * 3.0)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url, buf.getvalue(), "application/x-npz")
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        service.close()


def test_stats_progress(server):
    url, _ = server
    with urllib.request.urlopen(url + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 5
    assert stats["errors"] >= 3
    # latency percentiles (VERDICT r2 item 6): present once >=1 request
    # succeeded, ordered, and consistent with the recent-window definition
    assert {"p50_latency_s", "p95_latency_s", "p99_latency_s",
            "latency_window"} <= set(stats)
    assert 0.0 < stats["p50_latency_s"] <= stats["p95_latency_s"] \
        <= stats["p99_latency_s"]
    assert stats["latency_window"] <= stats["requests"]


def test_stats_percentiles_unit():
    """_Stats percentile math, incl. ring-buffer windowing, without a server."""
    from diffpir_tpu.server_http import _Stats

    st = _Stats(window=4)
    assert "p50_latency_s" not in st.snapshot()
    for v in (0.1, 0.2, 0.3, 0.4):
        st.record(1, v)
    s = st.snapshot()
    assert s["p50_latency_s"] == pytest.approx(0.25)
    assert s["p99_latency_s"] == pytest.approx(0.397)
    assert s["avg_latency_s"] == pytest.approx(0.25)
    # window evicts the oldest sample; the all-time mean keeps it
    st.record(1, 0.5)
    s = st.snapshot()
    assert s["latency_window"] == 4
    assert s["p50_latency_s"] == pytest.approx(0.35)
    assert s["avg_latency_s"] == pytest.approx(0.3)


def test_oversized_body_rejected_with_413():
    """Bodies beyond max_body_bytes are refused BEFORE the read —
    Content-Length is attacker-controlled and threads are per-connection."""
    cfg = load_config(None, overrides=dict(
        task="inpaint", model_name="tiny_test", iter_num=2, iter_num_U=1,
        batch_size=2, noise_level_img=0.0, seed=0, dtype="float32",
        save_E=False, save_L=False))
    service = RestorationService(cfg, use_mesh=False, service_batch=2,
                                 allow_random_weights=True)
    httpd = start_server(service, port=0, max_body_bytes=64)
    host, port = httpd.server_address
    try:
        body = _npz_body(np.zeros((8, 8, 3), np.float32))
        assert len(body) > 64
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(f"http://{host}:{port}", body, "application/x-npz")
        assert err.value.code == 413
    finally:
        httpd.shutdown()
        service.close()


def test_query_param_operating_point(server):
    """?lambda=&zeta= set the request's operating point; bad values are 400."""
    url, service = server
    rng = np.random.default_rng(5)
    img = rng.random((32, 32, 3)).astype(np.float32)
    mask = (rng.random((32, 32, 3)) > 0.5).astype(np.float32)
    body = _npz_body(img * mask, mask=mask)
    size_before = service.runner._restore_jit["fn"]._cache_size() \
        if service.runner._restore_jit else 0

    # zeta changes the renoise mix -> output must differ; same program serves
    outs = []
    for q in ("?lambda=7.0&zeta=0.0", "?lambda=7.0&zeta=1.0"):
        req = urllib.request.Request(url + "/restore" + q, data=body,
                                     method="POST",
                                     headers={"Content-Type": "application/x-npz"})
        with urllib.request.urlopen(req, timeout=300) as r:
            with np.load(io.BytesIO(r.read())) as z:
                outs.append(np.asarray(z["restored"]))
    assert np.abs(outs[0] - outs[1]).max() > 1e-3
    # other tests may have compiled other request SHAPES on this shared
    # service; the two operating points must not have added any entry beyond
    # (at most) this test's own 32x32 shape
    grew = service.runner._restore_jit["fn"]._cache_size() - size_before
    assert grew <= 1

    req = urllib.request.Request(url + "/restore?lambda=bogus", data=body,
                                 method="POST",
                                 headers={"Content-Type": "application/x-npz"})
    try:
        urllib.request.urlopen(req, timeout=60)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
