"""Serving from an exported AOT bundle (no Runner, no JIT at boot).

VERDICT r3 item 3: a fresh serving process must be able to boot from the
``export.save_bundle`` artifact alone — ``RestorationService(bundle_path=...)``
backs ``restore``/``submit`` with ``LoadedRestore`` instead of compiling a
Runner, and a ``save_aot`` native-executable sidecar removes even the
backend compile.  The reference has no serving/deployment story at all
(SURVEY.md §0).
"""

import numpy as np
import pytest

import diffpir_tpu.serve as serve_mod
from diffpir_tpu.config import load_config
from diffpir_tpu.export import LoadedRestore, save_bundle
from diffpir_tpu.runner import Runner
from diffpir_tpu.serve import RequestError, RestorationService

IMG = 32
B = 2


def _cfg(**over):
    o = dict(task="inpaint", model_name="tiny_test", iter_num=2, iter_num_U=1,
             batch_size=B, seed=0, save_E=False, save_L=False,
             dtype="float32", noise_level_img=0, recover_known=True)
    o.update(over)
    return load_config(None, o)


@pytest.fixture(scope="module")
def bundle_env(tmp_path_factory):
    """One tiny dynamic-point bundle + the Runner that produced it."""
    td = tmp_path_factory.mktemp("bundle")
    cfg = _cfg()
    runner = Runner(cfg, use_mesh=False)
    path = save_bundle(runner, str(td / "art"), batch=B, height=IMG,
                       width=IMG, platforms=("cpu",), dynamic_point=True,
                       allow_random_weights=True)
    rng = np.random.default_rng(0)
    imgs = rng.random((B, IMG, IMG, 3)).astype(np.float32)
    masks = (rng.random((B, IMG, IMG, 3)) > 0.5).astype(np.float32)
    return cfg, runner, path, imgs, masks


def _poison_runner(monkeypatch):
    def boom(*a, **k):
        raise AssertionError("Runner constructed in bundle mode")

    monkeypatch.setattr(serve_mod, "Runner", boom)


def test_bundle_service_boots_without_runner_and_matches_live(
        bundle_env, monkeypatch):
    cfg, runner, path, imgs, masks = bundle_env
    _poison_runner(monkeypatch)
    svc = RestorationService(bundle_path=path)
    assert svc.runner is None
    assert svc.batch == B
    # manifest-synthesized config drives the HTTP manifest fields
    assert svc.cfg.task == "inpaint" and svc.cfg.iter_num == 2

    outs = svc.restore(list(imgs), masks=list(masks), seed=0)
    assert len(outs) == B and outs[0].shape == (IMG, IMG, 3)

    # parity vs the live (Runner) service on the same requests + seed
    monkeypatch.undo()
    live = RestorationService(cfg, use_mesh=False, service_batch=B,
                              allow_random_weights=True)
    want = live.restore(list(imgs), masks=list(masks), seed=0)
    np.testing.assert_allclose(np.stack(outs), np.stack(want), atol=2e-5)


def test_bundle_service_pads_small_requests(bundle_env, monkeypatch):
    _, _, path, imgs, masks = bundle_env
    _poison_runner(monkeypatch)
    svc = RestorationService(bundle_path=path)
    small = imgs[0][: IMG - 5, : IMG - 3]
    out = svc.restore([small], masks=[masks[0][: IMG - 5, : IMG - 3]])
    assert out[0].shape == (IMG - 5, IMG - 3, 3)
    with pytest.raises(RequestError, match="exceeds the bundle"):
        svc.restore([np.zeros((IMG + 1, IMG, 3), np.float32)])


def test_bundle_service_per_request_operating_point(bundle_env, monkeypatch):
    _, _, path, imgs, masks = bundle_env
    _poison_runner(monkeypatch)
    svc = RestorationService(bundle_path=path, max_wait_ms=200.0)
    try:
        futs = [svc.submit(imgs[i], mask=masks[i], lambda_=5.0 + i)
                for i in range(B)]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        svc.close()
    assert all(np.isfinite(o).all() and o.shape == (IMG, IMG, 3)
               for o in outs)


def test_fixed_point_bundle_rejects_operating_point_override(
        tmp_path, monkeypatch):
    cfg = _cfg()
    runner = Runner(cfg, use_mesh=False)
    path = save_bundle(runner, str(tmp_path / "fixed"), batch=B, height=IMG,
                       width=IMG, platforms=("cpu",), dynamic_point=False,
                       allow_random_weights=True)
    _poison_runner(monkeypatch)
    svc = RestorationService(bundle_path=path)
    img = np.zeros((IMG, IMG, 3), np.float32)
    with pytest.raises(RequestError, match="bakes its operating point"):
        svc.restore([img] * B, lambda_=2.0)
    with pytest.raises(RequestError, match="bakes its operating point"):
        svc.submit(img, zeta=0.5)


def test_aot_sidecar_roundtrip(bundle_env):
    """save_aot writes a native executable; a fresh load uses it and matches."""
    _, _, path, imgs, masks = bundle_env
    base = LoadedRestore(path, use_aot=False)
    assert base._aot is None
    sidecar = base.save_aot()
    assert sidecar.endswith(".bin")

    fresh = LoadedRestore(path)  # picks the sidecar up automatically
    assert fresh._aot is not None
    # an AOT-hit boot must NOT pay the StableHLO deserialize (lazy) and the
    # phase breakdown must record what it did pay (cold_start_probe reads it)
    assert "aot_deserialize_s" in fresh.boot_timings
    assert "program_deserialize_s" not in fresh.boot_timings
    assert "params_load_s" in fresh.boot_timings
    got = fresh(imgs, mask=masks, seed=0)
    want = base(imgs, mask=masks, seed=0)
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert "program_deserialize_s" not in fresh.boot_timings  # still lazy
    # the program is still reachable on demand (e.g. for a later save_aot)
    assert fresh._exported is not None
    assert "program_deserialize_s" in fresh.boot_timings

    svc = RestorationService(bundle_path=path)
    assert svc.loaded._aot is not None  # serving boots on the sidecar too


def test_server_http_boots_from_bundle(bundle_env, monkeypatch):
    """--bundle end to end: healthz manifest + one npz restore round-trip."""
    import io
    import urllib.request

    from diffpir_tpu.server_http import start_server

    _, _, path, imgs, masks = bundle_env
    _poison_runner(monkeypatch)
    svc = RestorationService(bundle_path=path, max_wait_ms=50.0)
    httpd = start_server(svc, port=0)
    try:
        port = httpd.server_address[1]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            import json

            man = json.loads(r.read())
        assert man["task"] == "inpaint" and man["batch"] == B
        body = io.BytesIO()
        np.savez(body, image=imgs[0], mask=masks[0])
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/restore", data=body.getvalue(),
            headers={"Content-Type": "application/x-npz"})
        with urllib.request.urlopen(req, timeout=300) as r:
            with np.load(io.BytesIO(r.read())) as z:
                restored = z["restored"]
        assert restored.shape == (IMG, IMG, 3)
        assert np.isfinite(restored).all()
    finally:
        httpd.shutdown()
        svc.close()
