#!/usr/bin/env python
"""Production deployment walkthrough: AOT bundle + HTTP serving.

Self-contained (tiny fixture model, no checkpoints needed):

    python examples/deploy_bundle.py [--cpu]

Steps demonstrated:
  1. Export the whole compiled restore trajectory to a StableHLO bundle
     (``diffpir_tpu.export.save_bundle``) — program + params + manifest.
  2. Reload it (``load_bundle``) and restore a batch with NO model code:
     the loaded program replays the runner bit-for-bit.
  3. Serve the same task over HTTP (``diffpir_tpu.server_http``): start an
     in-process server, POST an npz request, read the restored npz back.
"""

import argparse
import io
import json
import os
import sys
import tempfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpir_tpu.config import load_config
    from diffpir_tpu.data import Batch
    from diffpir_tpu.export import load_bundle, save_bundle
    from diffpir_tpu.runner import Runner
    from diffpir_tpu.serve import RestorationService
    from diffpir_tpu.server_http import start_server

    cfg = load_config(None, overrides=dict(
        task="inpaint", model_name="tiny_test", iter_num=5, batch_size=2,
        noise_level_img=0.0, dtype="float32", save_E=False, save_L=False))
    runner = Runner(cfg, use_mesh=False)

    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(2, 32, 32, 3)) > 0.3).astype(np.float32)
    img_L = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32) * mask

    # -- 1. export ---------------------------------------------------------
    bundle_dir = os.path.join(tempfile.mkdtemp(), "bundle")
    platforms = ("cpu",) if args.cpu else ("tpu", "cpu")
    save_bundle(runner, bundle_dir, batch=2, height=32, width=32,
                platforms=platforms, allow_random_weights=True)
    size = os.path.getsize(os.path.join(bundle_dir, "restore.stablehlo.bin"))
    print(f"[1] exported bundle -> {bundle_dir} (program {size/1e3:.0f} kB, "
          f"platforms {platforms})")

    # -- 2. reload + bit-exact replay -------------------------------------
    batch = Batch(img_H=(img_L * 255).astype(np.uint8), img_L=img_L,
                  kernel=np.ones((2, 1, 1), np.float32), mask=mask,
                  names=["a", "b"])
    want = runner.restore_batch(batch, seed=4)
    loaded = load_bundle(bundle_dir)
    got = loaded(img_L, mask=mask, seed=4)
    print(f"[2] reloaded program replays runner: max |diff| = "
          f"{float(np.abs(got - want).max()):.2e}")

    # -- 2b. dynamic operating point ---------------------------------------
    # dynamic_point=True exports (lambda, zeta) as per-sample runtime
    # arguments: one artifact, any operating point at call time
    dyn_dir = os.path.join(tempfile.mkdtemp(), "dyn")
    save_bundle(runner, dyn_dir, batch=2, height=32, width=32,
                dynamic_point=True, platforms=platforms,
                allow_random_weights=True)
    dyn = load_bundle(dyn_dir)
    out = dyn(img_L, mask=mask, seed=4, lambda_=[1.0, 30.0], zeta=0.8)
    print(f"[2b] dynamic-point bundle: per-sample lambda [1, 30] in one "
          f"call -> {out.shape}")

    # -- 3. HTTP serving ---------------------------------------------------
    service = RestorationService(cfg, use_mesh=False, allow_random_weights=True, service_batch=2)
    httpd = start_server(service, port=0)
    host, port = httpd.server_address
    url = f"http://{host}:{port}"
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        print(f"[3] serving on {url}: {json.loads(r.read())}")
    buf = io.BytesIO()
    np.savez(buf, image=img_L[0], mask=mask[0])
    req = urllib.request.Request(url + "/restore", data=buf.getvalue(),
                                 method="POST",
                                 headers={"Content-Type": "application/x-npz"})
    with urllib.request.urlopen(req, timeout=300) as r:
        with np.load(io.BytesIO(r.read())) as z:
            restored = z["restored"]
    print(f"    POST /restore -> {restored.shape} "
          f"(finite: {bool(np.isfinite(restored).all())})")
    httpd.shutdown()
    service.close()


if __name__ == "__main__":
    main()
