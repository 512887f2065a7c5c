#!/usr/bin/env python
"""Serving cold start: fresh-process time-to-first-restore, three boot modes.

VERDICT r3 item 3's measurement: a production replica that (re)boots should
not pay a ~9-minute JIT compile before its first response.  Compares, each in
a FRESH subprocess with a FRESH (empty) XLA persistent-cache dir — i.e. a
genuinely cold process on a warm-hardware host:

  * jit     — build a Runner from the YAML config and restore one batch
              (what RestorationService(cfg) does at boot): pays trace +
              lowering + backend compile.
  * bundle  — RestorationService-style boot from the exported StableHLO
              artifact (LoadedRestore, use_aot=False): no model code, no
              trace; still pays the backend compile of the deserialized
              program.
  * aot     — bundle + native-executable sidecar (LoadedRestore.save_aot):
              deserializes a ready PJRT executable; no XLA at all.

The parent exports the bundle once and runs save_aot once (the timed
deploy-step compile).  Prints one JSON line per mode.

Usage: python scripts/cold_start_probe.py [--model demo256] [--nfe 100]
           [--batch 1] [--hw 256] [--keep DIR] [--cpu] [--modes jit bundle aot]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD = """
import json, os, sys, time
import numpy as np
t_proc0 = time.perf_counter()
import jax
if {cpu!r}:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {cache!r})  # EMPTY dir: cold
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
mode = {mode!r}
t0 = time.perf_counter()
if mode == "jit":
    from diffpir_tpu.config import load_config
    from diffpir_tpu.runner import Runner
    from diffpir_tpu.data import Batch
    cfg = load_config({config!r}, overrides=dict(
        model_name={model!r}, batch_size={batch}, iter_num={nfe},
        save_E=False, save_L=False, log_process=False))
    runner = Runner(cfg, use_mesh=False)
    rng = np.random.default_rng(0)
    B, H = {batch}, {hw}
    mask = (rng.uniform(size=(B, H, H, 3)) > 0.5).astype(np.float32)
    batch = Batch(img_H=np.zeros((B, H, H, 3), np.uint8),
                  img_L=(rng.random((B, H, H, 3)).astype(np.float32) * mask),
                  kernel=np.ones((B, 1, 1), np.float32), mask=mask,
                  names=["x"] * B)
    out = runner.restore_batch(batch, seed=0)
else:
    phases = {{"jax_import_s": round(t0 - t_proc0, 2)}}
    t = time.perf_counter()
    from diffpir_tpu.export import LoadedRestore
    phases["diffpir_import_s"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    loaded = LoadedRestore({bundle!r}, use_aot=(mode == "aot"))
    phases["boot_s"] = round(time.perf_counter() - t, 2)
    phases.update(loaded.boot_timings)  # manifest/aot-deserialize/params/...
    assert (loaded._aot is not None) == (mode == "aot"), "sidecar state wrong"
    rng = np.random.default_rng(0)
    B, H = {batch}, {hw}
    mask = (rng.uniform(size=(B, H, H, 3)) > 0.5).astype(np.float32)
    t = time.perf_counter()
    out = loaded(rng.random((B, H, H, 3)).astype(np.float32) * mask,
                 mask=mask, seed=0, fetch=False)
    phases["first_dispatch_s"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    out = np.asarray(out)  # on the axon tunnel THIS is where execution lands
    phases["first_fetch_s"] = round(time.perf_counter() - t, 2)
    phases.update(loaded.boot_timings)  # lazy program deserialize (bundle
    # mode pays it inside first_dispatch_s; surface the split regardless)
out = np.asarray(out)
assert np.isfinite(out).all()
row = {{"mode": mode, "first_restore_s": round(time.perf_counter() - t0, 2),
       "process_total_s": round(time.perf_counter() - t_proc0, 2),
       "checksum": round(float(np.mean(out)), 6)}}
if mode != "jit":
    row["phases"] = phases
print(json.dumps(row))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="demo256")
    ap.add_argument("--config", default="configs/demo256_inpaint.yaml")
    ap.add_argument("--nfe", type=int, default=100)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--modes", nargs="+", default=["jit", "bundle", "aot"],
                    choices=["jit", "bundle", "aot"])
    ap.add_argument("--keep", default=None,
                    help="bundle dir to reuse/keep (default: temp)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--allow-random-weights", action="store_true",
                    help="smoke tests with fixture models only")
    ap.add_argument("--timeout", type=float, default=3600.0)
    args = ap.parse_args()

    # NOTE: the parent must never initialize a jax backend — only one process
    # may hold the TPU, and the timing children below need it.  The deploy
    # step (export + save_aot) therefore runs in its own subprocess that has
    # exited before any timing child starts.
    tmp = None
    bundle = args.keep
    if bundle is None:
        tmp = tempfile.TemporaryDirectory()
        bundle = os.path.join(tmp.name, "bundle")

    if not os.path.exists(os.path.join(bundle, "manifest.json")):
        deploy = f"""
import time
import jax
if {bool(args.cpu)!r}:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  {os.path.expanduser("~/.cache/diffpir_tpu_xla")!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from diffpir_tpu.config import load_config
from diffpir_tpu.export import LoadedRestore, save_bundle
from diffpir_tpu.runner import Runner
cfg = load_config({args.config!r}, overrides=dict(
    model_name={args.model!r}, batch_size={args.batch}, iter_num={args.nfe},
    save_E=False, save_L=False, log_process=False))
runner = Runner(cfg, use_mesh=False)
t0 = time.perf_counter()
save_bundle(runner, {bundle!r}, batch={args.batch}, height={args.hw},
            width={args.hw}, platforms=(jax.default_backend(),),
            allow_random_weights={args.allow_random_weights!r})
print(f"exported bundle in {{time.perf_counter() - t0:.1f}}s "
      f"(trace+lower, no backend compile)", flush=True)
if {("aot" in args.modes)!r}:
    t0 = time.perf_counter()
    LoadedRestore({bundle!r}, use_aot=False).save_aot()
    print(f"save_aot (deploy-step compile): "
          f"{{time.perf_counter() - t0:.1f}}s", flush=True)
"""
        proc = subprocess.run([sys.executable, "-c", deploy],
                              capture_output=True, text=True,
                              timeout=args.timeout,
                              cwd=os.path.dirname(os.path.dirname(
                                  os.path.abspath(__file__))))
        sys.stdout.write(proc.stdout)
        if proc.returncode != 0:
            raise RuntimeError(f"deploy step failed:\n{proc.stderr[-2000:]}")

    for mode in args.modes:
        cache = tempfile.mkdtemp(prefix=f"coldcache_{mode}_")
        code = _CHILD.format(cpu=bool(args.cpu), cache=cache, mode=mode,
                             config=args.config, model=args.model,
                             batch=args.batch, nfe=args.nfe, hw=args.hw,
                             bundle=bundle)
        t0 = time.perf_counter()
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=args.timeout,
                              cwd=os.path.dirname(os.path.dirname(
                                  os.path.abspath(__file__))))
        if proc.returncode != 0:
            print(f"mode {mode} FAILED:\n{proc.stderr[-1500:]}",
                  file=sys.stderr)
            continue
        row = json.loads(proc.stdout.strip().splitlines()[-1])
        row["wall_s"] = round(time.perf_counter() - t0, 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
