#!/usr/bin/env python
"""Per-op TPU time breakdown of a flagship forward via jax.profiler.

The methodology behind the round-2 GroupNorm/out-head findings
(BASELINE.md): trace N jitted forwards, fold the device-side events by op
category and list the hottest individual fusions with their HLO metadata.
Works through the axon tunnel (device events are real even though wall-clock
fetch latencies are not).

Usage:  python scripts/trace_probe.py [--model diffusion_ffhq_10m]
                                      [--batch 8] [--reps 3] [--hlo]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="diffusion_ffhq_10m")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--hlo", action="store_true",
                    help="also resolve top fusions to HLO op_name metadata")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/diffpir_tpu_xla"))
    import jax.numpy as jnp
    import numpy as np

    from diffpir_tpu.models.unet import MODEL_ZOO_CONFIGS, UNet

    cfg = MODEL_ZOO_CONFIGS[args.model]
    model = UNet(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (args.batch, 256, 256, 3)).astype(np.float32))
    t = jnp.zeros((args.batch,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x[:1], t[:1])["params"]
    fwd = jax.jit(lambda p, xx, tt: model.apply({"params": p}, xx, tt))
    _ = np.asarray(fwd(params, x, t))  # compile + warm

    trace_dir = tempfile.mkdtemp(prefix="diffpir_trace_")
    with jax.profiler.trace(trace_dir):
        outs = [fwd(params, x, jnp.full((args.batch,), i, jnp.int32))
                for i in range(args.reps)]
        _ = [np.asarray(o) for o in outs]

    f = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    tr = json.load(gzip.open(f))
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    cat: collections.Counter = collections.Counter()
    per: collections.Counter = collections.Counter()
    total = 0
    for e in ev:
        if (e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), "")
                and not e["name"].startswith("jit_")):
            base = re.match(r"[a-zA-Z_\-]+", e["name"]).group(0).rstrip(".")
            d = e.get("dur", 0)
            cat[base] += d
            per[e["name"]] += d
            total += d
    n = args.reps
    print(f"{args.model} fwd device time: {total/n/1e3:.1f} ms/call "
          f"(batch {args.batch})")
    print("-- by category --")
    for k, v in cat.most_common(10):
        print(f"  {v/n/1e3:8.2f} ms {100*v/total:5.1f}%  {k}")
    print(f"-- top {args.top} ops --")
    meta = {}
    if args.hlo:
        txt = fwd.lower(params, x, t).compile().as_text()
        for line in txt.splitlines():
            m = re.match(r"\s*%([\w.\-]+) =", line)
            if m:
                om = re.search(r'op_name="([^"]*)"', line)
                if om:
                    meta[m.group(1)] = om.group(1)
    for name, d in per.most_common(args.top):
        extra = f"  <- {meta[name][:70]}" if name in meta else ""
        print(f"  {d/n/1e3:8.2f} ms  {name[:40]}{extra}")


if __name__ == "__main__":
    main()
