"""Batch-size throughput scaling probe (run on TPU)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/diffpir_tpu_xla"))
import jax.numpy as jnp
import numpy as np

from diffpir_tpu.models.unet import MODEL_ZOO_CONFIGS, UNet

cfg = MODEL_ZOO_CONFIGS["diffusion_ffhq_10m"]
model = UNet(cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
x1 = jnp.zeros((1, 256, 256, 3))
params = model.init(jax.random.PRNGKey(0), x1, jnp.zeros((1,), jnp.int32))["params"]
fwd = jax.jit(lambda p, xx, tt: model.apply({"params": p}, xx, tt))

for b in (1, 4, 8, 16, 32):
    x = jnp.asarray(rng.standard_normal((b, 256, 256, 3)).astype(np.float32))
    t = jnp.zeros((b,), jnp.int32)
    _ = np.asarray(fwd(params, x, t))
    n = max(20 // max(b // 8, 1), 6)
    t0 = time.perf_counter()
    outs = [fwd(params, x, jnp.full((b,), i, jnp.int32)) for i in range(n)]
    _ = [np.asarray(o) for o in outs]
    dt = (time.perf_counter() - t0) / n
    print(f"batch {b:3d}: {dt*1000:7.1f} ms/fwd  {b/dt:7.1f} img/s", flush=True)
