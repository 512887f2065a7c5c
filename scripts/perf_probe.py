"""Single-forward perf probe: XLA vs Pallas kernels (run on TPU)."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/diffpir_tpu_xla"))
import numpy as np, jax.numpy as jnp
from diffpir_tpu.models.unet import MODEL_ZOO_CONFIGS, UNet

cfg = MODEL_ZOO_CONFIGS["diffusion_ffhq_10m"]
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((8,256,256,3)).astype(np.float32))
t = jnp.zeros((8,), jnp.int32)
for use_pallas in (True, False):
    model = UNet(cfg, dtype=jnp.bfloat16, use_pallas=use_pallas)
    params = model.init(jax.random.PRNGKey(0), x[:1], t[:1])["params"]
    fwd = jax.jit(lambda p, xx, tt: model.apply({"params": p}, xx, tt))
    t0=time.perf_counter()
    out = fwd(params, x, t); _ = np.asarray(out)
    print(f"pallas={use_pallas}: compile+1st {time.perf_counter()-t0:.1f}s", flush=True)
    t0=time.perf_counter()
    outs = [fwd(params, x, jnp.full((8,), i, jnp.int32)) for i in range(20)]
    _ = [np.asarray(o) for o in outs]
    dt=(time.perf_counter()-t0)/20
    print(f"pallas={use_pallas}: {dt*1000:.1f} ms/fwd ({8/dt:.1f} img/s)", flush=True)
