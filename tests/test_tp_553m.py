"""EXECUTED tensor-parallel restore at the 553M flagship topology.

VERDICT r3 item 4: the dp x tp path had only been *lowered* at 553M shape
(sharding-propagation validation); this actually runs it.  The model is the
exact ``256x256_diffusion_uncond`` topology — the reference's biggest
checkpoint (``guided_diffusion/script_util.py:148-158``: 256ch, 2 res blocks,
attention at ds 8/16/32, channel_mult (1,1,2,2,4,4), 553M params) — executed
at 32 px spatial size (attention_resolutions are downsample RATES, so the
topology, per-layer channel/head structure, and parameter count are
spatial-size-invariant; only the activation grid shrinks to fit CPU compute).

Gated behind DIFFPIR_RUN_553M=1: materializes 553M fp32 params twice and runs
a GSPMD-partitioned restore on the 8-device virtual mesh — minutes of
single-core CPU time, too heavy for the default suite.  Executed results are
recorded in BASELINE.md (round 4).
"""

import os
import time

import numpy as np
import pytest

from diffpir_tpu.config import load_config
from diffpir_tpu.data import Batch
from diffpir_tpu.runner import Runner

pytestmark = pytest.mark.skipif(
    not os.environ.get("DIFFPIR_RUN_553M"),
    reason="heavy: 2x 553M fp32 params on the virtual CPU mesh "
           "(set DIFFPIR_RUN_553M=1)")

H = 32
B = 4


def _overrides(**extra):
    o = dict(task="inpaint", model_name="256x256_diffusion_uncond",
             iter_num=2, iter_num_U=1, batch_size=B, noise_level_img=0.0,
             seed=0, dtype="float32", save_L=False, save_E=False)
    o.update(extra)
    return o


def test_553m_topology_dp_x_tp_executes_with_parity():
    rng = np.random.default_rng(0)
    img_H = rng.integers(0, 256, (B, H, H, 3)).astype(np.uint8)
    mask = (rng.uniform(size=img_H.shape) > 0.5).astype(np.float32)
    batch = Batch(img_H=img_H,
                  img_L=(img_H.astype(np.float32) * mask / 255.0),
                  kernel=np.ones((B, 1, 1), np.float32), mask=mask,
                  names=[f"im{i}" for i in range(B)])

    # single-device reference (same deterministic random init per model name)
    r0 = Runner(load_config(None, overrides=_overrides()), use_mesh=False)
    n_params = sum(int(np.prod(p.shape))
                   for p in __import__("jax").tree_util.tree_leaves(r0.params))
    assert n_params > 5.4e8, f"not the 553M topology ({n_params/1e6:.0f}M)"
    t0 = time.perf_counter()
    out0 = r0.restore_batch(batch)
    t_ref = time.perf_counter() - t0
    del r0  # free the replicated copy before building the sharded one

    # dp x tp: (data=2, model=4) mesh, Megatron-style parameter sharding
    r_tp = Runner(load_config(None, overrides=_overrides(mesh_shape=(2, 4))),
                  use_mesh=True)
    assert r_tp.mesh is not None and r_tp.mesh.shape["model"] == 4
    t0 = time.perf_counter()
    out_tp = r_tp.restore_batch(batch)
    t_tp = time.perf_counter() - t0

    assert out_tp.shape == img_H.shape
    np.testing.assert_allclose(out_tp, out0, rtol=0, atol=2e-4)
    print(f"\n553M ({n_params/1e6:.1f}M params) {H}px restore, iter_num=2: "
          f"single-device {t_ref:.1f}s, dp x tp (2x4) {t_tp:.1f}s "
          f"(incl. compile), max |diff| = "
          f"{float(np.max(np.abs(out_tp - out0))):.2e}")
