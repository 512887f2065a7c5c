"""Model zoo: resolve (config, params) for a model name.

Resolution order for weights:
  1. ``<model_zoo>/<name>.flax.npz``  — cached converted weights (fast path)
  2. ``<model_zoo>/<name>.pt``        — torch checkpoint, converted on the fly
                                        through ``models.convert`` and cached
  3. random init                      — with a loud warning (used by the tiny
                                        test fixtures; full-size models produce
                                        garbage restorations without weights)

The published checkpoints are the OpenAI guided-diffusion ones the reference
uses (``model_zoo/README.md:4-7``: diffusion_ffhq_10m.pt,
256x256_diffusion_uncond.pt, fetched by ``download.sh``).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from diffpir_tpu.models.unet import MODEL_ZOO_CONFIGS, UNet, UNetConfig

__all__ = ["resolve_model", "create_model_and_diffusion", "TINY_TEST_CONFIG",
           "save_params_npz", "load_params_npz", "ResolvedModel",
           "weights_path"]

log = logging.getLogger(__name__)

# Tiny fixture model for end-to-end tests and smoke runs without checkpoints.
# Depth matters even at tiny width: the middle block always carries attention,
# so channel_mult must downsample far enough that 256px inputs reach a small
# middle resolution (256/2^3 = 32 -> 1024 tokens).
TINY_TEST_CONFIG = UNetConfig(
    image_size=64, model_channels=32, out_channels=6, num_res_blocks=1,
    attention_resolutions=(8,), channel_mult=(1, 1, 2, 2), num_heads=4,
    num_head_channels=16, dropout=0.0,
)

# Wider demo prior (~29M params): the 6M tiny config saturates around 42 dB
# on the synthetic demo tasks; this is the next rung of the quality ladder,
# still trainable on one chip in tens of minutes via Trainer.train_steps.
DEMO_HQ_CONFIG = UNetConfig(
    image_size=64, model_channels=128, out_channels=6, num_res_blocks=2,
    attention_resolutions=(8,), channel_mult=(1, 2, 2), num_heads=4,
    num_head_channels=32, dropout=0.0,
)

# 256-px demo prior (~54M params) at the reference's operating point: the
# REAL flagship topology — 6-level channel_mult, attention at ds16 (16² = 256
# tokens) plus the ds32 middle block, num_head_channels=64 — at 3/4 of the
# ffhq flagship width (96 vs 128 channels; `main_ddpir.py:219-224` ffhq
# config).  Every activation SHAPE family of the 95M flagship occurs here, so
# 256-px restorations with a trained prior exercise the exact compute path
# the published checkpoints would use.
DEMO256_CONFIG = UNetConfig(
    image_size=256, model_channels=96, out_channels=6, num_res_blocks=1,
    attention_resolutions=(16,), channel_mult=(1, 1, 2, 2, 4, 4), num_heads=4,
    num_head_channels=64, dropout=0.0,
)

# Grayscale fixture: the reference threads n_channels through every driver
# (main_ddpir.py:139, utils_image.py:147-159 L-mode read); a 1-channel prior
# exercises that path end-to-end (out_channels=2 = eps + learned var).
import dataclasses as _dc

TINY_GRAY_CONFIG = _dc.replace(TINY_TEST_CONFIG, in_channels=1,
                               out_channels=2)

_DEMO_CONFIGS = {"demo64_hq": DEMO_HQ_CONFIG, "demo256": DEMO256_CONFIG,
                 "tiny_gray": TINY_GRAY_CONFIG}


def model_config_for(model_name: str) -> UNetConfig:
    if model_name in MODEL_ZOO_CONFIGS:
        return MODEL_ZOO_CONFIGS[model_name]
    if model_name in _DEMO_CONFIGS:
        return _DEMO_CONFIGS[model_name]
    for k, c in _DEMO_CONFIGS.items():
        # checkpoint variants of a demo arch (e.g. demo256_60k: the same 54M
        # topology at a different training step) share the base config
        if model_name.startswith(k):
            return c
    if model_name.startswith("tiny"):
        return TINY_TEST_CONFIG
    raise KeyError(f"unknown model {model_name!r}; known: "
                   f"{sorted(MODEL_ZOO_CONFIGS) + sorted(_DEMO_CONFIGS) + ['tiny*']}")


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params_npz(params: Dict[str, Any], path: str) -> None:
    np.savez(path, **_flatten(params))


def load_params_npz(path: str) -> Dict[str, Any]:
    """Load a flat params npz; sub-fp32 float storage is upcast to fp32
    (assets may be stored fp16 for size — measured lossless on the demo
    priors — but the fp32 parity paths expect fp32 parameter dtypes)."""
    with np.load(path) as z:
        flat = {}
        for k in z.files:
            v = z[k]
            if v.dtype.kind == "f" and v.dtype.itemsize < 4:
                v = v.astype(np.float32)
            flat[k] = v
        return _unflatten(flat)


def weights_path(model_name: str, model_zoo: str = "model_zoo"):
    """The file ``resolve_model`` would load weights from (None = random).

    Follows the same resolution order (zoo npz unless a newer .pt exists,
    then .pt, then the bundled demo prior).  Lets artifact writers stamp a
    self-describing checkpoint identity (e.g. a content hash) into result
    rows — the npz under a fixed name like ``demo256`` changes as training
    legs land, and committed JSONL must stay attributable (ADVICE r4).
    """
    npz_path = os.path.join(model_zoo, f"{model_name}.flax.npz")
    pt_path = os.path.join(model_zoo, f"{model_name}.pt")
    if os.path.exists(npz_path) and not (
            os.path.exists(pt_path)
            and os.path.getmtime(pt_path) > os.path.getmtime(npz_path)):
        return npz_path
    if os.path.exists(pt_path):
        return pt_path
    demo_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "assets", "demo",
        f"{model_name}.flax.npz")
    if os.path.exists(demo_path):
        return demo_path
    return None


class ResolvedModel(NamedTuple):
    """(module, params) + where the weights came from.

    provenance is one of:
      "cache"      — converted-weights npz cache in the model zoo
      "checkpoint" — torch .pt converted on the fly
      "demo"       — bundled repo-trained demo prior (real trained weights)
      "random"     — fallback random init (test fixtures only; serving and
                     export refuse this unless explicitly allowed)
      "abstract"   — ShapeDtypeStruct tree only (``abstract=True``): nothing
                     materialized; for lowering/sharding validation at full
                     model scale (e.g. the 553M flagship) without the memory
    """

    module: UNet
    params: Dict[str, Any]
    provenance: str


def resolve_model(model_name: str, model_zoo: str = "model_zoo", *,
                  dtype=jnp.float32, use_pallas: bool = False,
                  init_seed: int = 0, abstract: bool = False) -> ResolvedModel:
    """Return ResolvedModel(module, params, provenance) for `model_name`.

    (NamedTuple: destructuring as ``module, params, _`` — or indexing — keeps
    working; callers that must not run on random weights check
    ``.provenance == "random"``.)
    """
    cfg = model_config_for(model_name)
    module = UNet(cfg, dtype=dtype, use_pallas=use_pallas)

    if abstract:
        sample = jax.ShapeDtypeStruct(
            (1, cfg.image_size, cfg.image_size, cfg.in_channels), jnp.float32)
        shapes = jax.eval_shape(module.init, jax.random.PRNGKey(init_seed),
                                sample,
                                jax.ShapeDtypeStruct((1,), jnp.int32))
        return ResolvedModel(module, shapes["params"], "abstract")

    npz_path = os.path.join(model_zoo, f"{model_name}.flax.npz")
    pt_path = os.path.join(model_zoo, f"{model_name}.pt")
    # the cache is only valid if it is at least as new as the checkpoint it
    # was converted from — a freshly downloaded .pt must win over a stale npz
    if os.path.exists(npz_path) and not (
            os.path.exists(pt_path)
            and os.path.getmtime(pt_path) > os.path.getmtime(npz_path)):
        return ResolvedModel(module, load_params_npz(npz_path), "cache")
    if os.path.exists(pt_path):
        from diffpir_tpu.models.convert import load_torch_checkpoint

        log.info("converting %s -> %s", pt_path, npz_path)
        params = load_torch_checkpoint(pt_path)
        try:
            save_params_npz(params, npz_path)
        except OSError:
            log.warning("could not cache converted weights at %s", npz_path)
        return ResolvedModel(module, params, "checkpoint")

    demo_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "assets", "demo",
        f"{model_name}.flax.npz")
    if os.path.exists(demo_path):
        return ResolvedModel(module, load_params_npz(demo_path), "demo")

    log.warning(
        "no checkpoint for %r under %s — using RANDOM weights (test fixtures "
        "only; restorations will be meaningless)", model_name, model_zoo)
    sample = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.in_channels),
                       jnp.float32)
    params = module.init(jax.random.PRNGKey(init_seed), sample,
                         jnp.zeros((1,), jnp.int32))["params"]
    return ResolvedModel(module, params, "random")


def create_model_and_diffusion(model_name: str, model_zoo: str = "model_zoo", *,
                               num_timesteps: int = 1000,
                               noise_schedule: str = "linear",
                               timestep_respacing=None, dtype=jnp.float32,
                               use_pallas: bool = False):
    """(module, params, Diffusion) factory — the ergonomic analogue of
    reference ``script_util.create_model_and_diffusion`` (``script_util.py:74-127``).

    timestep_respacing: None, "ddimN", or section-count string/list (as in
    reference ``respace.space_timesteps``); learned-range epsilon diffusion
    matching the published checkpoints.
    """
    from diffpir_tpu.diffusion import Diffusion, ModelMeanType, ModelVarType
    from diffpir_tpu.schedule import NoiseSchedule, space_timesteps

    module, params, _prov = resolve_model(model_name, model_zoo, dtype=dtype,
                                          use_pallas=use_pallas)
    sched = NoiseSchedule.named(noise_schedule, num_timesteps)
    timestep_map = None
    if timestep_respacing:
        keep = space_timesteps(num_timesteps, timestep_respacing)
        sched, timestep_map = sched.respaced(sorted(keep))
    diffusion = Diffusion(sched, ModelMeanType.EPSILON, ModelVarType.LEARNED_RANGE)
    return module, params, diffusion, timestep_map
