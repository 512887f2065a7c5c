"""Tensor-parallel (Megatron-style) parameter sharding for the UNet.

The reference has no model parallelism at all — its 553M-parameter
``256x256_diffusion_uncond`` checkpoint must fit one GPU
(``guided_diffusion/dist_util.py`` only replicates for data-parallel
training).  On TPU, a pod slice makes intra-model sharding natural: we
annotate the parameter tree with ``PartitionSpec``s over a ``"model"`` mesh
axis and let GSPMD partition every matmul/conv and insert the collectives
(which ride ICI).  Combined with the existing ``"data"`` axis this gives
dp x tp inference from one config key (``mesh_shape: [D, M]``).

The sharding scheme is the conv analogue of Megatron-LM's column/row split
(Shoeybi et al. 2019), chosen so everything between the block boundary
reductions stays shard-local:

ResBlock (reference ``unet.py:143-256``):
  * ``conv1``  column-parallel: kernel (kh, kw, Cin, Cout) sharded on Cout.
  * ``emb_proj`` ROW-parallel (kernel sharded on the time-embedding input
    dim): its replicated (B, 2C) output splits into FiLM scale/shift halves
    that GSPMD slices locally against the C-sharded activation.  Column
    sharding the fused 2C output would misalign with the halves split
    ([scale|shift] blocks vs contiguous 2C/n shards) and force a reshard;
    the row form costs only a (B, 2C)-sized psum — bytes, not activations.
  * ``norm2`` scale/bias sharded on C.  GroupNorm(32) statistics stay
    shard-local because groups are contiguous channel blocks: with
    ``32 % n_model == 0`` every group lives entirely on one shard.
  * ``conv2``  row-parallel: kernel sharded on Cin; GSPMD inserts the psum —
    the block's one activation-sized reduction.
  * ``norm1`` / ``skip`` replicated (they act on the block's replicated input).

AttentionBlock (reference ``unet.py:259-305``): the legacy QKV layout is
head-major ([head][q|k|v][ch], ``unet.py:328-354``), so sharding the fused
``qkv`` output dim on ``"model"`` is exactly head parallelism when
``num_heads % n_model == 0`` — attention math is then fully shard-local and
the ``proj`` row-parallel matmul does the one psum.

Blocks whose channel/head counts don't divide the mesh axis fall back to
replicated parameters — always correct, only less sharded.  GSPMD would also
accept uneven shardings, but the fallback keeps layouts padding-free.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffpir_tpu.models.unet import UNetConfig

__all__ = ["unet_tp_specs", "shard_unet_params", "tp_param_report"]

_REPLICATED = P()


def _replicate_tree(sub) -> Any:
    if isinstance(sub, dict):
        return {k: _replicate_tree(v) for k, v in sub.items()}
    return _REPLICATED


def _resblock_specs(sub: Dict[str, Any], n_model: int, axis: str) -> Dict[str, Any]:
    out_ch = sub["conv1"]["kernel"].shape[-1]
    # groups must be whole per shard: 32 groups of out_ch/32 contiguous
    # channels, shards of out_ch/n contiguous channels
    if out_ch % n_model or 32 % n_model:
        return _replicate_tree(sub)
    specs: Dict[str, Any] = {
        "norm1": _replicate_tree(sub["norm1"]),
        "conv1": {"kernel": P(None, None, None, axis), "bias": P(axis)},
        "emb_proj": {"kernel": P(axis, None), "bias": _REPLICATED},
        "norm2": {"scale": P(axis), "bias": P(axis)},
        "conv2": {"kernel": P(None, None, axis, None), "bias": _REPLICATED},
    }
    if sub["emb_proj"]["kernel"].shape[0] % n_model:
        specs["emb_proj"] = _replicate_tree(sub["emb_proj"])
    if "skip" in sub:
        specs["skip"] = _replicate_tree(sub["skip"])
    return specs


def _attention_specs(sub: Dict[str, Any], cfg: UNetConfig, n_model: int,
                     axis: str) -> Dict[str, Any]:
    ch = sub["qkv"]["kernel"].shape[0]
    heads = cfg.heads_for(ch)
    if heads % n_model:
        return _replicate_tree(sub)
    return {
        "norm": _replicate_tree(sub["norm"]),
        "qkv": {"kernel": P(None, axis), "bias": P(axis)},
        "proj": {"kernel": P(axis, None), "bias": _REPLICATED},
    }


# exact submodule-name sets, mirroring models/convert.py's strict detection:
# a module merely *containing* a qkv/conv1 key must not match, or the spec
# tree's structure would diverge from the param tree's
_ATTN_KEYS = frozenset({"norm", "qkv", "proj"})
_RES_KEYS = frozenset({"norm1", "conv1", "emb_proj", "norm2", "conv2"})
_RES_KEYS_SKIP = _RES_KEYS | {"skip"}


def unet_tp_specs(params: Dict[str, Any], cfg: UNetConfig, n_model: int,
                  axis: str = "model") -> Dict[str, Any]:
    """PartitionSpec tree matching ``params`` (output of ``UNet.init``)."""
    specs: Dict[str, Any] = {}
    for name, sub in params.items():
        keys = frozenset(sub) if isinstance(sub, dict) else None
        if keys == _ATTN_KEYS:
            specs[name] = _attention_specs(sub, cfg, n_model, axis)
        elif keys in (_RES_KEYS, _RES_KEYS_SKIP):
            specs[name] = _resblock_specs(sub, n_model, axis)
        else:
            # input_blocks_0_0 / time_embed_* / out_norm / out_conv /
            # label_emb / plain resample convs: small, replicated
            specs[name] = _replicate_tree(sub)
    return specs


def shard_unet_params(params: Dict[str, Any], mesh: Mesh, cfg: UNetConfig,
                      axis: str = "model") -> Dict[str, Any]:
    """Place ``params`` on ``mesh`` with Megatron-style TP over ``axis``."""
    n_model = mesh.shape[axis]
    specs = unet_tp_specs(params, cfg, n_model, axis)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)


def tp_param_report(params: Dict[str, Any], cfg: UNetConfig,
                    n_model: int, axis: str = "model") -> dict:
    """{'total', 'sharded', 'fraction'} parameter counts under the TP specs."""
    specs = unet_tp_specs(params, cfg, n_model, axis)
    leaves = jax.tree_util.tree_leaves(params)
    flat_specs = jax.tree_util.tree_structure(params).flatten_up_to(specs)
    total = sum(int(p.size) for p in leaves)
    sharded = sum(int(p.size) for p, s in zip(leaves, flat_specs)
                  if any(d is not None for d in s))
    return {"total": total, "sharded": sharded,
            "fraction": sharded / max(total, 1)}
