"""PyTorch guided-diffusion checkpoint -> Flax parameter converter.

The published DiffPIR checkpoints (``diffusion_ffhq_10m.pt``,
``256x256_diffusion_uncond.pt``, reference ``model_zoo/README.md:4-7``) are raw
``state_dict``s of the torch ``UNetModel`` (reference ``guided_diffusion/unet.py``).
This module maps them key-by-key onto ``diffpir_tpu.models.unet.UNet``'s
parameter tree.  The mapping is purely name-driven (no topology walk): the Flax
module names were chosen to mirror the torch ModuleList indices
(``input_blocks_{i}_{j}`` == ``input_blocks.{i}.{j}``).

Layout conversions:
  * Conv2d  weight (O, I, kH, kW)  -> kernel (kH, kW, I, O)
  * Conv1d  weight (O, I, 1)       -> Dense kernel (I, O)   [attention qkv/proj]
  * Linear  weight (O, I)          -> Dense kernel (I, O)
  * GroupNorm weight/bias          -> scale/bias
The legacy QKV channel layout [head][q|k|v][head_dim] is preserved verbatim —
``unet._legacy_qkv_attention`` consumes exactly that ordering.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

__all__ = ["convert_state_dict", "load_torch_checkpoint", "flax_to_torch_state_dict"]


def _set(tree: Dict[str, Any], path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_RESBLOCK_MAP = {
    ("in_layers", "0"): ("norm1", {"weight": "scale", "bias": "bias"}),
    ("in_layers", "2"): ("conv1", {"weight": "kernel", "bias": "bias"}),
    ("emb_layers", "1"): ("emb_proj", {"weight": "kernel", "bias": "bias"}),
    ("out_layers", "0"): ("norm2", {"weight": "scale", "bias": "bias"}),
    ("out_layers", "3"): ("conv2", {"weight": "kernel", "bias": "bias"}),
    ("skip_connection",): ("skip", {"weight": "kernel", "bias": "bias"}),
}

_ATTN_MAP = {
    ("norm",): ("norm", {"weight": "scale", "bias": "bias"}),
    ("qkv",): ("qkv", {"weight": "kernel", "bias": "bias"}),
    ("proj_out",): ("proj", {"weight": "kernel", "bias": "bias"}),
}

# torch Downsample stores its conv as `.op`, Upsample as `.conv`
# (reference unet.py:98,131)
_SAMPLER_MAP = {
    ("op",): (None, {"weight": "kernel", "bias": "bias"}),
    ("conv",): (None, {"weight": "kernel", "bias": "bias"}),
}


def _convert_tensor(arr: np.ndarray, flax_name: str) -> np.ndarray:
    arr = np.asarray(arr, dtype=np.float32)
    if flax_name == "kernel":
        if arr.ndim == 4:      # Conv2d OIHW -> HWIO
            return arr.transpose(2, 3, 1, 0)
        if arr.ndim == 3:      # Conv1d (O, I, 1) -> Dense (I, O)
            return arr[:, :, 0].T
        if arr.ndim == 2:      # Linear (O, I) -> Dense (I, O)
            return arr.T
        raise ValueError(f"unexpected kernel rank {arr.ndim}")
    return arr


def convert_state_dict(state_dict: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a torch UNetModel state_dict (numpy values) to Flax params."""
    params: Dict[str, Any] = {}
    unconsumed = []
    for key, value in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]  # weight | bias
        head = parts[0]

        if head == "time_embed":
            # time_embed.{0|2}.{weight|bias}
            flax_name = "kernel" if leaf == "weight" else "bias"
            _set(params, (f"time_embed_{parts[1]}", flax_name),
                 _convert_tensor(value, flax_name))
        elif head == "label_emb":
            _set(params, ("label_emb", "embedding"), np.asarray(value, np.float32))
        elif head == "out":
            # output-head families (torch index -> flax module):
            #   diffusion UNet   (unet.py:632-636): 0 GroupNorm -> out_norm,
            #     2 Conv -> out_conv
            #   classifier attention pool (unet.py:832-839): 0 -> out_norm,
            #     2.{positional_embedding,qkv_proj,c_proj} -> out_pool
            #   classifier adaptive (unet.py:822-827): 0 -> out_norm,
            #     3 zero 1x1 Conv -> out_conv as Dense
            #   classifier spatial (unet.py:841-845): 0/2 Linear -> out_0/out_2
            #   classifier spatial_v2 (unet.py:847-853): 0 Linear -> out_0,
            #     1 GroupNorm -> out_norm, 3 Linear -> out_3
            # spatial heads are recognized by out.0.weight being a 2-D Linear
            spatial_head = np.ndim(state_dict.get("out.0.weight")) == 2
            flax_name = "kernel" if leaf == "weight" else "bias"
            norm_name = "scale" if leaf == "weight" else "bias"
            if len(parts) > 2 and parts[2] == "positional_embedding":
                # torch stores (C, T+1); flax param is (T+1, C)
                _set(params, ("out_pool", "positional_embedding"),
                     np.asarray(value, np.float32).T)
            elif len(parts) > 2 and parts[2] in ("qkv_proj", "c_proj"):
                _set(params, ("out_pool", parts[2], flax_name),
                     _convert_tensor(value, flax_name))
            elif spatial_head:
                if parts[1] == "1":      # spatial_v2's GroupNorm
                    _set(params, ("out_norm", norm_name),
                         _convert_tensor(value, norm_name))
                else:
                    _set(params, (f"out_{parts[1]}", flax_name),
                         _convert_tensor(value, flax_name))
            elif parts[1] == "0":
                _set(params, ("out_norm", norm_name),
                     _convert_tensor(value, norm_name))
            elif parts[1] == "3":
                # adaptive pool: zero-init 1x1 conv applied after global mean
                # pooling — the flax head is a Dense, squeeze the 1x1 spatial
                arr = np.asarray(value, np.float32)
                _set(params, ("out_conv", flax_name),
                     arr[:, :, 0, 0].T if arr.ndim == 4 else arr)
            else:
                _set(params, ("out_conv", flax_name), _convert_tensor(value, flax_name))
        elif head in ("input_blocks", "middle_block", "output_blocks"):
            if head == "middle_block":
                module = f"middle_block_{parts[1]}"
                rest = tuple(parts[2:-1])
            else:
                module = f"{head}_{parts[1]}_{parts[2]}"
                rest = tuple(parts[3:-1])
            if not rest:
                # bare conv (input_blocks.0.0, or non-resblock sampler conv)
                flax_name = "kernel" if leaf == "weight" else "bias"
                _set(params, (module, flax_name), _convert_tensor(value, flax_name))
                continue
            for table in (_RESBLOCK_MAP, _ATTN_MAP, _SAMPLER_MAP):
                if rest in table:
                    sub, leafmap = table[rest]
                    flax_name = leafmap[leaf]
                    path = (module, sub, flax_name) if sub else (module, flax_name)
                    _set(params, path, _convert_tensor(value, flax_name))
                    break
            else:
                unconsumed.append(key)
        else:
            unconsumed.append(key)

    if unconsumed:
        raise ValueError(f"unmapped checkpoint keys: {unconsumed[:10]}"
                         f" (+{max(0, len(unconsumed)-10)} more)")
    return params


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a ``.pt`` state_dict from disk and convert to Flax params.

    torch is imported lazily: it is only needed on the host that performs the
    one-time conversion (checkpoints are then cached via orbax, see
    ``diffpir_tpu.models.zoo``).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_state_dict({k: v.numpy() for k, v in sd.items()})


def flax_to_torch_state_dict(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse mapping (for round-trip tests and exporting trained weights).

    Covers the diffusion UNet topologies (both resblock_updown and plain
    conv-resample blocks).  Classifier pool heads other than the diffusion
    out-head layout are forward-only (convert_state_dict supports them all).
    """
    inv_res = {v[0]: k for k, v in _RESBLOCK_MAP.items()}
    inv_attn = {v[0]: k for k, v in _ATTN_MAP.items()}
    out: Dict[str, np.ndarray] = {}

    def unconvert(arr: np.ndarray, flax_name: str, torch_is_conv1d: bool) -> np.ndarray:
        if flax_name != "kernel":
            return np.asarray(arr)
        arr = np.asarray(arr)
        if arr.ndim == 4:
            return arr.transpose(3, 2, 0, 1)
        if torch_is_conv1d:
            return arr.T[:, :, None]
        return arr.T

    for module, sub in params.items():
        if module.startswith("time_embed_"):
            idx = module.split("_")[-1]
            out[f"time_embed.{idx}.weight"] = unconvert(sub["kernel"], "kernel", False)
            out[f"time_embed.{idx}.bias"] = np.asarray(sub["bias"])
        elif module == "label_emb":
            out["label_emb.weight"] = np.asarray(sub["embedding"])
        elif module == "out_norm":
            out["out.0.weight"] = np.asarray(sub["scale"])
            out["out.0.bias"] = np.asarray(sub["bias"])
        elif module == "out_conv":
            out["out.2.weight"] = unconvert(sub["kernel"], "kernel", False)
            out["out.2.bias"] = np.asarray(sub["bias"])
        else:
            # input_blocks_{i}_{j} etc.
            pieces = module.split("_")
            if module.startswith("middle_block"):
                prefix = f"middle_block.{pieces[-1]}"
            else:
                prefix = f"{'_'.join(pieces[:-2])}.{pieces[-2]}.{pieces[-1]}"
            if "kernel" in sub:   # bare conv block
                # restore the torch module nesting: the input stem is a bare
                # conv, but standalone resample convs live inside Downsample
                # (`.op`, unet.py:131) / Upsample (`.conv`, unet.py:98)
                if module == "input_blocks_0_0":
                    tp = prefix
                elif module.startswith("input_blocks"):
                    tp = f"{prefix}.op"
                elif module.startswith("output_blocks"):
                    tp = f"{prefix}.conv"
                else:
                    tp = prefix
                out[f"{tp}.weight"] = unconvert(sub["kernel"], "kernel", False)
                out[f"{tp}.bias"] = np.asarray(sub["bias"])
                continue
            # attention blocks have EXACTLY the {norm, qkv, proj} children
            # (a submodule merely containing a 'qkv' key must not match)
            is_attn = set(sub) == {"norm", "qkv", "proj"}
            for name, leaves in sub.items():
                rest = inv_attn.get(name) if is_attn else inv_res.get(name)
                torch_prefix = f"{prefix}.{'.'.join(rest)}"
                for flax_name, arr in leaves.items():
                    torch_leaf = "weight" if flax_name in ("kernel", "scale") else "bias"
                    out[f"{torch_prefix}.{torch_leaf}"] = unconvert(
                        arr, flax_name, torch_is_conv1d=is_attn and name in ("qkv", "proj"))
    return out
