"""Checkpoint save/load + torch-checkpoint import.

Rebuilds the reference's checkpoint story (SURVEY §5): per-epoch
``{epoch, model_state_dict, optimizer_state_dict}`` torch saves
(reference modules/ar/utils/train.py:213-217) and the DataParallel
``.module``-prefix strip on load (reference ar.py:17-19,
compute_fsos.py:53-59).

Native format: flax msgpack (``to_bytes``/``from_bytes``) + a JSON sidecar —
no pickle on the load path. Torch import maps the reference's TRXOS state
dict onto this framework's parameter tree for checkpoint portability.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization


def save_checkpoint(directory: str, step: int, tree: Any, meta: Optional[Dict] = None) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{step}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))
    with open(os.path.join(directory, f"{step}.json"), "w") as f:
        json.dump({"step": step, **(meta or {})}, f)
    return path


def load_checkpoint(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(f.split(".")[0])
        for f in os.listdir(directory)
        if f.endswith(".msgpack") and f.split(".")[0].isdigit()
    ]
    if not steps:
        return None
    return os.path.join(directory, f"{max(steps)}.msgpack")


# ------------------------------------------------------------- torch import


def strip_dataparallel(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Remove DataParallel '.module' infixes (reference ar.py:17-19)."""
    return {k.replace(".module", ""): v for k, v in state_dict.items()}


def _t2n(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _dense(sd, prefix):
    return {"kernel": _t2n(sd[f"{prefix}.weight"]).T, "bias": _t2n(sd[f"{prefix}.bias"])}


def import_trxos_torch(state_dict: Dict[str, Any], input_type: str = "skeleton") -> Dict[str, Any]:
    """Map the reference TRXOS torch state dict (reference
    modules/ar/utils/model.py parameter names) onto this framework's
    flax param tree (models/trx.py). Skeleton branch + transformer +
    discriminator; the RGB ResNet is imported via import_resnet_torch.
    """
    sd = strip_dataparallel(state_dict)
    params: Dict[str, Any] = {}
    if input_type in ("skeleton", "hybrid"):
        params["sk_extractor"] = {
            "fc1": _dense(sd, "features_extractor.sk.fc1"),
            "fc2": _dense(sd, "features_extractor.sk.fc2"),
        }
    params["transformer"] = {
        "k_linear": _dense(sd, "transformers.0.k_linear"),
        "v_linear": _dense(sd, "transformers.0.v_linear"),
        "norm_k": {
            "scale": _t2n(sd["transformers.0.norm_k.weight"]),
            "bias": _t2n(sd["transformers.0.norm_k.bias"]),
        },
    }
    if "discriminator.dimensionality_reduction.weight" in sd:
        params["discriminator"] = {
            "reduce": _dense(sd, "discriminator.dimensionality_reduction"),
            "fc1": _dense(sd, "discriminator.fc1"),
            "fc2": _dense(sd, "discriminator.fc2"),
            "fc3": _dense(sd, "discriminator.fc3"),
        }
    return {"params": params}


def import_resnet_torch(state_dict: Dict[str, Any], stage_sizes=(3, 4, 6, 3)) -> Dict[str, Any]:
    """Map a torchvision ResNet state dict onto models/resnet.py params
    (NCHW conv weights -> HWIO; BN running stats -> batch_stats)."""
    sd = strip_dataparallel(state_dict)

    def conv(name):
        return {"kernel": _t2n(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}

    def bn(name):
        return (
            {"scale": _t2n(sd[f"{name}.weight"]), "bias": _t2n(sd[f"{name}.bias"])},
            {"mean": _t2n(sd[f"{name}.running_mean"]), "var": _t2n(sd[f"{name}.running_var"])},
        )

    params: Dict[str, Any] = {"conv1": conv("conv1")}
    stats: Dict[str, Any] = {}
    params["bn1"], stats["bn1"] = bn("bn1")

    bottleneck = any(k.startswith("layer1.0.conv3") for k in sd)
    convs = ("conv1", "conv2", "conv3") if bottleneck else ("conv1", "conv2")
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            t = f"layer{i+1}.{j}"
            f = f"layer{i+1}_{j}"
            blk_p: Dict[str, Any] = {}
            blk_s: Dict[str, Any] = {}
            for ci, cname in enumerate(convs, start=1):
                blk_p[f"conv{ci}"] = conv(f"{t}.{cname}")
                blk_p[f"bn{ci}"], blk_s[f"bn{ci}"] = bn(f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = conv(f"{t}.downsample.0")
                blk_p["downsample_bn"], blk_s["downsample_bn"] = bn(f"{t}.downsample.1")
            params[f] = blk_p
            stats[f] = blk_s
    if "fc.weight" in sd:
        params["fc"] = {"kernel": _t2n(sd["fc.weight"]).T, "bias": _t2n(sd["fc.bias"])}
    return {"params": params, "batch_stats": stats}


def rename_params(tree: Dict[str, Any], renames: Dict[str, str]) -> Dict[str, Any]:
    """Checkpoint-migration utility: rename parameter path segments.

    The reference ships a torch layer-renaming migration script
    (reference utils/rename_torch_layers_and_parameters.py:1-18); this is the
    flax-tree equivalent: ``renames`` maps old path segments (or full
    '/'-joined prefixes) to new ones, applied to every leaf path.

    Example: rename_params(ckpt, {"post_resnet": "rgb_extractor/post"}).
    """
    import flax

    flat = flax.traverse_util.flatten_dict(tree)
    out = {}
    for path, leaf in flat.items():
        joined = "/".join(path)
        for old, new in renames.items():
            joined = joined.replace(old, new)
        out[tuple(joined.split("/"))] = leaf
    return flax.traverse_util.unflatten_dict(out)
