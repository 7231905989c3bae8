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


def import_ordered_convnet(state_dict: Dict[str, Any], variables: Dict[str, Any]):
    """Order-based torch->flax convnet import (YOLOv4 / EfficientNetV2 path).

    The reference's engine toolchain consumes upstream torch/TF checkpoints
    whose module names don't match ours (Tianxiaomo YOLOv4, MetrABS
    EffNetV2). For architectures rebuilt with the SAME layer order, torch's
    ``state_dict`` iteration order (registration order) corresponds 1:1 to
    the flax tree's definition order — so parameters can be zipped by kind:

    - 4D conv weights -> next flax conv ``kernel`` (OIHW -> HWIO; depthwise
      OIHW with I==1 -> HWIO with O in the last axis)
    - 2D linear weights (+bias) -> next flax dense kernel/bias
    - BN weight/bias/running_mean/running_var -> next flax bn
      scale/bias + batch_stats mean/var

    Every assignment is shape-checked; a mismatch raises with both paths so
    drift is caught immediately instead of silently corrupting weights.

    Returns a new variables dict (params + batch_stats filled).
    """
    import flax

    sd = strip_dataparallel(state_dict)

    flat_params = dict(flax.traverse_util.flatten_dict(variables["params"]))
    flat_stats = dict(flax.traverse_util.flatten_dict(variables.get("batch_stats", {})))

    conv_keys = [k for k in flat_params if k[-1] == "kernel" and flat_params[k].ndim == 4]
    dense_keys = [k for k in flat_params if k[-1] == "kernel" and flat_params[k].ndim == 2]
    scale_keys = [k for k in flat_params if k[-1] == "scale"]

    def bias_for(kernel_key):
        bk = kernel_key[:-1] + ("bias",)
        return bk if bk in flat_params else None

    out_p = dict(flat_params)
    out_s = dict(flat_stats)
    ci = di = si = 0

    items = list(sd.items())
    i = 0
    while i < len(items):
        name, t = items[i]
        arr = _t2n(t)
        if name.endswith("num_batches_tracked"):
            i += 1
            continue
        if arr.ndim == 4 and name.endswith("weight"):
            key = conv_keys[ci]
            ci += 1
            want = out_p[key].shape
            # OIHW -> HWIO (depthwise OIHW with I==1 maps the same way)
            mapped = arr.transpose(2, 3, 1, 0)
            if tuple(mapped.shape) != tuple(want):
                raise ValueError(f"conv shape mismatch: torch {name} {mapped.shape} "
                                 f"vs flax {'/'.join(key)} {want}")
            out_p[key] = mapped
            bk = bias_for(key)
            if i + 1 < len(items) and items[i + 1][0].endswith("bias") and bk is not None \
                    and _t2n(items[i + 1][1]).ndim == 1 \
                    and _t2n(items[i + 1][1]).shape[0] == mapped.shape[3]:
                out_p[bk] = _t2n(items[i + 1][1])
                i += 1
        elif arr.ndim == 2 and name.endswith("weight"):
            key = dense_keys[di]
            di += 1
            mapped = arr.T
            if tuple(mapped.shape) != tuple(out_p[key].shape):
                raise ValueError(f"dense shape mismatch: torch {name} {mapped.shape} "
                                 f"vs flax {'/'.join(key)} {out_p[key].shape}")
            out_p[key] = mapped
            bk = bias_for(key)
            if i + 1 < len(items) and items[i + 1][0].endswith("bias") and bk is not None:
                out_p[bk] = _t2n(items[i + 1][1])
                i += 1
        elif arr.ndim == 1 and name.endswith("weight"):
            # BatchNorm gamma; expect bias/mean/var to follow
            key = scale_keys[si]
            si += 1
            if arr.shape != out_p[key].shape:
                raise ValueError(f"bn shape mismatch: torch {name} {arr.shape} "
                                 f"vs flax {'/'.join(key)} {out_p[key].shape}")
            out_p[key] = arr
            base = key[:-1]
            fields = {"bias": base + ("bias",)}
            j = i + 1
            while j < len(items) and j <= i + 3:
                n2, t2 = items[j]
                a2 = _t2n(t2)
                if n2.endswith("bias") and fields.get("bias") in out_p:
                    out_p[fields["bias"]] = a2
                elif n2.endswith("running_mean"):
                    sk = _match_stat(flat_stats, base, "mean")
                    if sk is not None:
                        out_s[sk] = a2
                elif n2.endswith("running_var"):
                    sk = _match_stat(flat_stats, base, "var")
                    if sk is not None:
                        out_s[sk] = a2
                else:
                    break
                j += 1
            i = j - 1
        i += 1

    params = flax.traverse_util.unflatten_dict(out_p)
    result = {"params": params}
    if flat_stats:
        result["batch_stats"] = flax.traverse_util.unflatten_dict(out_s)
    return result


def _match_stat(flat_stats, param_base, leaf):
    """Find the batch_stats key corresponding to a params bn path.

    flax stores bn params under .../<bn_name>/{scale,bias} and stats under
    .../<bn_name>/{mean,var}; the path prefix is identical."""
    key = param_base + (leaf,)
    return key if key in flat_stats else None


def import_tf_vars(tf_vars, variables: Dict[str, Any]):
    """Order-based TF->flax convnet import (the MetrABS EffNetV2-L path).

    tf_vars: list of (name, numpy array) in TF variable order (what
    ``model.crop_model.variables`` yields in the reference's extraction
    script, setup/2_extract_bbone_heads.py:36-47). TF conv kernels are
    already HWIO and depthwise kernels HWC1->HW1C-compatible, so only the
    kind classification + order zip is needed:

    - 4D kernel -> next flax conv kernel (depthwise (h, w, c, 1) transposed
      to flax's (h, w, 1, c))
    - 'gamma'/'beta'/'moving_mean'/'moving_variance' -> next flax bn
    - 2D kernel (+bias) -> next dense

    Shape-checked per assignment. Returns a filled variables dict.
    """
    import flax

    flat_params = dict(flax.traverse_util.flatten_dict(variables["params"]))
    flat_stats = dict(flax.traverse_util.flatten_dict(variables.get("batch_stats", {})))
    conv_keys = [k for k in flat_params if k[-1] == "kernel" and flat_params[k].ndim == 4]
    dense_keys = [k for k in flat_params if k[-1] == "kernel" and flat_params[k].ndim == 2]
    scale_keys = [k for k in flat_params if k[-1] == "scale"]

    out_p = dict(flat_params)
    out_s = dict(flat_stats)
    ci = di = si = 0
    bn_cursor = None  # base path of the bn currently being filled

    for name, val in tf_vars:
        arr = np.asarray(val)
        leaf = name.rsplit("/", 1)[-1].split(":")[0]
        if arr.ndim == 4:
            key = conv_keys[ci]
            ci += 1
            want = out_p[key].shape
            mapped = arr
            if tuple(mapped.shape) != tuple(want) and arr.shape[-1] == 1 and want[-2] == 1:
                mapped = arr.transpose(0, 1, 3, 2)  # TF depthwise HWC1 -> flax HW1C
            if tuple(mapped.shape) != tuple(want):
                raise ValueError(f"conv shape mismatch: tf {name} {mapped.shape} "
                                 f"vs flax {'/'.join(key)} {want}")
            out_p[key] = mapped
        elif arr.ndim == 2:
            key = dense_keys[di]
            di += 1
            if tuple(arr.shape) != tuple(out_p[key].shape):
                raise ValueError(f"dense shape mismatch: tf {name} {arr.shape} "
                                 f"vs flax {'/'.join(key)} {out_p[key].shape}")
            out_p[key] = arr
        elif leaf == "gamma":
            key = scale_keys[si]
            si += 1
            bn_cursor = key[:-1]
            if arr.shape != out_p[key].shape:
                raise ValueError(f"bn gamma mismatch: tf {name} {arr.shape} "
                                 f"vs flax {'/'.join(key)} {out_p[key].shape}")
            out_p[key] = arr
        elif leaf == "beta" and bn_cursor is not None:
            out_p[bn_cursor + ("bias",)] = arr
        elif leaf == "moving_mean" and bn_cursor is not None:
            if bn_cursor + ("mean",) in out_s:
                out_s[bn_cursor + ("mean",)] = arr
        elif leaf == "moving_variance" and bn_cursor is not None:
            if bn_cursor + ("var",) in out_s:
                out_s[bn_cursor + ("var",)] = arr
        elif arr.ndim == 1:
            # conv/dense bias follows its kernel: attach to the most recent
            prev = (dense_keys[di - 1] if di else conv_keys[ci - 1])[:-1] + ("bias",)
            if prev in out_p and out_p[prev].shape == arr.shape:
                out_p[prev] = arr

    result = {"params": flax.traverse_util.unflatten_dict(out_p)}
    if flat_stats:
        result["batch_stats"] = flax.traverse_util.unflatten_dict(out_s)
    return result
