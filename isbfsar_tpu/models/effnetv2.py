"""EfficientNetV2 backbone in Flax (NHWC, bf16) — the MetrABS trunk.

The reference runs MetrABS's EfficientNetV2-L as a TensorRT engine
(``bbone1.engine``: B x 256 x 256 x 3 -> B x 8 x 8 x 1280, reference
modules/hpe/setup/2_extract_bbone_heads.py:28-62, loaded hpe.py:45). Here it
is a Flax module compiled by XLA:TPU in the same program as the crop warp,
the 1280 -> 288 heatmap head and the soft-argmax decode.

Architecture per the EfficientNetV2 paper (Tan & Le, 2021): a stem conv,
fused-MBConv stages (3), MBConv+SE stages (4), and a 1x1 head conv to 1280
channels. The -L configuration below yields exactly 8x8x1280 for 256x256
inputs (stride 32).

TPU notes: NHWC layout, bfloat16 conv compute with float32 BN statistics;
SE-pooling reductions stay in float32. Depthwise convs map to XLA
``feature_group_count`` convolutions which Mosaic/XLA tile natively.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class StageSpec:
    fused: bool  # fused-MBConv (conv3x3 expand) vs MBConv (1x1 expand + depthwise)
    expand: int
    kernel: int
    stride: int
    filters: int
    blocks: int
    se_ratio: float = 0.0


# EfficientNetV2-L (paper table 10); input 256 -> output 8x8.
V2_L = (
    StageSpec(True, 1, 3, 1, 32, 4),
    StageSpec(True, 4, 3, 2, 64, 7),
    StageSpec(True, 4, 3, 2, 96, 7),
    StageSpec(False, 4, 3, 2, 192, 10, 0.25),
    StageSpec(False, 6, 3, 1, 224, 19, 0.25),
    StageSpec(False, 6, 3, 2, 384, 25, 0.25),
    StageSpec(False, 6, 3, 1, 640, 7, 0.25),
)

# Smaller variants for tests / lighter deployments.
V2_S = (
    StageSpec(True, 1, 3, 1, 24, 2),
    StageSpec(True, 4, 3, 2, 48, 4),
    StageSpec(True, 4, 3, 2, 64, 4),
    StageSpec(False, 4, 3, 2, 128, 6, 0.25),
    StageSpec(False, 6, 3, 1, 160, 9, 0.25),
    StageSpec(False, 6, 3, 2, 256, 15, 0.25),
)

V2_TINY = (  # test-only: tiny but same topology family
    StageSpec(True, 1, 3, 1, 8, 1),
    StageSpec(True, 2, 3, 2, 16, 1),
    StageSpec(False, 2, 3, 2, 24, 1, 0.25),
    StageSpec(False, 2, 3, 2, 32, 1, 0.25),
    StageSpec(False, 2, 3, 2, 48, 1, 0.25),
)


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="reduce")(pooled.astype(self.dtype))
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    spec: StageSpec
    out_filters: int
    stride: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3, dtype=self.dtype, name=name
        )
        inp = x.shape[-1]
        mid = inp * self.spec.expand
        y = x
        if self.spec.fused:
            if self.spec.expand != 1:
                y = nn.Conv(
                    mid, (self.spec.kernel, self.spec.kernel), (self.stride, self.stride),
                    padding="SAME", use_bias=False, dtype=self.dtype, name="expand_conv",
                )(y)
                y = nn.silu(norm("expand_bn")(y))
                y = nn.Conv(self.out_filters, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv")(y)
                y = norm("project_bn")(y)
            else:
                y = nn.Conv(
                    self.out_filters, (self.spec.kernel, self.spec.kernel), (self.stride, self.stride),
                    padding="SAME", use_bias=False, dtype=self.dtype, name="project_conv",
                )(y)
                y = nn.silu(norm("project_bn")(y))
        else:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="expand_conv")(y)
            y = nn.silu(norm("expand_bn")(y))
            y = nn.Conv(
                mid, (self.spec.kernel, self.spec.kernel), (self.stride, self.stride),
                padding="SAME", feature_group_count=mid, use_bias=False, dtype=self.dtype,
                name="depthwise_conv",
            )(y)
            y = nn.silu(norm("depthwise_bn")(y))
            if self.spec.se_ratio > 0:
                y = SqueezeExcite(max(1, int(inp * self.spec.se_ratio)), dtype=self.dtype, name="se")(y)
            y = nn.Conv(self.out_filters, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv")(y)
            y = norm("project_bn")(y)
        if self.stride == 1 and inp == self.out_filters:
            y = y + x
        return y


class EfficientNetV2(nn.Module):
    """Feature extractor: (b, s, s, 3) float in [0, 1] -> (b, s/32, s/32, head_filters)."""

    stages: Sequence[StageSpec] = V2_L
    stem_filters: int = 32
    head_filters: int = 1280
    dtype: Any = jnp.bfloat16
    # Rematerialize per MBConv block (training-memory lever; granularity
    # rationale in models/resnet.py). Parameter tree unchanged.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3, dtype=self.dtype, name=name
        )
        x = x.astype(self.dtype)
        x = nn.Conv(self.stem_filters, (3, 3), (2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.silu(norm("stem_bn")(x))

        # train is passed POSITIONALLY: jax.checkpoint's static_argnums
        # covers positional args only, and the BN mode switch must stay
        # static (index 2 = [module, x, train])
        block_cls = (nn.remat(MBConv, static_argnums=(2,))
                     if self.remat else MBConv)
        for si, spec in enumerate(self.stages):
            for bi in range(spec.blocks):
                stride = spec.stride if bi == 0 else 1
                x = block_cls(
                    spec=spec, out_filters=spec.filters, stride=stride, dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(x, train)

        x = nn.Conv(self.head_filters, (1, 1), use_bias=False, dtype=self.dtype, name="head_conv")(x)
        x = nn.silu(norm("head_bn")(x))
        return x.astype(jnp.float32)


class MetrabsHead(nn.Module):
    """1280 -> 288 heatmap head (reference setup/4_create_heads_onnx.py:7-26):
    a single Linear over the 8x8 grid, weights originally ripped from the
    MetrABS TF checkpoint. 288 = 32 joints x (1 2D + 8 depth) channels."""

    n_out: int = 288

    @nn.compact
    def __call__(self, feats):
        return nn.Dense(self.n_out, name="conv_final")(feats)


# ------------------------------------------------- upstream weight mapping


def metrabs_tf_name_map(stages: Sequence[StageSpec] = V2_L):
    """Explicit automl-effnetv2 TF layer-scope -> flax module-path map.

    The MetrABS checkpoint's backbone is google-automl's EfficientNetV2
    (vendored at isarandi/metrabs src/backbones/efficientnet/
    effnetv2_model.py; the reference extracts its variables with
    ``model.crop_model.variables`` and pours them into a fresh Keras model
    via ``set_weights``, reference setup/2_extract_bbone_heads.py:36-47).
    TF layer scopes per that implementation:

    - ``stem/conv2d`` + ``stem/tpu_batch_normalization``
    - per block ``blocks_{i}`` (global index across stages):
      MBConv: ``conv2d`` (expand) + ``tpu_batch_normalization``,
      ``depthwise_conv2d`` + ``tpu_batch_normalization_1``,
      ``se/conv2d`` (reduce) + ``se/conv2d_1`` (expand),
      ``conv2d_1`` (project) + ``tpu_batch_normalization_2``.
      Fused, expand!=1: ``conv2d`` (expand, kxk) + ``tpu_batch_normalization``,
      ``conv2d_1`` (project 1x1) + ``tpu_batch_normalization_1``.
      Fused, expand==1: ``conv2d`` (single kxk) + ``tpu_batch_normalization``.
    - ``head/conv2d`` + ``head/tpu_batch_normalization``

    Feed the result to ``utils.checkpoint.import_tf_name_map`` (it strips
    the leading ``efficientnetv2-l/`` model scope automatically).
    """
    bn = "tpu_batch_normalization"
    m = {
        "stem/conv2d": ("stem_conv",),
        f"stem/{bn}": ("stem_bn",),
        "head/conv2d": ("head_conv",),
        f"head/{bn}": ("head_bn",),
    }
    b = 0
    for si, spec in enumerate(stages):
        for bi in range(spec.blocks):
            blk = f"blocks_{b}"
            flax_blk = f"stage{si}_block{bi}"
            if spec.fused:
                if spec.expand != 1:
                    m[f"{blk}/conv2d"] = (flax_blk, "expand_conv")
                    m[f"{blk}/{bn}"] = (flax_blk, "expand_bn")
                    m[f"{blk}/conv2d_1"] = (flax_blk, "project_conv")
                    m[f"{blk}/{bn}_1"] = (flax_blk, "project_bn")
                else:
                    m[f"{blk}/conv2d"] = (flax_blk, "project_conv")
                    m[f"{blk}/{bn}"] = (flax_blk, "project_bn")
            else:
                m[f"{blk}/conv2d"] = (flax_blk, "expand_conv")
                m[f"{blk}/{bn}"] = (flax_blk, "expand_bn")
                m[f"{blk}/depthwise_conv2d"] = (flax_blk, "depthwise_conv")
                m[f"{blk}/{bn}_1"] = (flax_blk, "depthwise_bn")
                if spec.se_ratio > 0:
                    m[f"{blk}/se/conv2d"] = (flax_blk, "se", "reduce")
                    m[f"{blk}/se/conv2d_1"] = (flax_blk, "se", "expand")
                m[f"{blk}/conv2d_1"] = (flax_blk, "project_conv")
                m[f"{blk}/{bn}_2"] = (flax_blk, "project_bn")
            b += 1
    return m
