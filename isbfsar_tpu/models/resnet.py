"""ResNet family in Flax (NHWC, bf16-friendly) — shared conv backbone.

One implementation serves every ResNet consumer in the framework:

- ResNet-50 RGB feature extractor of the AR branch
  (reference modules/ar/utils/model.py:270-277)
- ResNet-18 ETH-XGaze gaze estimator backbone
  (reference utils/params.py:110-116 + ptgaze vendor)
- ResNet-50 Hopenet head-pose alternative (reference
  modules/focus/gaze_estimation/head_pose.py:42-155)
- mutual-gaze backbones (reference modules/focus/mutual_gaze/focus_detection/utils/model.py)

TPU notes: NHWC layout (XLA:TPU native), bfloat16 compute with float32
params/statistics, BatchNorm in inference mode folds into the convs under
XLA fusion. Matches torchvision's resnet graph structure so torch
checkpoints can be imported 1:1 (see utils/torch_import.py).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class BasicBlock(nn.Module):
    filters: int
    strides: Tuple[int, int] = (1, 1)
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (3, 3), self.strides, padding=[(1, 1), (1, 1)], name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = self.norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1), self.strides, name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: Tuple[int, int] = (1, 1)
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1), name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), self.strides, padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = self.conv(self.filters * self.expansion, (1, 1), name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters * self.expansion, (1, 1), self.strides, name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Torchvision-graph-compatible ResNet. Input NHWC, output pooled features.

    num_classes=0 returns the global-average-pooled features (the AR branch
    consumes pre-fc 2048-d features, reference model.py:276: children()[:-1]).
    """

    stage_sizes: Sequence[int]
    block: Callable = Bottleneck
    num_classes: int = 0
    width: int = 64
    dtype: Any = jnp.bfloat16
    enable_cam: bool = False  # sow + perturb the last stage for GRAD-CAM
    # Rematerialize PER RESIDUAL BLOCK (nn.remat around each block): the
    # backward pass then recomputes one block's activations at a time from
    # the stored block boundaries instead of keeping every conv activation
    # live. Granularity matters — checkpointing the WHOLE network cuts
    # nothing, because its backward recomputes and holds all activations
    # at once (measured: 367 MB vs 352 MB temp on the TRX train step);
    # per-block remat is what turns the recompute into a peak-memory win
    # (receipt: tests/test_train.py::test_remat_cuts_train_step_memory).
    # Parameter tree is unchanged (the lifted transform keeps block names).
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda *a, **kw: nn.Conv(*a, use_bias=False, dtype=self.dtype, **kw)
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=name
        )

        x = x.astype(self.dtype)
        x = conv(self.width, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], name="conv1")(x)
        x = norm("bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = nn.remat(self.block) if self.remat else self.block
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = block_cls(
                    filters=self.width * 2**i,
                    strides=strides,
                    conv=conv,
                    norm=norm,
                    name=f"layer{i + 1}_{j}",
                )(x)

        if self.enable_cam:
            # GRAD-CAM capture point (the reference hooks layer4 activations
            # + gradients, model.py:221-259): sow the activation, and add a
            # zero 'perturbation' whose gradient IS d(score)/d(activation).
            x = x.astype(jnp.float32)
            self.sow("intermediates", "stage4", x)
            x = self.perturb("stage4", x)

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = x.astype(jnp.float32)
        if self.num_classes:
            x = nn.Dense(self.num_classes, name="fc")(x)
        return x


def resnet18(num_classes: int = 0, dtype=jnp.bfloat16) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block=BasicBlock, num_classes=num_classes, dtype=dtype)


def resnet50(num_classes: int = 0, dtype=jnp.bfloat16, remat: bool = False) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block=Bottleneck, num_classes=num_classes, dtype=dtype,
                  remat=remat)
