"""YOLOv4 person detector in Flax (NHWC, bf16) — replaces ``yolo.engine``.

The reference runs the Tianxiaomo pytorch-YOLOv4 export as a TensorRT fp16
engine: 1x3x256x256 -> boxes (1, 4032, 1, 4) + confs (1, 4032, 80)
(reference modules/hpe/setup/1_extract_yolo_onnx.py:1-64, loaded hpe.py:42,
consumed hpe.py:58-61). This is a ground-up Flax implementation of the same
architecture — CSPDarknet-53 backbone (Mish), SPP + PAN neck (LeakyReLU),
three anchor-based decode heads — emitting the identical output contract so
the downstream NMS/selection math is interchangeable.

In-graph decode: the sigmoid/exp/grid box transform runs on the VPU inside
the same XLA program; 4032 = 3 anchors x (32^2 + 16^2 + 8^2) cells at 256px.

TPU notes: NHWC, bf16 convs on the MXU; decode in float32. The fp32 anchor
grids are compile-time constants (broadcasted_iota), no host round-trip.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ANCHORS = (
    ((12, 16), (19, 36), (40, 28)),  # stride 8
    ((36, 75), (76, 55), (72, 146)),  # stride 16
    ((142, 110), (192, 243), (459, 401)),  # stride 32
)
SCALE_XY = (1.2, 1.1, 1.05)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class ConvBlock(nn.Module):
    filters: int
    kernel: int = 3
    stride: int = 1
    act: str = "mish"  # mish | leaky | linear
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bn = self.act != "linear"
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.filters, (self.kernel, self.kernel), (self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)], use_bias=not use_bn, dtype=self.dtype, name="conv",
        )(x)
        if use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-4,
                dtype=self.dtype, name="bn",
            )(x)
        if self.act == "mish":
            x = mish(x)
        elif self.act == "leaky":
            x = nn.leaky_relu(x, 0.1)
        return x


class ResBlock(nn.Module):
    """Darknet residual: 1x1 -> 3x3 with skip, Mish."""

    hidden: int
    out: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBlock(self.hidden, 1, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBlock(self.out, 3, dtype=self.dtype, name="conv2")(y, train)
        return x + y


class CSPStage(nn.Module):
    """Cross-stage-partial stage: downsample, split, residual trunk, merge."""

    filters: int  # output channels
    n_blocks: int
    first: bool = False  # stage 1 keeps full width on both routes
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        split = self.filters if self.first else self.filters // 2
        x = ConvBlock(self.filters, 3, 2, dtype=self.dtype, name="down")(x, train)
        route = ConvBlock(split, 1, dtype=self.dtype, name="route")(x, train)
        y = ConvBlock(split, 1, dtype=self.dtype, name="trunk_in")(x, train)
        hidden = split // 2 if self.first else split
        for i in range(self.n_blocks):
            y = ResBlock(hidden, split, dtype=self.dtype, name=f"res{i}")(y, train)
        y = ConvBlock(split, 1, dtype=self.dtype, name="trunk_out")(y, train)
        y = jnp.concatenate([y, route], axis=-1)
        return ConvBlock(self.filters, 1, dtype=self.dtype, name="merge")(y, train)


def _scaled(n: int, width: float) -> int:
    """Channel scaling for slim variants; width=1.0 is the reference arch."""
    return max(8, int(round(n * width / 8)) * 8) if width != 1.0 else n


class CSPDarknet53(nn.Module):
    dtype: Any = jnp.bfloat16
    width: float = 1.0
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        c = lambda n: _scaled(n, self.width)
        deep = 1.0 if self.width == 1.0 else 0.25
        blocks = lambda n: max(1, int(round(n * deep)))
        # remat granularity: the whole CSP STAGE, not the ResBlocks — the
        # stage in/outputs are saved anyway (the neck consumes d3/d4/d5),
        # and per-ResBlock remat leaves the down/route/trunk/merge
        # ConvBlock activations stored, which dominate at slim widths
        # (measured: per-ResBlock cut only 12% of saved bytes). train is
        # positional for static_argnums (see models/resnet.py).
        stage_cls = (nn.remat(CSPStage, static_argnums=(2,))
                     if self.remat else CSPStage)
        stage = lambda *a, **kw: stage_cls(*a, dtype=self.dtype, **kw)
        x = ConvBlock(c(32), 3, dtype=self.dtype, name="stem")(x, train)
        x = stage(c(64), 1, first=True, name="stage1")(x, train)
        x = stage(c(128), blocks(2), name="stage2")(x, train)
        d3 = stage(c(256), blocks(8), name="stage3")(x, train)
        d4 = stage(c(512), blocks(8), name="stage4")(d3, train)
        d5 = stage(c(1024), blocks(4), name="stage5")(d4, train)
        return d3, d4, d5


def _conv_stack(filters: Sequence[Tuple[int, int]], dtype, name_prefix: str):
    """Alternating 1x1/3x3 leaky conv stack builder."""
    return [
        ConvBlock(f, k, act="leaky", dtype=dtype, name=f"{name_prefix}{i}")
        for i, (f, k) in enumerate(filters)
    ]


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


class Neck(nn.Module):
    """SPP on the deepest scale + PAN top-down path (LeakyReLU)."""

    dtype: Any = jnp.bfloat16
    width: float = 1.0

    @nn.compact
    def __call__(self, d3, d4, d5, train: bool = False):
        c = lambda n: _scaled(n, self.width)

        def run(x, stack):
            for m in stack:
                x = m(x, train)
            return x

        # SPP
        x = run(d5, _conv_stack([(c(512), 1), (c(1024), 3), (c(512), 1)], self.dtype, "pre_spp"))
        pools = [x] + [
            nn.max_pool(x, (k, k), strides=(1, 1), padding=[(k // 2, k // 2)] * 2)
            for k in (5, 9, 13)
        ]
        x = jnp.concatenate(pools[::-1], axis=-1)
        p5 = run(x, _conv_stack([(c(512), 1), (c(1024), 3), (c(512), 1)], self.dtype, "post_spp"))

        # top-down to stride 16
        up = _upsample2(ConvBlock(c(256), 1, act="leaky", dtype=self.dtype, name="p5_up")(p5, train))
        lat4 = ConvBlock(c(256), 1, act="leaky", dtype=self.dtype, name="lat4")(d4, train)
        x = jnp.concatenate([lat4, up], axis=-1)
        p4 = run(x, _conv_stack([(c(256), 1), (c(512), 3), (c(256), 1), (c(512), 3), (c(256), 1)], self.dtype, "p4_"))

        # top-down to stride 8
        up = _upsample2(ConvBlock(c(128), 1, act="leaky", dtype=self.dtype, name="p4_up")(p4, train))
        lat3 = ConvBlock(c(128), 1, act="leaky", dtype=self.dtype, name="lat3")(d3, train)
        x = jnp.concatenate([lat3, up], axis=-1)
        p3 = run(x, _conv_stack([(c(128), 1), (c(256), 3), (c(128), 1), (c(256), 3), (c(128), 1)], self.dtype, "p3_"))
        return p3, p4, p5


def decode_scale(raw: jnp.ndarray, anchors, scale_xy: float, input_size: int, n_classes: int):
    """(b, h, w, 3*(5+C)) raw head -> (boxes (b, 3*h*w, 4) in [0,1] x1y1x2y2,
    confs (b, 3*h*w, C) = sigmoid(obj) * sigmoid(cls))."""
    b, h, w, _ = raw.shape
    n_anchor = len(anchors)
    raw = raw.astype(jnp.float32).reshape(b, h, w, n_anchor, 5 + n_classes)

    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    txy = jax.nn.sigmoid(raw[..., 0:2]) * scale_xy - 0.5 * (scale_xy - 1.0)
    bx = (txy[..., 0] + gx[..., None]) / w
    by = (txy[..., 1] + gy[..., None]) / h
    anchor_wh = jnp.asarray(anchors, jnp.float32) / input_size  # (3, 2)
    bw = jnp.exp(raw[..., 2]) * anchor_wh[:, 0]
    bh = jnp.exp(raw[..., 3]) * anchor_wh[:, 1]

    boxes = jnp.stack([bx - bw / 2, by - bh / 2, bx + bw / 2, by + bh / 2], axis=-1)
    confs = jax.nn.sigmoid(raw[..., 5:]) * jax.nn.sigmoid(raw[..., 4:5])

    # flatten (h, w, anchor) -> n
    boxes = boxes.reshape(b, h * w * n_anchor, 4)
    confs = confs.reshape(b, h * w * n_anchor, n_classes)
    return boxes, confs


class YOLOv4(nn.Module):
    """Full detector. Input (b, s, s, 3) float in [0, 1] NHWC.

    Returns (boxes (b, N, 1, 4), confs (b, N, C)) with N = 3*(s/8)^2 +
    3*(s/16)^2 + 3*(s/32)^2 (= 4032 at s=256) — the reference engine's
    output contract (hpe.py:60).
    """

    n_classes: int = 80
    dtype: Any = jnp.bfloat16
    width: float = 1.0  # 1.0 = reference architecture; <1 = slim variant
    # per-CSP-stage remat in the backbone (training-memory lever at the
    # 256-416 px detector inputs; granularity note in CSPDarknet53)
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        input_size = x.shape[1]
        c = lambda n: _scaled(n, self.width)
        x = x.astype(self.dtype)
        d3, d4, d5 = CSPDarknet53(dtype=self.dtype, width=self.width,
                                  remat=self.remat, name="backbone")(x, train)
        p3, p4, p5 = Neck(dtype=self.dtype, width=self.width, name="neck")(d3, d4, d5, train)

        def run(z, stack):
            for m in stack:
                z = m(z, train)
            return z

        out_ch = 3 * (5 + self.n_classes)

        # scale 1 (stride 8)
        y1 = ConvBlock(c(256), 3, act="leaky", dtype=self.dtype, name="head1_conv")(p3, train)
        y1 = ConvBlock(out_ch, 1, act="linear", dtype=self.dtype, name="head1_out")(y1, train)

        # bottom-up to stride 16
        z = ConvBlock(c(256), 3, 2, act="leaky", dtype=self.dtype, name="down4")(p3, train)
        z = jnp.concatenate([z, p4], axis=-1)
        z = run(z, _conv_stack([(c(256), 1), (c(512), 3), (c(256), 1), (c(512), 3), (c(256), 1)], self.dtype, "h4_"))
        y2 = ConvBlock(c(512), 3, act="leaky", dtype=self.dtype, name="head2_conv")(z, train)
        y2 = ConvBlock(out_ch, 1, act="linear", dtype=self.dtype, name="head2_out")(y2, train)

        # bottom-up to stride 32
        z2 = ConvBlock(c(512), 3, 2, act="leaky", dtype=self.dtype, name="down5")(z, train)
        z2 = jnp.concatenate([z2, p5], axis=-1)
        z2 = run(z2, _conv_stack([(c(512), 1), (c(1024), 3), (c(512), 1), (c(1024), 3), (c(512), 1)], self.dtype, "h5_"))
        y3 = ConvBlock(c(1024), 3, act="leaky", dtype=self.dtype, name="head3_conv")(z2, train)
        y3 = ConvBlock(out_ch, 1, act="linear", dtype=self.dtype, name="head3_out")(y3, train)

        all_boxes, all_confs = [], []
        for raw, anchors, sxy in zip((y1, y2, y3), ANCHORS, SCALE_XY):
            bx, cf = decode_scale(raw, anchors, sxy, input_size, self.n_classes)
            all_boxes.append(bx)
            all_confs.append(cf)
        boxes = jnp.concatenate(all_boxes, axis=1)[:, :, None, :]
        confs = jnp.concatenate(all_confs, axis=1)
        return boxes, confs


# ------------------------------------------------- upstream weight mapping

# Residual-block counts of the five CSP stages (Tianxiaomo DownSample1-5).
_TIANXIAOMO_RES = (1, 2, 8, 8, 4)


def tianxiaomo_name_map(neck_prefix: str = "neek"):
    """Explicit Tianxiaomo pytorch-YOLOv4 -> flax module-path map.

    Keys are torch module prefixes of the upstream ``Yolov4`` class (the
    checkpoint the reference's engine toolchain consumes, reference
    modules/hpe/setup/1_extract_yolo_onnx.py:1-64): every
    ``Conv_Bn_Activation`` is an ``nn.Sequential`` named ``conv`` with
    ``0``=Conv2d, ``1``=BatchNorm2d (absent on the linear detection heads).
    Values are this model's flax module paths. Feed the result to
    ``utils.checkpoint.import_named_convnet``.

    Upstream registration (and forward graph) audited per module:

    - ``down1``: conv1=stem; conv2=downsample; conv3=route (concatenated
      second); conv4=trunk-in; conv5/conv6=residual 1x1/3x3; conv7=trunk-out;
      conv8=merge.
    - ``down2..down5``: conv1=downsample, conv2=route, conv3=trunk-in,
      ``resblock.module_list.{i}.{0,1}``=residual 1x1/3x3, conv4=trunk-out,
      conv5=merge.
    - ``neek`` (upstream typo for neck; the reference renames it to
      ``neck`` in 1_extract_yolo_onnx.py:34-38 — pass ``neck_prefix="neck"``
      for checkpoints that went through that rewrite): conv1-3 pre-SPP,
      conv4-6 post-SPP, conv7 pre-upsample-1, conv8 lateral-d4, conv9-13
      stride-16 stack, conv14 pre-upsample-2, conv15 lateral-d3, conv16-20
      stride-8 stack.
    - ``head``: conv1/conv2 scale-1 head, conv3 downsample, conv4-8 stack,
      conv9/conv10 scale-2 head, conv11 downsample, conv12-16 stack,
      conv17/conv18 scale-3 head.
    """
    m = {}

    def cba(torch_name, *flax_path, bn=True):
        m[f"{torch_name}.conv.0"] = tuple(flax_path) + ("conv",)
        if bn:
            m[f"{torch_name}.conv.1"] = tuple(flax_path) + ("bn",)

    # --- backbone
    cba("down1.conv1", "backbone", "stem")
    stage_parts = [("conv1", "down"), ("conv2", "route"), ("conv3", "trunk_in"),
                   ("conv4", "trunk_out"), ("conv5", "merge")]
    down1_parts = [("conv2", "down"), ("conv3", "route"), ("conv4", "trunk_in"),
                   ("conv7", "trunk_out"), ("conv8", "merge")]
    for s, n_res in enumerate(_TIANXIAOMO_RES, start=1):
        stage = f"stage{s}"
        if s == 1:
            for tname, fname in down1_parts:
                cba(f"down1.{tname}", "backbone", stage, fname)
            cba("down1.conv5", "backbone", stage, "res0", "conv1")
            cba("down1.conv6", "backbone", stage, "res0", "conv2")
        else:
            for tname, fname in stage_parts:
                cba(f"down{s}.{tname}", "backbone", stage, fname)
            for i in range(n_res):
                cba(f"down{s}.resblock.module_list.{i}.0", "backbone", stage, f"res{i}", "conv1")
                cba(f"down{s}.resblock.module_list.{i}.1", "backbone", stage, f"res{i}", "conv2")

    # --- neck
    neck = [
        "pre_spp0", "pre_spp1", "pre_spp2",          # conv1-3
        "post_spp0", "post_spp1", "post_spp2",       # conv4-6
        "p5_up", "lat4",                              # conv7-8
        "p4_0", "p4_1", "p4_2", "p4_3", "p4_4",      # conv9-13
        "p4_up", "lat3",                              # conv14-15
        "p3_0", "p3_1", "p3_2", "p3_3", "p3_4",      # conv16-20
    ]
    for i, fname in enumerate(neck, start=1):
        cba(f"{neck_prefix}.conv{i}", "neck", fname)

    # --- heads (conv2/10/18 are linear, bias, no bn)
    head = [
        ("conv1", "head1_conv", True), ("conv2", "head1_out", False),
        ("conv3", "down4", True),
        ("conv4", "h4_0", True), ("conv5", "h4_1", True), ("conv6", "h4_2", True),
        ("conv7", "h4_3", True), ("conv8", "h4_4", True),
        ("conv9", "head2_conv", True), ("conv10", "head2_out", False),
        ("conv11", "down5", True),
        ("conv12", "h5_0", True), ("conv13", "h5_1", True), ("conv14", "h5_2", True),
        ("conv15", "h5_3", True), ("conv16", "h5_4", True),
        ("conv17", "head3_conv", True), ("conv18", "head3_out", False),
    ]
    for tname, fname, bn in head:
        cba(f"head.{tname}", fname, bn=bn)
    return m
