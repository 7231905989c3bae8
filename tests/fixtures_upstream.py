"""Vendored upstream checkpoint layouts (names + shapes) for NON-CIRCULAR
weight-importer tests.

Round-1's importer tests synthesized state dicts *from the repo's own flax
trees*, which validates transposes but not the correspondence with the real
upstream registration order. The generators here encode the upstream
layouts independently, from the upstream sources the reference's engine
toolchain consumes:

- :func:`tianxiaomo_yolov4_state_dict_spec` — the ``state_dict()`` key
  sequence of Tianxiaomo pytorch-YOLOv4's ``Yolov4(n_classes=80)`` (the
  class the reference loads ``yolov4.pth`` into, reference
  modules/hpe/setup/1_extract_yolo_onnx.py:1-64). Derived from upstream
  ``models.py``: ``DownSample1-5``, ``Neck`` (attribute ``neek``),
  ``Yolov4Head``; every ``Conv_Bn_Activation`` is a Sequential ``conv``
  with 0=Conv2d(bias only when bn is off), 1=BatchNorm2d.
- :func:`torchvision_resnet_state_dict_spec` — torchvision
  resnet18/resnet50 ``state_dict()`` key sequences (the TRXOS rgb branch,
  reference modules/ar/utils/model.py:275-276, and the ETH-XGaze resnet18
  gaze trunk, reference utils/params.py:110-116).
- :func:`effnetv2_l_tf_variables_spec` — the variable list of automl
  EfficientNetV2-L as Keras ``model.variables`` yields it (the MetrABS
  extraction contract, reference modules/hpe/setup/2_extract_bbone_heads.py:
  36-47): ALL trainable weights in layer-creation order first, then the
  BN moving statistics in the same layer order (Keras ``Layer.weights`` =
  ``trainable_weights + non_trainable_weights``).
- :func:`trxos_state_dict_spec` — the reference TRXOS ``DISC.pth`` key
  sequence (reference modules/ar/utils/model.py:260-288).

These are *specs*: lists of (key, shape). Tests materialize arrays with
unique per-key fill values so position scrambles are detected, not just
shape mismatches.
"""

from __future__ import annotations

from typing import List, Tuple

Spec = List[Tuple[str, Tuple[int, ...]]]


# ---------------------------------------------------------------- YOLOv4


def _cba(out: Spec, prefix: str, cin: int, cout: int, k: int, bn: bool = True):
    """Tianxiaomo Conv_Bn_Activation parameter keys (models.py upstream)."""
    out.append((f"{prefix}.conv.0.weight", (cout, cin, k, k)))
    if bn:
        out += [
            (f"{prefix}.conv.1.weight", (cout,)),
            (f"{prefix}.conv.1.bias", (cout,)),
            (f"{prefix}.conv.1.running_mean", (cout,)),
            (f"{prefix}.conv.1.running_var", (cout,)),
            (f"{prefix}.conv.1.num_batches_tracked", ()),
        ]
    else:
        out.append((f"{prefix}.conv.0.bias", (cout,)))


def tianxiaomo_yolov4_state_dict_spec(n_classes: int = 80) -> Spec:
    out_ch = 3 * (5 + n_classes)
    s: Spec = []

    # DownSample1 (upstream models.py DownSample1.__init__)
    for name, cin, cout, k in [
        ("conv1", 3, 32, 3), ("conv2", 32, 64, 3), ("conv3", 64, 64, 1),
        ("conv4", 64, 64, 1), ("conv5", 64, 32, 1), ("conv6", 32, 64, 3),
        ("conv7", 64, 64, 1), ("conv8", 128, 64, 1),
    ]:
        _cba(s, f"down1.{name}", cin, cout, k)

    # DownSample2-5: conv1-3, ResBlock(ch, nblocks), conv4, conv5
    for d, (cin, ch, n_res) in enumerate([(64, 64, 2), (128, 128, 8),
                                          (256, 256, 8), (512, 512, 4)], start=2):
        cout = cin * 2
        _cba(s, f"down{d}.conv1", cin, cout, 3)
        _cba(s, f"down{d}.conv2", cout, ch, 1)
        _cba(s, f"down{d}.conv3", cout, ch, 1)
        for i in range(n_res):
            _cba(s, f"down{d}.resblock.module_list.{i}.0", ch, ch, 1)
            _cba(s, f"down{d}.resblock.module_list.{i}.1", ch, ch, 3)
        _cba(s, f"down{d}.conv4", ch, ch, 1)
        _cba(s, f"down{d}.conv5", cout, cout, 1)

    # Neck (attribute name 'neek' upstream)
    neck = [
        (1024, 512, 1), (512, 1024, 3), (1024, 512, 1),          # conv1-3
        (2048, 512, 1), (512, 1024, 3), (1024, 512, 1),          # conv4-6 (post-SPP)
        (512, 256, 1), (512, 256, 1),                            # conv7-8
        (512, 256, 1), (256, 512, 3), (512, 256, 1), (256, 512, 3), (512, 256, 1),  # conv9-13
        (256, 128, 1), (256, 128, 1),                            # conv14-15
        (256, 128, 1), (128, 256, 3), (256, 128, 1), (128, 256, 3), (256, 128, 1),  # conv16-20
    ]
    for i, (cin, cout, k) in enumerate(neck, start=1):
        _cba(s, f"neek.conv{i}", cin, cout, k)

    # Yolov4Head
    head = [
        (128, 256, 3, True), (256, out_ch, 1, False),            # conv1-2
        (128, 256, 3, True),                                     # conv3 (stride 2)
        (512, 256, 1, True), (256, 512, 3, True), (512, 256, 1, True),
        (256, 512, 3, True), (512, 256, 1, True),                # conv4-8
        (256, 512, 3, True), (512, out_ch, 1, False),            # conv9-10
        (256, 512, 3, True),                                     # conv11 (stride 2)
        (1024, 512, 1, True), (512, 1024, 3, True), (1024, 512, 1, True),
        (512, 1024, 3, True), (1024, 512, 1, True),              # conv12-16
        (512, 1024, 3, True), (1024, out_ch, 1, False),          # conv17-18
    ]
    for i, (cin, cout, k, bn) in enumerate(head, start=1):
        _cba(s, f"head.conv{i}", cin, cout, k, bn=bn)
    return s


# ---------------------------------------------------------------- ResNets


def _tv_bn(out: Spec, prefix: str, c: int):
    out += [
        (f"{prefix}.weight", (c,)), (f"{prefix}.bias", (c,)),
        (f"{prefix}.running_mean", (c,)), (f"{prefix}.running_var", (c,)),
        (f"{prefix}.num_batches_tracked", ()),
    ]


def torchvision_resnet_state_dict_spec(depth: int, include_fc: bool = True) -> Spec:
    """torchvision resnet18 / resnet50 state_dict key order."""
    if depth == 18:
        stage_sizes, bottleneck = (2, 2, 2, 2), False
    elif depth == 50:
        stage_sizes, bottleneck = (3, 4, 6, 3), True
    else:
        raise ValueError(depth)
    expansion = 4 if bottleneck else 1
    s: Spec = [("conv1.weight", (64, 3, 7, 7))]
    _tv_bn(s, "bn1", 64)
    cin = 64
    for li, n_blocks in enumerate(stage_sizes):
        width = 64 * 2**li
        cout = width * expansion
        for b in range(n_blocks):
            p = f"layer{li + 1}.{b}"
            if bottleneck:
                s.append((f"{p}.conv1.weight", (width, cin, 1, 1)))
                _tv_bn(s, f"{p}.bn1", width)
                s.append((f"{p}.conv2.weight", (width, width, 3, 3)))
                _tv_bn(s, f"{p}.bn2", width)
                s.append((f"{p}.conv3.weight", (cout, width, 1, 1)))
                _tv_bn(s, f"{p}.bn3", cout)
            else:
                s.append((f"{p}.conv1.weight", (width, cin, 3, 3)))
                _tv_bn(s, f"{p}.bn1", width)
                s.append((f"{p}.conv2.weight", (width, width, 3, 3)))
                _tv_bn(s, f"{p}.bn2", width)
            if b == 0 and cin != cout:
                s.append((f"{p}.downsample.0.weight", (cout, cin, 1, 1)))
                _tv_bn(s, f"{p}.downsample.1", cout)
            cin = cout
    if include_fc:
        s += [("fc.weight", (1000, cin)), ("fc.bias", (1000,))]
    return s


# ------------------------------------------------------------ EffNetV2-L

# (fused, expand, filters, blocks, se_ratio) — automl effnetv2_configs v2-l.
_V2L_STAGES = (
    (True, 1, 32, 4, 0.0),
    (True, 4, 64, 7, 0.0),
    (True, 4, 96, 7, 0.0),
    (False, 4, 192, 10, 0.25),
    (False, 6, 224, 19, 0.25),
    (False, 6, 384, 25, 0.25),
    (False, 6, 640, 7, 0.25),
)


def effnetv2_l_tf_variables_spec(interleaved: bool = False) -> Spec:
    """(name, shape) list for automl efficientnetv2-l, include_top=False.

    ``interleaved=False`` (the default) reproduces Keras
    ``Model.variables`` order: all trainable weights in layer-creation
    order, then all BN moving statistics in the same order.
    ``interleaved=True`` emits per-layer creation order instead (some TF
    checkpoint dumps come that way); importers must accept both.
    """
    scope = "efficientnetv2-l"
    trainable: Spec = []
    moving: Spec = []

    def bn(layer_scope: str, c: int):
        trainable.append((f"{scope}/{layer_scope}/gamma:0", (c,)))
        trainable.append((f"{scope}/{layer_scope}/beta:0", (c,)))
        moving.append((f"{scope}/{layer_scope}/moving_mean:0", (c,)))
        moving.append((f"{scope}/{layer_scope}/moving_variance:0", (c,)))
        if interleaved:
            trainable.append(moving.pop(-2))
            trainable.append(moving.pop(-1))

    bn_name = "tpu_batch_normalization"
    trainable.append((f"{scope}/stem/conv2d/kernel:0", (3, 3, 3, 32)))
    bn(f"stem/{bn_name}", 32)

    cin = 32
    b = 0
    for fused, expand, filters, blocks, se_ratio in _V2L_STAGES:
        for _ in range(blocks):
            blk = f"blocks_{b}"
            mid = cin * expand
            if fused:
                if expand != 1:
                    trainable.append((f"{scope}/{blk}/conv2d/kernel:0", (3, 3, cin, mid)))
                    bn(f"{blk}/{bn_name}", mid)
                    trainable.append((f"{scope}/{blk}/conv2d_1/kernel:0", (1, 1, mid, filters)))
                    bn(f"{blk}/{bn_name}_1", filters)
                else:
                    trainable.append((f"{scope}/{blk}/conv2d/kernel:0", (3, 3, cin, filters)))
                    bn(f"{blk}/{bn_name}", filters)
            else:
                trainable.append((f"{scope}/{blk}/conv2d/kernel:0", (1, 1, cin, mid)))
                bn(f"{blk}/{bn_name}", mid)
                trainable.append((f"{scope}/{blk}/depthwise_conv2d/depthwise_kernel:0",
                                  (3, 3, mid, 1)))
                bn(f"{blk}/{bn_name}_1", mid)
                if se_ratio > 0:
                    r = max(1, int(cin * se_ratio))
                    trainable.append((f"{scope}/{blk}/se/conv2d/kernel:0", (1, 1, mid, r)))
                    trainable.append((f"{scope}/{blk}/se/conv2d/bias:0", (r,)))
                    trainable.append((f"{scope}/{blk}/se/conv2d_1/kernel:0", (1, 1, r, mid)))
                    trainable.append((f"{scope}/{blk}/se/conv2d_1/bias:0", (mid,)))
                trainable.append((f"{scope}/{blk}/conv2d_1/kernel:0", (1, 1, mid, filters)))
                bn(f"{blk}/{bn_name}_2", filters)
            cin = filters
            b += 1

    trainable.append((f"{scope}/head/conv2d/kernel:0", (1, 1, cin, 1280)))
    bn(f"head/{bn_name}", 1280)
    return trainable + moving


# ----------------------------------------------------------------- TRXOS


def trxos_state_dict_spec(input_type: str = "skeleton", seq_len: int = 16,
                          n_joints: int = 30) -> Spec:
    """Reference TRXOS DISC checkpoint key order (model.py:260-288):
    features_extractor (ModuleDict: sk MLP and/or rgb Sequential-of-resnet50-
    children), transformers.0 (K/V linears + LayerNorm), discriminator,
    post_resnet. Buffers (positional-encoding ``pe``) are part of the state
    dict too."""
    s: Spec = []
    if input_type in ("skeleton", "hybrid"):
        d = n_joints * 3
        s += [
            (f"features_extractor.sk.fc1.weight", (d * 2, d)),
            (f"features_extractor.sk.fc1.bias", (d * 2,)),
            (f"features_extractor.sk.fc2.weight", (256, d * 2)),
            (f"features_extractor.sk.fc2.bias", (256,)),
        ]
    if input_type in ("rgb", "hybrid"):
        # nn.Sequential(*list(resnet50.children())[:-1]): indices 0=conv1,
        # 1=bn1, 4..7=layer1..4 (2=relu, 3=maxpool, 8=avgpool are param-free)
        rn = torchvision_resnet_state_dict_spec(50, include_fc=False)
        remap = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
                 "layer3": "6", "layer4": "7"}
        for k, shape in rn:
            top, _, rest = k.partition(".")
            s.append((f"features_extractor.rgb.{remap[top]}.{rest}", shape))
    # TemporalCrossTransformer (model.py:35-56): pe buffer, k/v linears, norm
    in_dim = 256 if input_type != "hybrid" else 512
    s += [
        ("transformers.0.pe.pe", (1, int(seq_len * 1.5), in_dim)),
        ("transformers.0.k_linear.weight", (128, in_dim * 2)),
        ("transformers.0.k_linear.bias", (128,)),
        ("transformers.0.v_linear.weight", (128, in_dim * 2)),
        ("transformers.0.v_linear.bias", (128,)),
        ("transformers.0.norm_k.weight", (128,)),
        ("transformers.0.norm_k.bias", (128,)),
    ]
    n_tuples = seq_len * (seq_len - 1) // 2
    s += [
        ("discriminator.dimensionality_reduction.weight", (seq_len, 128)),
        ("discriminator.dimensionality_reduction.bias", (seq_len,)),
        ("discriminator.fc1.weight", (256, n_tuples * seq_len)),
        ("discriminator.fc1.bias", (256,)),
        ("discriminator.fc2.weight", (64, 256)),
        ("discriminator.fc2.bias", (64,)),
        ("discriminator.fc3.weight", (1, 64)),
        ("discriminator.fc3.bias", (1,)),
        ("post_resnet.l1.weight", (256, 2048)),
        ("post_resnet.l1.bias", (256,)),
    ]
    return s
