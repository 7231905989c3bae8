"""Non-circular weight-importer proofs.

Each test synthesizes a checkpoint in the VENDORED upstream layout
(tests/fixtures_upstream.py — names, shapes and ordering encoded from the
upstream sources the reference consumes, NOT from this repo's flax trees),
fills every tensor with a unique per-key value, imports it, and asserts:

1. every upstream tensor is consumed (strict importers raise otherwise),
2. every flax parameter/stat leaf is overwritten (full coverage),
3. spot position checks: hand-picked upstream keys land on the flax leaves
   the architecture analysis says they must (catches silent scrambles among
   identically-shaped layers),
4. the result is independent of state-dict iteration order.

A failure here means the flax architecture definition drifted from the
upstream registration order — exactly the silent-weight-scramble class of
bug these tests exist to catch.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax
import pytest

from tests.fixtures_upstream import (
    effnetv2_l_tf_variables_spec,
    tianxiaomo_yolov4_state_dict_spec,
    torchvision_resnet_state_dict_spec,
    trxos_state_dict_spec,
)


def _materialize(spec, transform=None):
    """spec -> dict/list of arrays where entry i is filled with i+1."""
    out = []
    for i, (key, shape) in enumerate(spec):
        arr = np.full(shape, float(i + 1), np.float32)
        out.append((key, arr))
    return out


def _zeros_template(shapes):
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)


def _fill_value(spec, key):
    for i, (k, _) in enumerate(spec):
        if k == key:
            return float(i + 1)
    raise KeyError(key)


def _assert_all_filled(variables, collections=("params", "batch_stats")):
    for col in collections:
        flat = flax.traverse_util.flatten_dict(variables.get(col, {}))
        untouched = ["/".join(k) for k, v in flat.items() if not np.all(np.asarray(v) != 0)]
        assert not untouched, f"{col} leaves not overwritten by import: {untouched[:10]}"


class TestYolov4Tianxiaomo:
    @pytest.fixture(scope="class")
    def template(self):
        from isbfsar_tpu.models.yolov4 import YOLOv4

        model = YOLOv4(dtype=jnp.float32)  # full-size reference architecture
        shapes = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros((1, 256, 256, 3))), jax.random.key(0)
        )
        return _zeros_template(shapes)

    @pytest.fixture(scope="class")
    def imported(self, template):
        from isbfsar_tpu.utils.checkpoint import import_yolov4_tianxiaomo

        spec = tianxiaomo_yolov4_state_dict_spec()
        sd = dict(_materialize(spec))
        return spec, import_yolov4_tianxiaomo(sd, template)

    def test_full_coverage(self, imported):
        _, variables = imported
        _assert_all_filled(variables)

    def test_spot_positions(self, imported):
        spec, variables = imported
        p = flax.traverse_util.flatten_dict(variables["params"])
        s = flax.traverse_util.flatten_dict(variables["batch_stats"])

        def val(key):
            return _fill_value(spec, key)

        # stem is down1.conv1 (upstream DownSample1 forward x1=conv1(input))
        assert p[("backbone", "stem", "conv", "kernel")].flat[0] == val("down1.conv1.conv.0.weight")
        # down1's residual 1x1 is conv5 (64->32); its 3x3 is conv6
        assert p[("backbone", "stage1", "res0", "conv1", "conv", "kernel")].flat[0] == val(
            "down1.conv5.conv.0.weight"
        )
        assert p[("backbone", "stage1", "res0", "conv2", "conv", "kernel")].flat[0] == val(
            "down1.conv6.conv.0.weight"
        )
        # CSP route vs trunk-in (identical 1x1 shapes -> position-critical):
        # down3.conv2 is the route (concatenated second in upstream forward),
        # down3.conv3 feeds the residual trunk
        assert p[("backbone", "stage3", "route", "conv", "kernel")].flat[0] == val(
            "down3.conv2.conv.0.weight"
        )
        assert p[("backbone", "stage3", "trunk_in", "conv", "kernel")].flat[0] == val(
            "down3.conv3.conv.0.weight"
        )
        # neck conv7 (pre-upsample) vs conv8 (lateral) — same 512->256 1x1
        assert p[("neck", "p5_up", "conv", "kernel")].flat[0] == val("neek.conv7.conv.0.weight")
        assert p[("neck", "lat4", "conv", "kernel")].flat[0] == val("neek.conv8.conv.0.weight")
        # same trap one level up: conv14 pre-upsample vs conv15 lateral
        assert p[("neck", "p4_up", "conv", "kernel")].flat[0] == val("neek.conv14.conv.0.weight")
        assert p[("neck", "lat3", "conv", "kernel")].flat[0] == val("neek.conv15.conv.0.weight")
        # detection heads: conv2/conv10/conv18 are the linear 255-channel outs
        assert p[("head1_out", "conv", "kernel")].flat[0] == val("head.conv2.conv.0.weight")
        assert p[("head1_out", "conv", "bias")].flat[0] == val("head.conv2.conv.0.bias")
        assert p[("head2_out", "conv", "kernel")].flat[0] == val("head.conv10.conv.0.weight")
        assert p[("head3_out", "conv", "kernel")].flat[0] == val("head.conv18.conv.0.weight")
        # bn stats ride along (stage5 merge = down5.conv5)
        assert s[("backbone", "stage5", "merge", "bn", "mean")].flat[0] == val(
            "down5.conv5.conv.1.running_mean"
        )

    def test_order_independence(self, template, imported):
        from isbfsar_tpu.utils.checkpoint import import_yolov4_tianxiaomo

        spec, variables = imported
        sd = dict(reversed(_materialize(spec)))
        again = import_yolov4_tianxiaomo(sd, template)
        jax.tree.map(np.testing.assert_array_equal, variables, again)

    def test_neck_rename_accepted(self, template, imported):
        """The reference rewrites neek->neck before re-saving
        (1_extract_yolo_onnx.py:34-38); both spellings must import."""
        from isbfsar_tpu.utils.checkpoint import import_yolov4_tianxiaomo

        spec, variables = imported
        sd = {k.replace("neek.", "neck."): v for k, v in _materialize(spec)}
        again = import_yolov4_tianxiaomo(sd, template)
        jax.tree.map(np.testing.assert_array_equal, variables, again)

    def test_missing_layer_is_loud(self, template):
        from isbfsar_tpu.utils.checkpoint import import_yolov4_tianxiaomo

        sd = dict(_materialize(tianxiaomo_yolov4_state_dict_spec()))
        del sd["neek.conv7.conv.0.weight"]
        with pytest.raises(KeyError):
            import_yolov4_tianxiaomo(sd, template)

    def test_extra_key_is_loud(self, template):
        from isbfsar_tpu.utils.checkpoint import import_yolov4_tianxiaomo

        sd = dict(_materialize(tianxiaomo_yolov4_state_dict_spec()))
        sd["head.conv19.conv.0.weight"] = np.zeros((1, 1, 1, 1), np.float32)
        with pytest.raises(ValueError):
            import_yolov4_tianxiaomo(sd, template)


class TestEffnetV2Metrabs:
    @pytest.fixture(scope="class")
    def template(self):
        from isbfsar_tpu.models.effnetv2 import EfficientNetV2

        model = EfficientNetV2(dtype=jnp.float32)  # V2-L
        shapes = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros((1, 256, 256, 3))), jax.random.key(0)
        )
        return _zeros_template(shapes)

    @pytest.fixture(scope="class")
    def imported(self, template):
        from isbfsar_tpu.utils.checkpoint import import_metrabs_effnetv2

        spec = effnetv2_l_tf_variables_spec()
        return spec, import_metrabs_effnetv2(_materialize(spec), template)

    def test_full_coverage(self, imported):
        _, variables = imported
        _assert_all_filled(variables)

    def test_param_census(self, template):
        """The fixture's total parameter count must equal the flax tree's —
        a block-count or width drift anywhere in the 79 blocks breaks this."""
        spec = effnetv2_l_tf_variables_spec()
        fixture_n = sum(int(np.prod(shape)) for _, shape in spec)
        flax_n = sum(
            int(np.prod(v.shape))
            for col in ("params", "batch_stats")
            for v in jax.tree.leaves(template.get(col, {}))
        )
        assert fixture_n == flax_n

    def test_spot_positions(self, imported):
        spec, variables = imported
        p = flax.traverse_util.flatten_dict(variables["params"])
        s = flax.traverse_util.flatten_dict(variables["batch_stats"])

        def val(key):
            return _fill_value(spec, key)

        # stage0 is fused expand=1: its only conv is blocks_0/conv2d
        assert p[("stage0_block0", "project_conv", "kernel")].flat[0] == val(
            "efficientnetv2-l/blocks_0/conv2d/kernel:0"
        )
        # first MBConv stage (stage3 == blocks_18): expand vs project
        assert p[("stage3_block0", "expand_conv", "kernel")].flat[0] == val(
            "efficientnetv2-l/blocks_18/conv2d/kernel:0"
        )
        assert p[("stage3_block0", "project_conv", "kernel")].flat[0] == val(
            "efficientnetv2-l/blocks_18/conv2d_1/kernel:0"
        )
        # depthwise kernel transposed HWC1 -> HW1C
        k = p[("stage3_block0", "depthwise_conv", "kernel")]
        assert k.shape[2] == 1 and k.flat[0] == val(
            "efficientnetv2-l/blocks_18/depthwise_conv2d/depthwise_kernel:0"
        )
        # SE biases
        assert p[("stage3_block0", "se", "reduce", "bias")].flat[0] == val(
            "efficientnetv2-l/blocks_18/se/conv2d/bias:0"
        )
        # final block + head, moving stats routed to the right bn
        assert p[("stage6_block6", "project_conv", "kernel")].flat[0] == val(
            "efficientnetv2-l/blocks_78/conv2d_1/kernel:0"
        )
        assert s[("stage6_block6", "project_bn", "var")].flat[0] == val(
            "efficientnetv2-l/blocks_78/tpu_batch_normalization_2/moving_variance:0"
        )
        assert p[("head_conv", "kernel")].flat[0] == val(
            "efficientnetv2-l/head/conv2d/kernel:0"
        )
        assert s[("head_bn", "mean")].flat[0] == val(
            "efficientnetv2-l/head/tpu_batch_normalization/moving_mean:0"
        )

    def test_layout_invariance(self, template, imported):
        """Trainable-first (Keras Model.variables) and per-layer-interleaved
        dumps must import identically."""
        from isbfsar_tpu.utils.checkpoint import import_metrabs_effnetv2

        spec_tf = effnetv2_l_tf_variables_spec(interleaved=False)
        spec_il = effnetv2_l_tf_variables_spec(interleaved=True)
        assert [k for k, _ in spec_tf] != [k for k, _ in spec_il]
        # fill by NAME so the two layouts carry identical values per variable
        values = {k: float(i + 1) for i, (k, _) in enumerate(spec_tf)}
        mk = lambda spec: [(k, np.full(sh, values[k], np.float32)) for k, sh in spec]
        a = import_metrabs_effnetv2(mk(spec_tf), template)
        b = import_metrabs_effnetv2(mk(spec_il), template)
        jax.tree.map(np.testing.assert_array_equal, a, b)

    def test_unknown_scope_is_loud(self, template):
        from isbfsar_tpu.utils.checkpoint import import_metrabs_effnetv2

        vars_ = _materialize(effnetv2_l_tf_variables_spec())
        vars_.append(("efficientnetv2-l/blocks_79/conv2d/kernel:0", np.zeros((1, 1, 1, 1), np.float32)))
        with pytest.raises(KeyError):
            import_metrabs_effnetv2(vars_, template)


class TestTorchvisionResnets:
    @pytest.mark.parametrize("depth,stage_sizes,include_fc", [
        (18, (2, 2, 2, 2), True),   # ETH-XGaze trunk shape
        (50, (3, 4, 6, 3), False),  # TRXOS rgb branch (children()[:-1], no fc)
    ])
    def test_structure_and_positions(self, depth, stage_sizes, include_fc):
        from isbfsar_tpu.models.resnet import resnet18, resnet50
        from isbfsar_tpu.utils.checkpoint import import_resnet_torch

        spec = torchvision_resnet_state_dict_spec(depth, include_fc=include_fc)
        sd = dict(_materialize(spec))
        imported = import_resnet_torch(sd, stage_sizes=stage_sizes)

        model = (resnet18 if depth == 18 else resnet50)(
            num_classes=1000 if include_fc else 0, dtype=jnp.float32
        )
        shapes = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros((1, 64, 64, 3))), jax.random.key(0)
        )
        # identical tree structure + shapes as a fresh flax init
        flat_want = flax.traverse_util.flatten_dict(shapes["params"])
        flat_got = flax.traverse_util.flatten_dict(imported["params"])
        assert set(flat_want) == set(flat_got)
        for k in flat_want:
            assert tuple(flat_want[k].shape) == tuple(np.asarray(flat_got[k]).shape), k
        _assert_all_filled(imported)

        # positions
        assert flat_got[("conv1", "kernel")].flat[0] == _fill_value(spec, "conv1.weight")
        last = f"layer4_{stage_sizes[3] - 1}"
        assert flat_got[(last, "conv1", "kernel")].flat[0] == _fill_value(
            spec, f"layer4.{stage_sizes[3] - 1}.conv1.weight"
        )
        down = ("layer2_0", "downsample_conv", "kernel")
        assert flat_got[down].flat[0] == _fill_value(spec, "layer2.0.downsample.0.weight")


class TestTRXOSCheckpoint:
    @pytest.mark.parametrize("input_type", ["skeleton", "hybrid"])
    def test_full_tree(self, input_type):
        import torch

        from isbfsar_tpu.configs import ARConfig
        from isbfsar_tpu.models.trx import TRXOS
        from isbfsar_tpu.utils.checkpoint import import_trxos_full

        seq_len = 16 if input_type == "skeleton" else 8
        spec = trxos_state_dict_spec(input_type=input_type, seq_len=seq_len)
        # reference checkpoints carry DataParallel '.module' prefixes on the
        # rgb branch (ar.py:17-19) — reproduce that too
        sd = {
            (k.replace("features_extractor.rgb", "features_extractor.rgb.module")
             if "rgb" in k else k): torch.from_numpy(v)
            for k, v in _materialize(spec)
        }
        imported = import_trxos_full(sd, input_type=input_type)

        cfg = ARConfig(input_type=input_type, seq_len=seq_len)
        model = TRXOS(cfg)
        data = {}
        sdata = {}
        if input_type in ("skeleton", "hybrid"):
            data["sk"] = jnp.zeros((1, seq_len, 90))
            sdata["sk"] = jnp.zeros((1, cfg.way, seq_len, 90))
        if input_type in ("rgb", "hybrid"):
            data["rgb"] = jnp.zeros((1, seq_len, 224, 224, 3))
            sdata["rgb"] = jnp.zeros((1, cfg.way, seq_len, 224, 224, 3))
        shapes = jax.eval_shape(
            lambda k: model.init(k, data, jnp.ones((1, cfg.way), bool), support_data=sdata),
            jax.random.key(0),
        )
        flat_want = flax.traverse_util.flatten_dict(shapes["params"])
        flat_got = flax.traverse_util.flatten_dict(imported["params"])
        assert set(flat_want) == set(flat_got)
        for k in flat_want:
            assert tuple(flat_want[k].shape) == tuple(np.asarray(flat_got[k]).shape), k

        # positions: torch Linear weight (out, in) -> flax kernel (in, out)
        assert flat_got[("transformer", "k_linear", "kernel")].flat[0] == _fill_value(
            spec, "transformers.0.k_linear.weight"
        )
        assert flat_got[("discriminator", "fc3", "bias")].flat[0] == _fill_value(
            spec, "discriminator.fc3.bias"
        )
        if input_type == "hybrid":
            assert flat_got[("rgb_extractor", "post", "kernel")].flat[0] == _fill_value(
                spec, "post_resnet.l1.weight"
            )
            assert flat_got[
                ("rgb_extractor", "ResNet_0", "layer3_0", "conv2", "kernel")
            ].flat[0] == _fill_value(spec, "features_extractor.rgb.6.0.conv2.weight")
