"""Golden-value parity: Flax DeepLab-v2 vs an equivalent torch model.

A miniature torch twin (written here, torchvision-free) exercises every
structural convention — stem conv/BN/maxpool padding, bottleneck wiring,
downsample branches, layer2 stride, layer3/4 dilation surgery, ASPP sums —
through the .pth converter, at (1,1,1,1) block depth for speed.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from hiast_tpu.models.convert import flax_to_torch_state_dict, torch_state_dict_to_flax
from hiast_tpu.models.deeplab_v2 import DeepLabV2, FCDiscriminator

LAYERS = (1, 1, 1, 1)


class TorchBottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=False):
        super().__init__()
        out = planes * 4
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(
            planes, planes, 3, stride=stride, padding=dilation, dilation=dilation, bias=False
        )
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, out, 1, stride=stride, bias=False), tnn.BatchNorm2d(out)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


class TorchBackbone(tnn.Module):
    def __init__(self, layers=LAYERS):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        spec = [(64, 1, 1, 1), (128, 2, 1, 1), (256, 1, 1, 2), (512, 1, 2, 4)]
        inplanes = 64
        for li, ((planes, stride, dil0, dil), depth) in enumerate(zip(spec, layers)):
            blocks = []
            for bi in range(depth):
                first = bi == 0
                blocks.append(
                    TorchBottleneck(
                        inplanes if first else planes * 4,
                        planes,
                        stride=stride if first else 1,
                        dilation=dil0 if first else dil,
                        downsample=first,
                    )
                )
            inplanes = planes * 4
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


class TorchDeepLabV2(tnn.Module):
    def __init__(self, num_classes=19, layers=LAYERS):
        super().__init__()
        self.backbone = TorchBackbone(layers)
        self.aspp_convs = tnn.ModuleList(
            [tnn.Conv2d(2048, num_classes, 3, padding=d, dilation=d) for d in (6, 12, 18, 24)]
        )
        # expose torch-style names for the converter
        for i, m in enumerate(self.aspp_convs):
            self.add_module(f"aspp_alias_{i}", m)
        self.representation = tnn.Sequential(tnn.Conv2d(2048, 256, 1))

    def state_dict_reference_names(self):
        sd = {}
        for k, v in self.backbone.state_dict().items():
            sd[f"backbone.{k}"] = v
        for i, m in enumerate(self.aspp_convs):
            for k, v in m.state_dict().items():
                sd[f"aspp.conv2d_list.{i}.{k}"] = v
        for k, v in self.representation.state_dict().items():
            sd[f"representation.{k}"] = v
        return sd

    def forward(self, x):
        feat = self.backbone(x)
        out = self.aspp_convs[0](feat)
        for m in self.aspp_convs[1:]:
            out = out + m(feat)
        return out, feat


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = TorchDeepLabV2().eval()
    # randomize BN stats so frozen-BN parity is actually exercised
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.normal_(1.0, 0.2)
            m.bias.data.normal_(0, 0.2)
    return model


def test_deeplab_forward_matches_torch(torch_model):
    variables = torch_state_dict_to_flax(torch_model.state_dict_reference_names())
    variables = jax.tree.map(jnp.asarray, variables)
    flax_model = DeepLabV2(num_classes=19, backbone_layers=LAYERS)

    x = np.random.default_rng(1).normal(size=(1, 65, 97, 3)).astype(np.float32)
    with torch.no_grad():
        want_logits, want_feat = torch_model(torch.from_numpy(np.moveaxis(x, -1, 1)))
    got = flax_model.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(
        np.asarray(got["backbone"]), np.moveaxis(want_feat.numpy(), 1, -1), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["logits"]), np.moveaxis(want_logits.numpy(), 1, -1), atol=2e-3
    )
    # output stride 8
    assert got["logits"].shape == (1, 9, 13, 19)


def test_convert_roundtrip(torch_model):
    sd = torch_model.state_dict_reference_names()
    variables = torch_state_dict_to_flax(sd)
    back = flax_to_torch_state_dict(variables)
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[k], v.numpy(), err_msg=k)


def test_deeplab_full_depth_matches_torch():
    """Full (3,4,23,3) R101 parity: depth-dependent wiring — dilation applied
    to blocks >= 1 of layer3/4, layerL_B naming, downsample only at block 0 —
    is exactly what the 1-block twin above cannot catch (reference:
    code/sseg/models/modules/resnet.py:101-190, deeplab_v2.py:42-56)."""
    layers = (3, 4, 23, 3)
    torch.manual_seed(3)
    twin = TorchDeepLabV2(layers=layers).eval()
    for m in twin.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.8, 1.5)
            m.weight.data.normal_(1.0, 0.1)
            m.bias.data.normal_(0, 0.1)
    variables = torch_state_dict_to_flax(twin.state_dict_reference_names())
    variables = jax.tree.map(jnp.asarray, variables)
    flax_model = DeepLabV2(num_classes=19, backbone_layers=layers)

    x = np.random.default_rng(4).normal(size=(1, 33, 49, 3)).astype(np.float32)
    with torch.no_grad():
        want_logits, _ = twin(torch.from_numpy(np.moveaxis(x, -1, 1)))
    got = flax_model.apply(variables, jnp.asarray(x), train=False)
    want = np.moveaxis(want_logits.numpy(), 1, -1)
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(got["logits"]), want, atol=2e-3 * max(scale, 1.0))


def test_discriminator_shapes():
    model = FCDiscriminator()
    x = jnp.zeros((2, 64, 128, 19))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 2, 4, 1)


def test_full_resnet101_param_count():
    """DeepLab-v2 R101 has ~43M backbone+head params (sanity, no fwd)."""
    model = DeepLabV2(num_classes=19)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 65, 65, 3)), train=False)
    )
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(variables["params"]))
    assert 42_000_000 < n < 45_000_000, n


class TestDeepLabV3Plus:
    def test_forward_shapes(self):
        from hiast_tpu.registry import SEG_MODEL, populate

        populate()
        model = SEG_MODEL["DeepLab_V3Plus"](num_classes=19, backbone_layers=(1, 1, 1, 1))
        x = jnp.zeros((1, 64, 128, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False, return_representation=True)
        assert out["logits"].shape == (1, 16, 32, 19)  # decoder at stride 4
        assert out["backbone"].shape == (1, 8, 16, 2048)  # OS8 trunk
        assert out["representation"].shape == (1, 16, 32, 256)

    def test_backbone_params_shared_layout_with_v2(self):
        """The V3+ trunk reuses ResNetOS8 verbatim: same param tree under
        'backbone' as DeepLab_V2, so torchvision/HIAST backbone checkpoints
        load into either head unchanged."""
        from hiast_tpu.registry import SEG_MODEL, populate

        populate()
        x = jnp.zeros((1, 32, 64, 3))
        trees = {}
        for name in ("DeepLab_V2", "DeepLab_V3Plus"):
            model = SEG_MODEL[name](num_classes=19, backbone_layers=(1, 1, 1, 1))
            variables = model.init(jax.random.PRNGKey(0), x, train=False)
            trees[name] = jax.tree_util.tree_map_with_path(
                lambda p, leaf: leaf.shape, variables["params"]["backbone"]
            )
        assert trees["DeepLab_V2"] == trees["DeepLab_V3Plus"]

    def test_forward_matches_torch_twin(self):
        """Golden parity: the whole V3+ head (ASPP-v3 branches, image-level
        pooling, align_corners upsample, 48-ch low-level fusion, decoder)
        against an equivalent eval-mode torch model through the converter."""

        class TorchConvBN(tnn.Module):
            def __init__(self, cin, cout, k=3, dilation=1):
                super().__init__()
                pad = dilation * (k - 1) // 2
                self.conv = tnn.Conv2d(cin, cout, k, padding=pad, dilation=dilation, bias=False)
                self.bn = tnn.BatchNorm2d(cout)

            def forward(self, x):
                return F.relu(self.bn(self.conv(x)))

        class TorchASPPv3(tnn.Module):
            def __init__(self, cin=2048, f=256):
                super().__init__()
                self.branch0 = TorchConvBN(cin, f, k=1)
                self.branch1 = TorchConvBN(cin, f, dilation=12)
                self.branch2 = TorchConvBN(cin, f, dilation=24)
                self.branch3 = TorchConvBN(cin, f, dilation=36)
                self.pool_proj = TorchConvBN(cin, f, k=1)
                self.project = TorchConvBN(5 * f, f, k=1)

            def forward(self, x):
                ys = [self.branch0(x), self.branch1(x), self.branch2(x), self.branch3(x)]
                pooled = self.pool_proj(x.mean((2, 3), keepdim=True))
                ys.append(pooled.expand_as(ys[0]))
                return self.project(torch.cat(ys, dim=1))

        class TorchV3Plus(tnn.Module):
            def __init__(self, num_classes=19):
                super().__init__()
                self.backbone = TorchBackbone(LAYERS)
                self.aspp = TorchASPPv3()
                self.low_proj = TorchConvBN(256, 48, k=1)
                self.decoder0 = TorchConvBN(256 + 48, 256)
                self.decoder1 = TorchConvBN(256, 256)
                self.classifier = tnn.Conv2d(256, num_classes, 1)

            def forward(self, x):
                b = self.backbone
                x = b.maxpool(F.relu(b.bn1(b.conv1(x))))
                low = b.layer1(x)
                feat = b.layer4(b.layer3(b.layer2(low)))
                y = self.aspp(feat)
                y = F.interpolate(y, size=low.shape[2:], mode="bilinear", align_corners=True)
                y = torch.cat([y, self.low_proj(low)], dim=1)
                return self.classifier(self.decoder1(self.decoder0(y)))

        torch.manual_seed(3)
        twin = TorchV3Plus().eval()
        for m in twin.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.data.normal_(1.0, 0.2)
                m.bias.data.normal_(0, 0.2)

        from hiast_tpu.models.deeplab_v3plus import DeepLabV3Plus

        variables = torch_state_dict_to_flax(twin.state_dict())
        variables = jax.tree.map(jnp.asarray, variables)
        flax_model = DeepLabV3Plus(num_classes=19, backbone_layers=LAYERS)
        x = np.random.default_rng(4).normal(size=(1, 65, 97, 3)).astype(np.float32)
        with torch.no_grad():
            want = twin(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
        got = flax_model.apply(variables, jnp.asarray(x), train=False)
        assert got["logits"].shape == (1,) + want.shape[2:] + (19,)
        np.testing.assert_allclose(
            np.asarray(got["logits"]), np.moveaxis(want, 1, -1), atol=2e-3
        )

    def test_trains_in_consistency_step(self):
        from hiast_tpu.config import default_config
        from hiast_tpu.models.segmentors import build_segmentor
        from hiast_tpu.selftrain.steps import make_consistency_step
        from hiast_tpu.selftrain.train_state import TrainState, make_optimizer
        from hiast_tpu.registry import populate

        populate()
        cfg = default_config()
        cfg.model.type = "SelfTrainingSegmentor"
        cfg.model.seg_model.type = "DeepLab_V3Plus"
        cfg.cst_training.is_enabled = True
        cfg.cst_training.cst_loss.weight = 0.5
        cfg.train.total_iter = 4
        segmentor = build_segmentor(cfg, dtype=jnp.float32, backbone_layers=(1, 1, 1, 1))
        variables = segmentor.init_variables(jax.random.PRNGKey(0), (1, 64, 128, 3))
        tx = make_optimizer(cfg, variables["params"])
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            ema_params=jax.tree.map(jnp.copy, variables["params"]),
        )
        rng = np.random.default_rng(0)
        batch = {
            "t_img": rng.integers(0, 255, size=(2, 64, 128, 3)).astype(np.uint8),
            "t_plbl": np.where(
                rng.random(size=(2, 64, 128)) < 0.4,
                255,
                rng.integers(0, 19, size=(2, 64, 128)),
            ).astype(np.int32),
        }
        step = jax.jit(make_consistency_step(segmentor, tx, strong_aug="CCA"))
        new_state, losses = step(state, batch, jax.random.PRNGKey(1))
        for k in ("target_seg_loss", "cst_loss"):
            assert np.isfinite(float(losses[k])), k
        before = np.asarray(state.params["aspp"]["branch0"]["conv"]["kernel"])
        after = np.asarray(new_state.params["aspp"]["branch0"]["conv"]["kernel"])
        assert np.abs(after - before).max() > 0


class TestSegFormer:
    def test_b0_forward_shapes(self):
        from hiast_tpu.registry import SEG_MODEL, populate

        populate()
        model = SEG_MODEL["SegFormer_B0"](num_classes=19)
        x = jnp.zeros((1, 64, 128, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out["logits"].shape == (1, 16, 32, 19)  # stride 4
        assert out["backbone"].shape == (1, 2, 4, 256)  # stride 32

    def test_b0_trains_in_self_training_step(self):
        from hiast_tpu.config import default_config
        from hiast_tpu.models.segmentors import build_segmentor
        from hiast_tpu.selftrain.steps import make_self_training_step
        from hiast_tpu.selftrain.train_state import TrainState, make_optimizer
        from hiast_tpu.registry import populate

        populate()
        cfg = default_config()
        cfg.model.type = "SelfTrainingSegmentor"
        cfg.model.seg_model.type = "SegFormer_B0"
        cfg.train.total_iter = 4
        segmentor = build_segmentor(cfg, dtype=jnp.float32)
        variables = segmentor.init_variables(jax.random.PRNGKey(0), (1, 64, 128, 3))
        tx = make_optimizer(cfg, variables["params"])
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
        )
        rng = np.random.default_rng(0)
        batch = {
            "t_img": rng.integers(0, 255, size=(2, 64, 128, 3)).astype(np.uint8),
            "t_plbl": rng.integers(0, 19, size=(2, 64, 128)).astype(np.int32),
        }
        step = jax.jit(make_self_training_step(segmentor, tx))
        new_state, losses = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(losses["target_seg_loss"]))

    def test_remat_modes_match_no_remat(self):
        """Every runtime.remat_mode ('full' whole-trunk, 'dots' save-matmuls,
        'blocks'/'blocks_dots' per-transformer-block) computes the SAME step
        as no remat — identical losses and updated params, identical param
        tree (nn.remat must stay parameter-transparent so checkpoints
        interoperate across modes)."""
        from helpers import assert_same_step, make_b0_batch, run_b0_self_training_step

        batch = make_b0_batch()

        def run(remat: bool, mode: str):
            def mutate(cfg):
                cfg.runtime.remat = remat
                cfg.runtime.remat_mode = mode

            return run_b0_self_training_step(batch, mutate)

        ref = run(False, "full")
        for mode in ("full", "dots", "blocks", "blocks_dots"):
            assert_same_step(ref, run(True, mode), mode)

    def test_unknown_remat_mode_rejected(self):
        from helpers import make_b0_batch, run_b0_self_training_step

        def mutate(cfg):
            cfg.runtime.remat = True
            cfg.runtime.remat_mode = "block"  # typo'd singular

        with pytest.raises(ValueError, match="remat_mode"):
            run_b0_self_training_step(make_b0_batch(), mutate)

    def test_linear_fuse_matches_concat_fuse(self):
        """LinearFuse applies the fuse 1x1 kernel per stage BEFORE
        upsampling (models/segformer.py): prove it computes exactly the
        reference formulation — upsample every projected stage to 1/4 res,
        concat deepest-first, then one 1x1 conv — with the same kernel."""
        from hiast_tpu.models.segformer import LinearFuse
        from hiast_tpu.ops.resize import bilinear_resize

        rng = np.random.default_rng(3)
        embed = 16
        h, w = 16, 24
        parts_lowres = [  # CONCAT ORDER: deepest stage first
            jnp.asarray(rng.normal(size=(2, h // s, w // s, embed)).astype(np.float32))
            for s in (8, 4, 2, 1)
        ]
        fuse = LinearFuse(embed, dtype=jnp.float32)
        variables = fuse.init(jax.random.PRNGKey(0), parts_lowres, (h, w))
        got = fuse.apply(variables, parts_lowres, (h, w))

        kernel = variables["params"]["kernel"]  # [1, 1, 4*embed, embed]
        assert kernel.shape == (1, 1, 4 * embed, embed)
        up = [
            p if p.shape[1:3] == (h, w) else bilinear_resize(p, h, w, align_corners=False)
            for p in parts_lowres
        ]
        concat = jnp.concatenate(up, axis=-1)
        want = jnp.einsum("bhwc,cd->bhwd", concat, kernel[0, 0])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
