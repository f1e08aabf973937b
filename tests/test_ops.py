"""Parity tests of core ops against torch (CPU) reference semantics."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from hiast_tpu.ops import losses as L
from hiast_tpu.ops import metrics as M
from hiast_tpu.ops.resize import bilinear_resize, nearest_resize

RNG = np.random.default_rng(0)


def rand_logits(b=2, h=8, w=12, c=19):
    return RNG.normal(size=(b, h, w, c)).astype(np.float32)


def rand_labels(b=2, h=8, w=12, c=19, p_ignore=0.3):
    lbl = RNG.integers(0, c, size=(b, h, w)).astype(np.int32)
    ignore = RNG.random(size=(b, h, w)) < p_ignore
    return np.where(ignore, 255, lbl).astype(np.int32)


def to_nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1))


class TestResize:
    @pytest.mark.parametrize("align", [True, False])
    @pytest.mark.parametrize("shape", [((8, 12), (16, 24)), ((7, 9), (13, 31)), ((16, 24), (8, 12))])
    def test_bilinear_matches_torch(self, align, shape):
        (h, w), (oh, ow) = shape
        x = RNG.normal(size=(2, h, w, 3)).astype(np.float32)
        got = np.asarray(bilinear_resize(jnp.asarray(x), oh, ow, align_corners=align))
        want = F.interpolate(to_nchw(x), (oh, ow), mode="bilinear", align_corners=align)
        np.testing.assert_allclose(got, np.moveaxis(want.numpy(), 1, -1), atol=1e-5)

    def test_bilinear_identity(self):
        x = RNG.normal(size=(1, 4, 4, 2)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(bilinear_resize(jnp.asarray(x), 4, 4)), x)

    def test_nearest_matches_torch(self):
        x = RNG.integers(0, 255, size=(2, 8, 12)).astype(np.float32)
        got = np.asarray(nearest_resize(jnp.asarray(x), 16, 30))
        want = F.interpolate(torch.from_numpy(x)[:, None], (16, 30), mode="nearest")[:, 0]
        np.testing.assert_array_equal(got, want.numpy())


class TestCE:
    def test_mean_over_valid(self):
        logits, labels = rand_logits(), rand_labels()
        got = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        want = F.cross_entropy(to_nchw(logits), torch.from_numpy(labels).long(), ignore_index=255)
        assert abs(got - float(want)) < 1e-5

    def test_region_masked(self):
        logits, labels = rand_logits(), rand_labels()
        refer = rand_labels()
        got = float(
            L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), refer_labels=jnp.asarray(refer), region="ignored")
        )
        # torch reference semantics: unreduced CE * mask, sum / nonzero-count
        per = F.cross_entropy(to_nchw(logits), torch.from_numpy(labels).long(), ignore_index=255, reduction="none")
        mask = torch.from_numpy(refer == 255)
        masked = per * mask
        want = masked.sum() / (masked != 0).sum()
        assert abs(got - float(want)) < 1e-5


class TestSoftCE:
    def test_region_masked(self):
        logits = rand_logits()
        target = np.asarray(torch.softmax(torch.from_numpy(rand_logits()), dim=-1))
        refer = rand_labels()
        got = float(
            L.soft_cross_entropy(
                jnp.asarray(logits), jnp.asarray(target), refer_labels=jnp.asarray(refer), region="ignored"
            )
        )
        nll = -F.log_softmax(to_nchw(logits), dim=1)
        per = nll * to_nchw(target)
        mask = torch.from_numpy(refer == 255)[:, None]
        masked = per * mask
        want = masked.sum() / (masked != 0).sum()
        assert abs(got - float(want)) < 1e-5

    def test_plain_mean(self):
        logits = rand_logits()
        target = np.asarray(torch.softmax(torch.from_numpy(rand_logits()), dim=-1))
        got = float(L.soft_cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
        nll = -F.log_softmax(to_nchw(logits), dim=1)
        want = (nll * to_nchw(target)).sum() / to_nchw(target).numel()
        assert abs(got - float(want)) < 1e-5


class TestRegularizers:
    def test_kld_to_uniform_matches_reference_formula(self):
        logits, labels = rand_logits(), rand_labels()
        conf, _ = L.build_region_weight(jnp.asarray(labels))
        got = float(L.kld_to_uniform(jnp.asarray(logits), conf))
        # reference _kld (self_training_segmentor.py:153-163) with the exact
        # [B, C, H, W] broadcast weight build_region_weight returns there —
        # val_num counts #pixels * C, NOT #pixels
        w = torch.from_numpy((labels != 255).astype(np.float32))[:, None]
        w = w * torch.ones_like(to_nchw(logits))  # [B, C, H, W]
        lsm = F.log_softmax(to_nchw(logits), dim=1)
        val_num = (w > 0).sum()
        want = (-1.0 / 19 * w * lsm).sum() / val_num
        assert abs(got - float(want)) < 1e-5

    def test_entropy_matches_reference_formula(self):
        logits, labels = rand_logits(), rand_labels()
        _, ign = L.build_region_weight(jnp.asarray(labels))
        got = float(L.entropy_sharpen(jnp.asarray(logits), ign))
        w = torch.from_numpy((labels == 255).astype(np.float32))[:, None]
        w = w * torch.ones_like(to_nchw(logits))  # [B, C, H, W] as in the ref
        lsm = F.log_softmax(to_nchw(logits), dim=1)
        val_num = (w > 0).sum()
        want = (-torch.softmax(to_nchw(logits), dim=1) * w * lsm).sum() / val_num
        assert abs(got - float(want)) < 1e-5

    def test_adversarial_helpers(self):
        logits = rand_logits(c=19)
        p = np.asarray(torch.softmax(to_nchw(logits), dim=1))
        got_ent = float(L.mean_entropy(jnp.asarray(np.moveaxis(p, 1, -1))))
        v = torch.from_numpy(p)
        n, c, h, w = v.shape
        want = float(-torch.sum(v * torch.log2(v + 1e-30)) / (n * h * w * np.log2(c)))
        assert abs(got_ent - want) < 1e-4
        got_map = np.asarray(L.prob_to_entropy(jnp.asarray(np.moveaxis(p, 1, -1))))
        want_map = (-v * torch.log2(v + 1e-30) / np.log2(c)).numpy()
        np.testing.assert_allclose(got_map, np.moveaxis(want_map, 1, -1), atol=1e-4)


class TestMSEBCE:
    def test_mse(self):
        a, b = rand_logits(c=1), rand_logits(c=1)
        got = float(L.mse(jnp.asarray(a), jnp.asarray(b)))
        assert abs(got - float(F.mse_loss(torch.from_numpy(a), torch.from_numpy(b)))) < 1e-6

    def test_bce(self):
        x = rand_logits(c=1)
        y = (RNG.random(size=x.shape) > 0.5).astype(np.float32)
        got = float(L.bce_with_logits(jnp.asarray(x), jnp.asarray(y)))
        want = F.binary_cross_entropy_with_logits(torch.from_numpy(x), torch.from_numpy(y))
        assert abs(got - float(want)) < 1e-6


class TestMetrics:
    def test_intersection_union_matches_torch_histc(self):
        pred = rand_labels(p_ignore=0.0)
        target = rand_labels(p_ignore=0.2)
        inter, union = M.intersection_and_union(jnp.asarray(pred), jnp.asarray(target), 19)
        # reference intersectionAndUnionGPU (metrics.py:6-19)
        output = torch.from_numpy(pred.reshape(-1).copy())
        tgt = torch.from_numpy(target.reshape(-1))
        output[tgt == 255] = 255
        inter_ref = output[output == tgt]
        ai = torch.histc(inter_ref.float(), bins=19, min=0, max=18)
        ao = torch.histc(output.float(), bins=19, min=0, max=18)
        at = torch.histc(tgt.float(), bins=19, min=0, max=18)
        np.testing.assert_array_equal(np.asarray(inter), ai.numpy())
        np.testing.assert_array_equal(np.asarray(union), (ao + at - ai).numpy())

    def test_synthia_protocol(self):
        iou = np.linspace(0.1, 0.9, 19)
        m16, m13 = M.synthia_mious(iou)
        assert abs(m16 - np.mean(iou) * 19 / 16) < 1e-9
        iou13 = iou.copy()
        iou13[3:6] = 0
        assert abs(m13 - np.mean(iou13) * 19 / 13) < 1e-9


class TestConfig:
    def test_layering_and_freeze(self, tmp_path):
        from hiast_tpu.config import load_config

        base = tmp_path / "base.yaml"
        base.write_text("trainer: 'SelfTrainingTrainer'\ntrain:\n  lr: 3e-6\n  batch_size: 6\n")
        setting = tmp_path / "setting.yaml"
        setting.write_text("trainer: 'ConsistencySelfTrainingTrainer'\ncst_training:\n  is_enabled: True\n")
        cfg = load_config(str(base), str(setting), overrides=["train.lr", "2e-6"])
        assert cfg.trainer == "ConsistencySelfTrainingTrainer"
        assert cfg.train.lr == 2e-6
        assert cfg.train.batch_size == 6
        assert cfg.cst_training.is_enabled
        with pytest.raises(AttributeError):
            cfg.train.lr = 1.0

    def test_unknown_key_rejected(self):
        from hiast_tpu.config import default_config

        cfg = default_config()
        with pytest.raises(KeyError):
            cfg.merge_from_dict({"train": {"nonexistent": 1}})

    def test_legacy_gpu_keys_dropped(self, tmp_path):
        from hiast_tpu.config import load_config

        f = tmp_path / "legacy.yaml"
        f.write_text("train:\n  apex_opt: 'O1'\n  gpu_num: 2\n  port: 6789\n  lr: 1e-5\n")
        with pytest.warns(UserWarning):
            cfg = load_config(str(f))
        assert cfg.train.lr == 1e-5

    def test_reference_yaml_configs_load(self):
        """Our shipped configs mirror the reference's sl_1/hiast_setting."""
        import os

        from hiast_tpu.config import load_config

        cfg_dir = os.path.join(os.path.dirname(__file__), "..", "hiast_tpu", "configs")
        cfg = load_config(
            os.path.join(cfg_dir, "sl_1.yaml"), os.path.join(cfg_dir, "hiast_setting.yaml")
        )
        assert cfg.trainer == "ConsistencySelfTrainingTrainer"
        assert cfg.pseudo_policy.ias.alpha == 0.5
        assert cfg.preprocessor.copy_paste.selected_num_classes == 14
