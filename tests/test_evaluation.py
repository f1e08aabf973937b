"""Evaluation-path tests: multi-scale/flip fusion semantics, validator color
export, recorder protocol, and the driver graft entry points."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hiast_tpu.config import default_config
from hiast_tpu.evaluation import Validator, colorize_mask, make_ms_flip_step, make_val_step, run_validation
from hiast_tpu.models.segmentors import build_segmentor
from hiast_tpu.ops.resize import bilinear_resize
from hiast_tpu.registry import populate
from hiast_tpu.selftrain.steps import normalize_image

populate()
RNG = np.random.default_rng(31)
TINY = (1, 1, 1, 1)


def tiny_segmentor(num_classes=19):
    cfg = default_config()
    cfg.model.type = "SourceOnlySegmentor"
    cfg.dataset.num_classes = num_classes
    seg = build_segmentor(cfg, dtype=jnp.float32, backbone_layers=TINY)
    variables = seg.init_variables(jax.random.PRNGKey(0), (1, 32, 64, 3))
    return cfg, seg, {"params": variables["params"], "batch_stats": variables["batch_stats"]}


class TestMSFlip:
    def test_fusion_matches_manual(self):
        """ms+flip step == hand-computed resize->softmax->flip->sum fusion."""
        cfg, seg, variables = tiny_segmentor()
        sizes = [(16, 32), (32, 64)]
        step = make_ms_flip_step(seg, sizes, is_flip=True, num_classes=19)
        img = RNG.integers(0, 255, size=(1, 32, 64, 3)).astype(np.uint8)
        lbl = RNG.integers(0, 19, size=(1, 32, 64)).astype(np.int32)
        pred, inter, union = step(
            variables["params"], variables["batch_stats"], jnp.asarray(img), jnp.asarray(lbl)
        )

        # manual fusion
        x = normalize_image(jnp.asarray(img))
        fused = None
        for rh, rw in sizes:
            scaled = bilinear_resize(x, rh, rw)

            def probs(z):
                out = seg.module.apply(variables, z, train=False)
                logits = bilinear_resize(out["logits"].astype(jnp.float32), z.shape[1], z.shape[2])
                return jax.nn.softmax(logits, axis=-1)

            p = probs(scaled) + probs(scaled[:, :, ::-1])[:, :, ::-1]
            p = bilinear_resize(p, 32, 64)
            fused = p if fused is None else fused + p
        want = jnp.argmax(fused, axis=-1)
        np.testing.assert_array_equal(np.asarray(pred), np.asarray(want))

    def test_val_step_areas(self):
        cfg, seg, variables = tiny_segmentor()
        step = make_val_step(seg, (16, 32), 19)
        img = RNG.integers(0, 255, size=(2, 32, 64, 3)).astype(np.uint8)
        lbl = np.where(
            RNG.random(size=(2, 32, 64)) < 0.2, 255, RNG.integers(0, 19, size=(2, 32, 64))
        ).astype(np.int32)
        inter, union = step(
            variables["params"], variables["batch_stats"], jnp.asarray(img), jnp.asarray(lbl)
        )
        assert inter.shape == (19,) and union.shape == (19,)
        assert float(jnp.sum(inter)) <= float(np.sum(lbl != 255))


class TestValidatorExport:
    def test_color_masks_written(self, tmp_path):
        cfg = default_config()
        cfg.model.type = "SourceOnlySegmentor"
        cfg.validate.resize_sizes = [[16, 32]]
        cfg.validate.color_mask_dir_path = str(tmp_path / "colors")
        seg = build_segmentor(cfg, dtype=jnp.float32, backbone_layers=TINY)
        v = seg.init_variables(jax.random.PRNGKey(0), (1, 32, 64, 3))
        variables = {"params": v["params"], "batch_stats": v["batch_stats"]}

        def data_iter():
            yield {
                "images": RNG.integers(0, 255, size=(2, 32, 64, 3)).astype(np.uint8),
                "labels": RNG.integers(0, 19, size=(2, 32, 64)).astype(np.uint8),
                "image_paths": ["a.png", "b.png"],
            }

        result = Validator(cfg, seg, variables).run(data_iter())
        assert 0.0 <= result["miou"] <= 1.0
        assert sorted(os.listdir(tmp_path / "colors")) == ["a.png", "b.png"]

    def test_palettes(self):
        img19 = colorize_mask(np.arange(19, dtype=np.uint8).reshape(1, 19), 19)
        img9 = colorize_mask(np.arange(9, dtype=np.uint8).reshape(1, 9), 9)
        assert img19.mode == "P" and img9.mode == "P"

    def test_empty_resize_sizes_falls_back_to_val_size(self):
        """A train-style config (no validate.resize_sizes) evaluates at
        dataset.val.resize_size instead of tracing argmax(None); with
        neither set, the error names the keys."""
        cfg, seg, variables = tiny_segmentor()
        cfg.dataset.val.resize_size = [16, 32]
        validator = Validator(cfg, seg, variables)

        def data_iter():
            yield {
                "images": RNG.integers(0, 255, size=(1, 32, 64, 3)).astype(np.uint8),
                "labels": RNG.integers(0, 19, size=(1, 32, 64)).astype(np.uint8),
                "image_paths": ["a.png"],
            }

        assert 0.0 <= validator.run(data_iter())["miou"] <= 1.0

        cfg2, seg2, variables2 = tiny_segmentor()
        with pytest.raises(ValueError, match="resize_size"):
            Validator(cfg2, seg2, variables2)


class TestRecorder:
    def test_synthia_rescaling_and_best(self):
        from hiast_tpu.utils.recorder import ResultRecorder

        cfg = default_config()
        cfg.dataset.source.type = "SYNTHIA"
        rec = ResultRecorder(cfg, "model")
        iou = np.linspace(0.2, 0.8, 19)
        is_best = rec.record_and_report_metrics(float(np.mean(iou)), iou, 100)
        assert is_best
        assert abs(rec.best_miou - np.mean(iou) * 19 / 16) < 1e-9
        iou13 = iou.copy()
        iou13[3:6] = 0
        assert abs(rec.miou_13_when_16_best - np.mean(iou13) * 19 / 13) < 1e-9

    def test_loss_window(self):
        from hiast_tpu.utils.recorder import ResultRecorder

        cfg = default_config()
        rec = ResultRecorder(cfg, "model")
        rec.record_losses({"a": 1.0, "D_loss": 5.0})
        rec.record_losses({"a": 3.0, "D_loss": 5.0})
        assert rec.losses_recorded["total_loss"] == 4.0  # D_ excluded
        assert rec.losses_recorded["a"] == 4.0


class TestPartialBatches:
    def test_tail_batch_one_compile_and_exact_miou(self, eight_devices):
        """A drop_last=False epoch with a partial tail batch must (a) reuse
        the single compiled program (the tail is padded to the static batch
        shape — a fresh compile costs 30-100 s through slow-compile links),
        (b) produce the exact same IoU as per-sample evaluation (padded
        samples are all-255-label, contributing zero area), and (c) stay on
        the data-sharded path (same padded shape as full batches)."""
        from hiast_tpu.parallel.mesh import make_mesh

        cfg, seg, variables = tiny_segmentor()
        imgs = RNG.integers(0, 255, size=(5, 32, 64, 3)).astype(np.uint8)
        lbls = np.where(
            RNG.random(size=(5, 32, 64)) < 0.2, 255, RNG.integers(0, 19, size=(5, 32, 64))
        ).astype(np.uint8)

        def batches(bs):
            for s in range(0, 5, bs):
                yield {
                    "images": imgs[s : s + bs],
                    "labels": lbls[s : s + bs],
                    "image_paths": [f"{i}.png" for i in range(s, min(s + bs, 5))],
                }

        cfg.runtime.mesh.data = -1
        mesh = make_mesh(cfg, batch_size=2)
        step = make_val_step(seg, (16, 32), 19)
        iou, miou = run_validation(
            step, variables["params"], variables["batch_stats"], batches(2), mesh=mesh
        )
        assert step._cache_size() == 1  # batches 2,2,1 -> ONE compiled shape

        step1 = make_val_step(seg, (16, 32), 19)
        iou1, miou1 = run_validation(
            step1, variables["params"], variables["batch_stats"], batches(1)
        )
        np.testing.assert_allclose(iou, iou1, atol=1e-6)
        assert abs(miou - miou1) < 1e-6

    def test_with_pred_trims_padded_rows(self):
        cfg, seg, variables = tiny_segmentor()
        step = make_ms_flip_step(seg, [(16, 32)], False, 19)

        def batches():
            for n in (2, 1):  # second batch is partial
                yield {
                    "images": RNG.integers(0, 255, size=(n, 32, 64, 3)).astype(np.uint8),
                    "labels": RNG.integers(0, 19, size=(n, 32, 64)).astype(np.uint8),
                    "image_paths": [f"p{n}_{i}.png" for i in range(n)],
                }

        _, _, preds = run_validation(
            step, variables["params"], variables["batch_stats"], batches(),
            with_pred=True,
        )
        # pred rows and paths are both trimmed to the true sample count
        assert [p[0].shape[0] for p in preds] == [2, 1]
        assert [len(p[1]) for p in preds] == [2, 1]


class TestGraftEntry:
    def test_dryrun_multichip(self, eight_devices):
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    def test_entry_traces(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.eval_shape(fn, *args)
        assert out.shape == (1, 512, 1024, 19)
