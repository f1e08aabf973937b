"""Data pipeline tests: remap LUTs, manifest datasets on tiny PNG fixtures,
geometric augs, copy-paste semantics, batching/prefetch."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from hiast_tpu.config import default_config
from hiast_tpu.data import remap
from hiast_tpu.data.augment import FDA, GeometricAug, Resize, split_aug_types
from hiast_tpu.data.copy_paste import CopyPaste
from hiast_tpu.data.datasets import build_dataset, get_path_list
from hiast_tpu.data.pipeline import BatchIterator, infinite_batches, prefetched
from hiast_tpu.data.synthetic import SyntheticSegDataset
from hiast_tpu.registry import populate

populate()
RNG = np.random.default_rng(11)


class TestRemap:
    @pytest.mark.parametrize("name,id_map", [
        ("GTAV", remap.GTAV_ID_MAP),
        ("SYNTHIA", remap.SYNTHIA_ID_MAP),
        ("Cityscapes9", remap.CITYSCAPES_TO_9_ID_MAP),
        ("Oxford", remap.OXFORD_ID_MAP),
    ])
    def test_lut_matches_perkey_loop(self, name, id_map):
        lbl = RNG.integers(0, 40, size=(16, 16)).astype(np.uint8)
        got = remap.remap_label(lbl, name)
        want = np.full(lbl.shape, 255, np.uint8)  # reference preprocess_label
        for k, v in id_map.items():
            want[lbl == k] = v
        np.testing.assert_array_equal(got, want)


def make_gtav_fixture(root, n=4, h=64, w=96):
    os.makedirs(root / "images", exist_ok=True)
    manifest = []
    for i in range(n):
        img = RNG.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        raw = RNG.choice(list(remap.GTAV_ID_MAP.keys()) + [0], size=(h, w)).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"img_{i}.png")
        Image.fromarray(raw).save(root / "images" / f"lbl_{i}.png")
        manifest.append({"image_name": f"images/img_{i}.png", "mask_name": f"images/lbl_{i}.png"})
    mpath = root / "gtav_train.json"
    mpath.write_text(json.dumps(manifest))
    return str(mpath), str(root)


class TestDatasets:
    def test_gtav_load_and_aug(self, tmp_path):
        mpath, root = make_gtav_fixture(tmp_path)
        cfg = default_config()
        cfg.dataset.source.type = "GTAV"
        cfg.dataset.source.json_path = mpath
        cfg.dataset.source.image_dir = root
        cfg.dataset.source.aug_type = ["MS"]
        cfg.dataset.crop_size = [32, 64]
        ds = build_dataset(cfg, "source")
        assert len(ds) == 4
        item = ds.get_item(0, np.random.default_rng(0))
        assert item["images"].shape == (32, 64, 3)
        assert item["labels"].shape == (32, 64)
        valid = item["labels"][item["labels"] != 255]
        assert valid.size == 0 or valid.max() < 19

    def test_pseudo_dir_swaps_labels(self, tmp_path):
        mpath, root = make_gtav_fixture(tmp_path)
        pseudo_dir = tmp_path / "work" / "gray_label"
        os.makedirs(pseudo_dir)
        # fabricate pseudo labels + the samples_with_class contract
        swc = {c: [] for c in range(19)}
        for i in range(4):
            plbl = RNG.integers(0, 19, size=(64, 96)).astype(np.uint8)
            Image.fromarray(plbl, mode="L").save(pseudo_dir / f"img_{i}_pseudo_label.png")
            for c in range(19):
                n = int((plbl == c).sum())
                if n:
                    swc[c].append([f"img_{i}.png", n])
        (tmp_path / "work" / "samples_with_class.json").write_text(json.dumps(swc))

        cfg = default_config()
        cfg.dataset.target.type = "Cityscapes"
        cfg.dataset.target.json_path = mpath
        cfg.dataset.target.image_dir = root
        ds = build_dataset(cfg, "target", pseudo_dir=str(pseudo_dir), aug_type=[])
        img, lbl, _ = ds.load_data(0)
        want = np.array(Image.open(pseudo_dir / "img_0_pseudo_label.png"))
        np.testing.assert_array_equal(lbl, want)
        assert ds.get_samples_with_class() is not None

    def test_device_color_aug_split(self):
        host, device = split_aug_types(["MS", "CCA"])
        assert host == ["MS"] and device == "CCA"


class TestGeometricAug:
    def test_fixed_output_shape(self):
        aug = GeometricAug(128, 256, (60, 120), w2h_ratio=2)
        img = RNG.integers(0, 255, size=(160, 320, 3)).astype(np.uint8)
        lbl = RNG.integers(0, 19, size=(160, 320)).astype(np.uint8)
        for s in range(5):
            oi, ol = aug(img, lbl, np.random.default_rng(s))
            assert oi.shape == (128, 256, 3) and ol.shape == (128, 256)
            assert set(np.unique(ol)) <= set(np.unique(lbl))

    def test_fda_preserves_shape_and_label(self, tmp_path):
        mpath, root = make_gtav_fixture(tmp_path, n=2)
        fda = FDA(mpath, root, beta_limit=0.01)
        img = RNG.integers(0, 255, size=(64, 96, 3)).astype(np.uint8)
        lbl = RNG.integers(0, 19, size=(64, 96)).astype(np.uint8)
        oi, ol = fda(img, lbl, np.random.default_rng(0))
        assert oi.shape == img.shape and oi.dtype == np.uint8
        np.testing.assert_array_equal(ol, lbl)
        assert np.abs(oi.astype(int) - img.astype(int)).max() > 0  # style changed


class TestCopyPaste:
    def _cfg(self):
        cfg = default_config()
        cfg.preprocessor.type = "CopyPaste"
        cfg.preprocessor.copy_paste.selected_num_classes = 5
        return cfg

    def test_paste_moves_hard_class_pixels(self):
        cfg = self._cfg()
        ds = SyntheticSegDataset(n=8, h=64, w=96, seed=1)
        class_value = np.linspace(0.5, 0.99, 19)
        cp = CopyPaste(cfg, ds, class_value)
        # hard classes = 5 lowest mean-prob classes
        np.testing.assert_array_equal(np.sort(cp.hard_classes), np.arange(5))
        img, lbl, _ = ds.load_data(0)
        out_img, out_lbl, cp_mask = cp.run(img, lbl, np.random.default_rng(0))
        pasted = cp_mask != 255
        assert pasted.any()
        assert set(np.unique(cp_mask[pasted])) <= set(cp.hard_classes.tolist())
        np.testing.assert_array_equal(out_lbl[pasted], cp_mask[pasted])
        # un-pasted pixels untouched
        np.testing.assert_array_equal(out_img[~pasted], img[~pasted])

    def test_cp_mask_stays_aligned_through_geometric_augs(self, tmp_path):
        """With dcst enabled, copy_paste_mask is replayed through the SAME
        crops/flips as the labels: on the augmented grid, every pasted pixel
        still carries exactly the pasted label."""
        mpath, root = make_gtav_fixture(tmp_path)
        pseudo_dir = tmp_path / "work" / "gray_label"
        os.makedirs(pseudo_dir)
        swc = {c: [] for c in range(19)}
        for i in range(4):
            plbl = RNG.integers(0, 19, size=(64, 96)).astype(np.uint8)
            Image.fromarray(plbl, mode="L").save(pseudo_dir / f"img_{i}_pseudo_label.png")
            for c in range(19):
                n = int((plbl == c).sum())
                if n:
                    swc[c].append([f"img_{i}.png", n])
        (tmp_path / "work" / "samples_with_class.json").write_text(json.dumps(swc))

        cfg = self._cfg()
        cfg.cst_training.dcst_loss.weight = 0.5
        cfg.dataset.target.type = "Cityscapes"
        cfg.dataset.target.json_path = mpath
        cfg.dataset.target.image_dir = root
        cfg.dataset.crop_size = [32, 64]
        ds = build_dataset(cfg, "target", pseudo_dir=str(pseudo_dir), aug_type=["MS"])
        ds.set_preprocessor(CopyPaste(cfg, ds, np.linspace(0.5, 0.99, 19)))

        found_pasted = False
        for idx in range(4):
            item = ds.get_item(idx, np.random.default_rng(idx))
            cp = item["copy_paste_mask"]
            assert cp.shape == item["labels"].shape == (32, 64)
            pasted = cp != 255
            if pasted.any():
                found_pasted = True
                np.testing.assert_array_equal(item["labels"][pasted], cp[pasted])
        assert found_pasted

    def test_synthia_masks_absent_classes(self):
        cfg = self._cfg()
        cfg.dataset.source.type = "SYNTHIA"
        ds = SyntheticSegDataset(n=4, h=32, w=32)
        cp = CopyPaste(cfg, ds, np.full(19, 0.5))
        assert not ({9, 14, 16} & set(cp.hard_classes.tolist()))


class TestPipeline:
    def test_batch_iterator_shapes(self):
        ds = SyntheticSegDataset(n=10, h=32, w=48)
        it = BatchIterator(ds, batch_size=4, shuffle=True, seed=0)
        batches = list(it)
        assert len(batches) == 2  # drop_last
        assert batches[0]["images"].shape == (4, 32, 48, 3)
        assert batches[0]["labels"].shape == (4, 32, 48)
        assert len(batches[0]["image_paths"]) == 4

    def test_infinite_batches_reshuffles(self):
        ds = SyntheticSegDataset(n=4, h=8, w=8)
        stream = infinite_batches(ds, batch_size=2, seed=0, prefetch=1)
        paths = [tuple(next(stream)["image_paths"]) for _ in range(4)]
        assert len(set(paths)) >= 2  # epochs are reshuffled

    def test_prefetch_propagates_errors(self):
        def bad():
            yield 1
            raise ValueError("boom")

        it = prefetched(bad(), depth=1)
        assert next(it) == 1
        with pytest.raises(ValueError):
            next(it)


class TestSynthiaLabels:
    def test_16bit_label_read_via_cv2_fallback(self, tmp_path):
        import cv2
        from hiast_tpu.config import default_config
        from hiast_tpu.data.datasets import SYNTHIADataset

        # SYNTHIA-style 16-bit RGB PNG, class id in (RGB) channel 0
        lbl16 = np.zeros((16, 24, 3), np.uint16)
        ids = RNG.choice(list(remap.SYNTHIA_ID_MAP.keys()), size=(16, 24))
        lbl16[..., 0] = ids
        # cv2 writes BGR, so put the class id in BGR channel 2
        bgr = lbl16[..., ::-1].copy()
        img = RNG.integers(0, 255, size=(16, 24, 3)).astype(np.uint8)
        os.makedirs(tmp_path / "RGB"); os.makedirs(tmp_path / "GT")
        cv2.imwrite(str(tmp_path / "GT" / "l.png"), bgr)
        Image.fromarray(img).save(tmp_path / "RGB" / "i.png")
        (tmp_path / "m.json").write_text(
            json.dumps([{"image_name": "RGB/i.png", "mask_name": "GT/l.png"}])
        )
        cfg = default_config()
        ds = SYNTHIADataset(cfg, str(tmp_path / "m.json"), str(tmp_path), aug_type=[])
        _, lbl, _ = ds.load_data(0)
        want = remap.remap_label(ids.astype(np.uint8), "SYNTHIA")
        np.testing.assert_array_equal(lbl, want)

    def test_imageio_latch_probes_backend_not_registration(
        self, tmp_path, monkeypatch
    ):
        """When imread fails, the latch decision comes from an actual backend
        probe — registration alone can't distinguish 'PNG-FI registered but
        FreeImage binary missing' (raises on EVERY file; must latch off) from
        a single bad file (must NOT latch).  One probe, then cv2 fallback."""
        import cv2
        import imageio.v2 as iio
        from hiast_tpu.config import default_config
        from hiast_tpu.data import datasets as D

        lbl16 = np.zeros((8, 12, 3), np.uint16)
        ids = RNG.choice(list(remap.SYNTHIA_ID_MAP.keys()), size=(8, 12))
        lbl16[..., 0] = ids
        os.makedirs(tmp_path / "RGB"); os.makedirs(tmp_path / "GT")
        cv2.imwrite(str(tmp_path / "GT" / "l.png"), lbl16[..., ::-1].copy())
        Image.fromarray(np.zeros((8, 12, 3), np.uint8)).save(tmp_path / "RGB" / "i.png")
        (tmp_path / "m.json").write_text(
            json.dumps([{"image_name": "RGB/i.png", "mask_name": "GT/l.png"}])
        )

        monkeypatch.setattr(D.native_ops, "decode_png_file", lambda p: None)

        def boom(*a, **k):
            raise RuntimeError("FreeImage backend unavailable")

        monkeypatch.setattr(iio, "imread", boom)
        probes = []
        monkeypatch.setattr(D, "_probe_png_fi", lambda: (probes.append(1), False)[1])
        monkeypatch.setattr(D.SYNTHIADataset, "_imageio_plugin_ok", None)

        cfg = default_config()
        ds = D.SYNTHIADataset(cfg, str(tmp_path / "m.json"), str(tmp_path), aug_type=[])
        want = remap.remap_label(ids.astype(np.uint8), "SYNTHIA")
        for _ in range(3):  # every read still succeeds via cv2
            _, lbl, _ = ds.load_data(0)
            np.testing.assert_array_equal(lbl, want)
        assert probes == [1], "backend probed exactly once, then latched"
        assert D.SYNTHIADataset._imageio_plugin_ok is False


class TestClassMixCutMix:
    def test_classmix_pastes_half_the_classes(self):
        from hiast_tpu.data.copy_paste import ClassMix
        from hiast_tpu.config import default_config

        ds = SyntheticSegDataset(n=4, h=32, w=48, seed=3)
        cm = ClassMix(default_config(), ds)
        img, lbl, _ = ds.load_data(0)
        oi, ol, mask = cm.run(img, lbl, np.random.default_rng(0))
        pasted = mask != 255
        assert pasted.any()
        np.testing.assert_array_equal(ol[pasted], mask[pasted])
        np.testing.assert_array_equal(oi[~pasted], img[~pasted])

    def test_cutmix_pastes_one_rectangle(self):
        from hiast_tpu.data.copy_paste import CutMix
        from hiast_tpu.config import default_config

        ds = SyntheticSegDataset(n=4, h=32, w=48, seed=3)
        cm = CutMix(default_config(), ds)
        img, lbl, _ = ds.load_data(0)
        oi, ol, mask = cm.run(img, lbl, np.random.default_rng(1))
        pasted = mask != 255
        assert pasted.any()
        # rectangle: pasted rows/cols are contiguous
        rows = np.where(pasted.any(axis=1))[0]
        cols = np.where(pasted.any(axis=0))[0]
        assert (np.diff(rows) == 1).all() and (np.diff(cols) == 1).all()


class TestDeviceFDA:
    def test_matches_host_fda(self, tmp_path):
        """Device FDA == the host numpy FDA on the same (src, tgt) pair."""
        import jax.numpy as jnp
        from hiast_tpu.ops.fda import fda_device

        src = RNG.integers(0, 255, size=(32, 48, 3)).astype(np.uint8)
        tgt = RNG.integers(0, 255, size=(32, 48, 3)).astype(np.uint8)
        got = np.asarray(fda_device(jnp.asarray(src[None]), jnp.asarray(tgt[None]), beta=0.05))[0]

        # host reference computation (mirrors data/augment.py:FDA.__call__)
        b = max(int(np.floor(min(32, 48) * 0.05)), 1)
        want = np.empty((32, 48, 3), np.float32)
        for ch in range(3):
            fs = np.fft.fft2(src[..., ch].astype(np.float32))
            ft = np.fft.fft2(tgt[..., ch].astype(np.float32))
            amp_s = np.fft.fftshift(np.abs(fs))
            amp_t = np.fft.fftshift(np.abs(ft))
            cy, cx = 16, 24
            amp_s[cy - b : cy + b, cx - b : cx + b] = amp_t[cy - b : cy + b, cx - b : cx + b]
            amp_s = np.fft.ifftshift(amp_s)
            want[..., ch] = np.real(np.fft.ifft2(amp_s * np.exp(1j * np.angle(fs))))
        want = np.clip(want, 0, 255)
        np.testing.assert_allclose(got, want, atol=0.1)
