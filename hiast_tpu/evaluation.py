"""Evaluation: multi-scale / flip logit fusion + streaming IoU, on device.

Re-designs the reference eval paths (reference: code/workflows/validator.py:
34-115, code/workflows/trainer/base_trainer.py:160-186) as jit'd programs:
resize (align-corners matmuls) -> forward -> softmax [-> flipped forward] ->
resize back -> fuse -> argmax -> per-class intersection/union, all fused per
batch; the host only accumulates two [C] vectors.
"""
from __future__ import annotations

import os
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from hiast_tpu.ops.metrics import intersection_and_union, iou_from_areas, synthia_mious
from hiast_tpu.ops.resize import bilinear_resize
from hiast_tpu.selftrain.steps import normalize_image

# Class palettes for colorized prediction export (reference validator.py:57-70)
PALETTE_19 = [
    128, 64, 128, 244, 35, 232, 70, 70, 70, 102, 102, 156, 190, 153, 153,
    153, 153, 153, 250, 170, 30, 220, 220, 0, 107, 142, 35, 152, 251, 152,
    70, 130, 180, 220, 20, 60, 255, 0, 0, 0, 0, 142, 0, 0, 70, 0, 60, 100,
    0, 80, 100, 0, 0, 230, 119, 11, 32,
]
PALETTE_9 = [
    70, 130, 180, 220, 20, 60, 119, 11, 32, 0, 0, 142, 220, 220, 0,
    250, 170, 30, 70, 70, 70, 244, 35, 232, 128, 64, 128,
]


def colorize_mask(mask: np.ndarray, num_classes: int):
    from PIL import Image

    palette = {19: PALETTE_19, 9: PALETTE_9}[num_classes]
    img = Image.fromarray(mask.astype(np.uint8)).convert("P")
    img.putpalette(palette)
    return img


def make_val_step(segmentor, resize_size, num_classes: int):
    """Training-loop validation step: single-scale logits -> (inter, union).

    Matches base_trainer.get_validate_result: resize input to
    ``resize_size``, forward, resize logits back to label size, argmax.
    """
    rh, rw = resize_size

    @jax.jit
    def step(params, batch_stats, img_uint8, lbl):
        img = normalize_image(img_uint8)
        img = bilinear_resize(img, rh, rw)
        out = segmentor.module.apply(
            {"params": params, "batch_stats": batch_stats},
            img.astype(segmentor.dtype), train=False,
        )
        logits = bilinear_resize(
            out["logits"].astype(jnp.float32), lbl.shape[1], lbl.shape[2]
        )
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return intersection_and_union(pred, lbl, num_classes)

    return step


def make_ms_flip_step(segmentor, resize_sizes, is_flip: bool, num_classes: int):
    """Standalone validator step: multi-scale + flip softmax fusion."""
    if not resize_sizes:
        raise ValueError(
            "make_ms_flip_step needs at least one eval size; set "
            "validate.resize_sizes (multi-scale) or dataset.val.resize_size"
        )

    @jax.jit
    def step(params, batch_stats, img_uint8, lbl):
        img = normalize_image(img_uint8)
        h, w = img.shape[1], img.shape[2]
        variables = {"params": params, "batch_stats": batch_stats}

        def forward_probs(x):
            out = segmentor.module.apply(variables, x.astype(segmentor.dtype), train=False)
            logits = bilinear_resize(out["logits"].astype(jnp.float32), x.shape[1], x.shape[2])
            return jax.nn.softmax(logits, axis=-1)

        fused = None
        for rh, rw in resize_sizes:
            assert rh <= rw, "resize_size must be [height, width] with h <= w"
            scaled = bilinear_resize(img, rh, rw)
            probs = forward_probs(scaled)
            if is_flip:
                flipped = forward_probs(scaled[:, :, ::-1])
                probs = probs + flipped[:, :, ::-1]
            probs = bilinear_resize(probs, h, w)
            fused = probs if fused is None else fused + probs

        pred = jnp.argmax(fused, axis=-1).astype(jnp.int32)
        inter, union = intersection_and_union(pred, lbl, num_classes)
        return pred, inter, union

    return step


def run_validation(
    step_fn, params, batch_stats, data_iter: Iterable, with_pred=False, mesh=None
):
    """Accumulate (iou, miou) over a batch iterator.

    With a ``mesh``, batches are sharded over the data axis (XLA reduces the
    IoU areas across chips — the TPU version of the reference's
    dist.all_reduce validation, base_trainer.py:180-181); a ``space`` mesh
    axis > 1 additionally shards image rows (multi-scale eval beyond one
    chip's HBM).

    Partial tail batches (drop_last=False epochs) are PADDED to the first
    batch's shape with all-255 labels — padded samples contribute zero
    intersection/union by the ignore-index construction, every batch hits
    the single compiled program, and the tail stays dp-sharded.
    """
    from hiast_tpu.data.pipeline import pad_batch
    from hiast_tpu.parallel.mesh import spatial_sharding

    inter_sum = None
    union_sum = None
    preds = []
    target = None
    sharding = spatial_sharding(mesh) if mesh is not None else None
    for batch in data_iter:
        if target is None:
            target = batch["images"].shape[0]
        batch = pad_batch(batch, target)
        img = jnp.asarray(batch["images"])
        lbl = jnp.asarray(batch["labels"].astype(np.int32))
        if sharding is not None and img.shape[0] % mesh.shape["data"] == 0:
            img = jax.device_put(img, sharding)
            lbl = jax.device_put(lbl, sharding)
        out = step_fn(params, batch_stats, img, lbl)
        if with_pred:
            pred, inter, union = out
            n = batch["n_valid"]
            preds.append((np.asarray(pred)[:n], batch["image_paths"][:n]))
        else:
            inter, union = out
        inter_sum = inter if inter_sum is None else inter_sum + inter
        union_sum = union if union_sum is None else union_sum + union
    iou = iou_from_areas(np.asarray(inter_sum), np.asarray(union_sum))
    miou = float(np.mean(iou))
    return (iou, miou, preds) if with_pred else (iou, miou)


class Validator:
    """Standalone multi-scale evaluator (reference code/workflows/validator.py)."""

    def __init__(self, cfg, segmentor, variables):
        from hiast_tpu.parallel.mesh import make_mesh, shard_state

        self.cfg = cfg
        self.segmentor = segmentor
        # place weights on the (data, space, model) mesh: batches shard over
        # 'data' (+ image rows over 'space'), params channel-shard over
        # 'model' when tensor parallelism is configured — the standalone
        # evaluator accepts the same mesh configs as training
        self.mesh = make_mesh(cfg, batch_size=cfg.validate.batch_size)
        self.variables = shard_state(self.mesh, variables)
        # validate.resize_sizes is the multi-scale protocol (reference
        # validate.yaml always sets it); an empty list falls back to the
        # single dataset.val.resize_size so a train-style config evaluates
        # instead of tracing argmax(None)
        sizes = [tuple(s) for s in cfg.validate.resize_sizes]
        if not sizes and cfg.dataset.val.resize_size:
            sizes = [tuple(cfg.dataset.val.resize_size)]
        self.step = make_ms_flip_step(
            segmentor,
            sizes,
            cfg.validate.is_flip,
            cfg.dataset.num_classes,
        )
        self.color_dir = cfg.validate.color_mask_dir_path
        if self.color_dir:
            os.makedirs(self.color_dir, exist_ok=True)
            assert len(os.listdir(self.color_dir)) == 0

    def run(self, data_iter: Iterable):
        iou, miou, preds = run_validation(
            self.step,
            self.variables["params"],
            self.variables["batch_stats"],
            data_iter,
            with_pred=True,
            mesh=self.mesh,
        )
        if self.color_dir:
            for batch_preds, paths in preds:
                for pred, path in zip(batch_preds, paths):
                    colorize_mask(pred, self.cfg.dataset.num_classes).save(
                        os.path.join(self.color_dir, os.path.basename(path))
                    )
        result = {"iou": iou, "miou": miou}
        if self.cfg.dataset.source.type and "SYNTHIA" in self.cfg.dataset.source.type:
            miou_16, miou_13 = synthia_mious(iou)
            result.update({"miou_16": miou_16, "miou_13": miou_13})
        return result
