"""Streaming segmentation metrics on device.

Replaces the reference's ``torch.histc`` intersection/union accumulation
(reference: code/utils/metrics.py:6-19) with vectorized per-class boolean
reductions that XLA fuses into one pass; the cross-device reduction that the
reference does with ``dist.all_reduce`` (base_trainer.py:180-181) becomes a
``jax.lax.psum`` over the data mesh axis (or is implicit when the sharded
arrays are summed under jit).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

IGNORE_INDEX = 255


def intersection_and_union(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    num_classes: int,
    ignore_index: int = IGNORE_INDEX,
):
    """Per-class (intersection, union) pixel areas.

    ``pred`` / ``target`` are integer maps of identical shape; pixels where
    ``target == ignore_index`` are excluded (the reference writes the ignore
    value into the prediction before binning — same effect).
    """
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    valid = target != ignore_index
    classes = jnp.arange(num_classes, dtype=pred.dtype)[None, :]
    pred_onehot = (pred[:, None] == classes) & valid[:, None]
    target_onehot = target[:, None] == classes  # ignore never equals a class id
    inter = jnp.sum(pred_onehot & target_onehot, axis=0)
    area_pred = jnp.sum(pred_onehot, axis=0)
    area_target = jnp.sum(target_onehot, axis=0)
    union = area_pred + area_target - inter
    return inter.astype(jnp.float32), union.astype(jnp.float32)


def iou_from_areas(intersection: np.ndarray, union: np.ndarray) -> np.ndarray:
    return np.asarray(intersection) / (np.asarray(union) + 1e-10)


def synthia_mious(iou: np.ndarray):
    """SYNTHIA protocol: 19-slot IoU rescaled to 16- and 13-class mIoU.

    Reference: code/workflows/validator.py:108-113 — mIoU-16 multiplies the
    19-slot mean by 19/16; mIoU-13 additionally zeroes classes 3..5
    (wall/fence/pole) and multiplies by 19/13.
    """
    iou = np.asarray(iou)
    miou_16 = float(np.mean(iou) * 19 / 16)
    iou_13 = iou.copy()
    iou_13[3:6] = 0
    miou_13 = float(np.mean(iou_13) * 19 / 13)
    return miou_16, miou_13
