"""Pseudo-label generation drivers (the round-contract artifact writers).

Orchestrates the on-device policy math (pseudo/policies.py) over the target
dataset and writes the cross-round artifact set the training side consumes
(reference: code/workflows/pseudo_label_generator.py:48-62):

    <save_dir>/<image>_pseudo_label.png      gray uint8 label maps
    <save_dir>/../class_threshold.npy        final per-class thresholds
    <save_dir>/../statics_class.npy          total selected pixels per class
    <save_dir>/../class_mean_probabilities.npy  EMA of selected-pixel confidence
    <save_dir>/../sample_class_stats.json    per-image per-class pixel counts
    <save_dir>/../samples_with_class.json    {class: [[image, pixels], ...]}

The hot path — forward, softmax-max, histogram, threshold update, selection,
per-class stats — is ONE jit'd program per batch; the host only writes PNGs.
Unlike the reference (single-GPU only, pseudo_label_generator.py:36), the
batch may be sharded over the data mesh axis: the per-class histogram is a
global reduction under jit, so the carried IAS state stays replicated.
"""
from __future__ import annotations

import json
import os
from functools import partial
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from hiast_tpu.pseudo import policies as P
from hiast_tpu.registry import PSEUDO_POLICY


def _write_gray_png(path: str, arr: np.ndarray) -> None:
    """C++ encoder (Up filter + zlib level 1 — ~4x faster than PIL on label
    maps, see tests/test_native_ops.py), PIL fallback."""
    from hiast_tpu.data.native_ops import encode_gray_png

    blob = encode_gray_png(arr)
    if blob is not None:
        with open(path, "wb") as f:
            f.write(blob)
        return
    from PIL import Image

    Image.fromarray(arr.astype(np.uint8), mode="L").save(path)


class BasePseudoGenerator:
    """Drives batches through a jit'd selection step and writes artifacts.

    ``forward_fn(images_uint8)`` encapsulates the model (already closed over
    params/batch_stats, jit-ready) and returns either full-res logits
    [B, H, W, C] fp32 or a dict {'full': ..., 'low': ...} where 'low' is the
    pre-upsample OS8 logits grid.  Threshold statistics run on 'low' when
    available and ``pseudo_policy.stats_source == 'low'`` (64x fewer pixels;
    the full-res probabilities are bilinear interpolations of these, so the
    per-class quantiles are statistically equivalent) — the TPU redesign of
    the reference's full-res host-side histogramming.
    ``data_iter`` yields {'images': uint8 [B,H,W,3], 'image_paths': [str]}.
    """

    def __init__(
        self,
        cfg,
        forward_fn: Callable,
        data_iter_factory: Callable[[], Iterable],
        expected_count: int | None = None,
    ):
        self.cfg = cfg
        self.forward_fn = forward_fn
        self.data_iter_factory = data_iter_factory
        self.expected_count = expected_count
        self.num_classes = cfg.dataset.num_classes
        self.num_bins = cfg.pseudo_policy.num_hist_bins
        self.save_dir = cfg.pseudo_policy.save_dir
        assert self.save_dir, "pseudo_policy.save_dir must be set"
        self.stats_dir = os.path.dirname(os.path.normpath(self.save_dir))

        self.statics_class = np.zeros(self.num_classes, np.int64)
        self.sample_stats: list[dict] = []
        self.samples_class: dict[int, list] = {c: [] for c in range(self.num_classes)}
        self.class_mean_probs = np.zeros(self.num_classes, np.float32)
        self.class_threshold: np.ndarray | None = None

    def _pad(self, batch):
        """Pad a partial tail batch to ``pseudo_policy.batch_size`` so every
        batch hits ONE compiled program (and stays dp-sharded).  Returns
        (images, valid [B] float, image_paths) — ``image_paths`` keeps its
        true length, so ``_record_batch``'s zip trims the pad rows out of
        every written artifact; ``valid`` masks them out of the on-device
        statistics (histograms, class-mean-prob EMA).  Delegates the actual
        padding to pipeline.pad_batch (the single padding implementation)."""
        from hiast_tpu.data.pipeline import pad_batch

        target = self.cfg.pseudo_policy.batch_size or batch["images"].shape[0]
        padded = pad_batch(batch, target)
        images = padded["images"]
        valid = (np.arange(images.shape[0]) < padded["n_valid"]).astype(np.float32)
        return images, jnp.asarray(valid), batch["image_paths"]

    def _forward(self, images):
        """Normalize forward_fn output to (logits_full, logits_stats)."""
        out = self.forward_fn(images)
        if isinstance(out, dict):
            full = out["full"]
            low = out.get("low", full)
        else:
            full = low = out
        use_low = self.cfg.pseudo_policy.stats_source == "low"
        return full, (low if use_low else full)

    # -- jit'd batch programs ----------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def _select_step(self, logits, thresholds, cmp, valid):
        """(logits, thr, cmp, valid[B]) -> (plbl, counts[B,C], new_cmp)."""
        maxprob, pred = P.confidences(logits)
        plbl = P.select_pseudo_labels(maxprob, pred, thresholds)
        plbl = jnp.where(valid[:, None, None] > 0, plbl, P.IGNORE)
        counts = P.per_sample_class_counts(plbl, self.num_classes)
        sums, totals = P.class_prob_sums(plbl, maxprob, self.num_classes)
        new_cmp = P.update_class_mean_probs(
            cmp, sums, totals, self.cfg.preprocessor.copy_paste.gamma
        )
        return plbl.astype(jnp.uint8), counts, new_cmp

    @partial(jax.jit, static_argnums=0)
    def _hist_step(self, logits, valid):
        maxprob, pred = P.confidences(logits)
        w = jnp.broadcast_to(valid[:, None, None], pred.shape)
        return P.class_prob_histogram(maxprob, pred, self.num_classes, self.num_bins, w)

    # -- host-side bookkeeping ---------------------------------------------
    def _writer_pool(self):
        if not hasattr(self, "_png_pool"):
            from concurrent.futures import ThreadPoolExecutor

            self._png_pool = ThreadPoolExecutor(max_workers=2)
            self._png_futures = []
        return self._png_pool

    def _record_batch(self, plbl_np, counts_np, image_paths):
        pool = self._writer_pool()
        for img_path, counts, plbl in zip(image_paths, counts_np, plbl_np):
            current = {}
            for c in np.nonzero(counts)[0]:
                n = int(counts[c])
                current[int(c)] = n
                self.samples_class[int(c)].append([img_path, n])
                self.statics_class[c] += n
            current["file"] = img_path
            self.sample_stats.append(current)
            name = os.path.splitext(os.path.basename(img_path))[0]
            # PNG encoding overlaps the next device batch (PIL releases the GIL)
            self._png_futures.append(
                pool.submit(
                    _write_gray_png,
                    os.path.join(self.save_dir, f"{name}_pseudo_label.png"),
                    plbl,
                )
            )

    def _drain_writers(self):
        for f in getattr(self, "_png_futures", []):
            f.result()
        self._png_futures = []

    def save_data(self):
        self._drain_writers()
        if self.class_threshold is not None:
            np.save(os.path.join(self.stats_dir, "class_threshold.npy"), self.class_threshold)
        np.save(os.path.join(self.stats_dir, "statics_class.npy"), self.statics_class)
        np.save(
            os.path.join(self.stats_dir, "class_mean_probabilities.npy"),
            self.class_mean_probs,
        )
        with open(os.path.join(self.stats_dir, "sample_class_stats.json"), "w") as f:
            json.dump(self.sample_stats, f)
        with open(os.path.join(self.stats_dir, "samples_with_class.json"), "w") as f:
            json.dump(self.samples_class, f)

    def already_done(self, n_expected: int | None = None) -> bool:
        """Idempotency: skip regeneration when the output dir is fully
        populated (reference pseudo_label_generator.py:116-117,182-183)."""
        if not os.path.isdir(self.save_dir):
            return False
        n = len(os.listdir(self.save_dir))
        if n_expected is None:
            n_expected = self.expected_count
        return n_expected is not None and n >= n_expected

    def prepare_dirs(self):
        """Create (or RECOVER) the output dir.  Reached only when
        ``already_done()`` said incomplete: a non-empty dir here is an
        interrupted previous generation.  The IAS threshold/EMA state is
        sequential over the dataset, so resuming from the written PNGs would
        regenerate DIFFERENT statistics than one clean pass — instead the
        partial output is cleared and generation restarts from scratch.
        Only files this generator writes (``*_pseudo_label.png``) are ever
        deleted; anything else in the dir still fails loudly."""
        os.makedirs(self.save_dir, exist_ok=True)
        entries = os.listdir(self.save_dir)
        if not entries:
            return
        foreign = [e for e in entries if not e.endswith("_pseudo_label.png")]
        assert not foreign, (
            f"pseudo-label dir {self.save_dir} contains files this generator "
            f"did not write (e.g. {foreign[:3]}); refusing to clear it"
        )
        print(
            f"%% pseudo-label dir {self.save_dir} is partially populated "
            f"({len(entries)} files) — clearing and regenerating from scratch"
        )
        for e in entries:
            os.unlink(os.path.join(self.save_dir, e))

    def _run_select_loop(self, step: Callable):
        """Drive ``step(batch) -> (plbl_dev, counts_dev, paths)`` over the
        dataset, software-pipelined one batch deep: batch k+1's device
        program is dispatched (async) BEFORE batch k's outputs are fetched,
        so the device->host transfer of the label maps — the measured
        bottleneck on slow-transfer links — overlaps the next batch's
        compute.  The maps are additionally 5-bit PACKED on device before
        the fetch (1.6x smaller transfer, exact round-trip — see
        pseudo/packing.py) whenever the label space fits.  Carried state
        (IAS thresholds) is a device-side dependency the XLA queue orders
        correctly.  ``paths`` may be shorter than the (padded) device batch;
        ``_record_batch`` zips, trimming pad rows."""
        from hiast_tpu.pseudo.packing import can_pack, pack_labels, unpack_labels

        pack = None  # decided from the first batch's label-map width
        pack_fn = jax.jit(pack_labels)  # ONE jit wrapper: no per-batch retrace

        def fetch_plbl(plbl_dev, width):
            arr = np.asarray(plbl_dev)
            return unpack_labels(arr, width) if pack else arr

        prev = None
        for batch in self.data_iter_factory():
            plbl, counts, paths = step(batch)
            width = plbl.shape[-1]
            if pack is None:
                pack = bool(self.cfg.pseudo_policy.pack_d2h) and can_pack(
                    self.num_classes, width
                )
            if pack:
                plbl = pack_fn(plbl)
            if prev is not None:
                self._record_batch(fetch_plbl(prev[0], prev[3]), np.asarray(prev[1]), prev[2])
            prev = (plbl, counts, paths, width)
        if prev is not None:
            self._record_batch(fetch_plbl(prev[0], prev[3]), np.asarray(prev[1]), prev[2])

    def run(self):
        raise NotImplementedError


@PSEUDO_POLICY.register("CT")
class ConstantThresholdGenerator(BasePseudoGenerator):
    def initial_thresholds(self):
        return jnp.full((self.num_classes,), self.cfg.pseudo_policy.ct.threshold, jnp.float32)

    def run(self):
        if self.already_done():
            print(f"%% pseudo labels already exist in {self.save_dir}; skipping")
            return
        self.prepare_dirs()
        thresholds = self.initial_thresholds()
        cmp = jnp.asarray(self.class_mean_probs)

        def step(batch):
            nonlocal cmp
            images, valid, paths = self._pad(batch)
            logits, _ = self._forward(images)
            plbl, counts, cmp = self._select_step(logits, thresholds, cmp, valid)
            return plbl, counts, paths

        self._run_select_loop(step)
        self.class_mean_probs = np.asarray(cmp)
        if thresholds is not None:
            self.class_threshold = np.asarray(thresholds)
        self.save_data()


@PSEUDO_POLICY.register("NT")
class NoThresholdGenerator(ConstantThresholdGenerator):
    def initial_thresholds(self):
        return None


@PSEUDO_POLICY.register("CBST")
class CBSTGenerator(ConstantThresholdGenerator):
    """Two passes: dataset-wide per-class histogram, then selection."""

    def initial_thresholds(self):
        hist = jnp.zeros((self.num_classes, self.num_bins), jnp.float32)
        for batch in self.data_iter_factory():
            images, valid, _ = self._pad(batch)
            _, stats_logits = self._forward(images)
            hist = hist + self._hist_step(stats_logits, valid)
        return P.cbst_thresholds(hist, self.cfg.pseudo_policy.cbst.p)


@PSEUDO_POLICY.register("IAS")
class IASGenerator(BasePseudoGenerator):
    """Instance-adaptive selector: thresholds are carried state, updated
    per batch BEFORE selection (reference pseudo_label_generator.py:181-213)."""

    @partial(jax.jit, static_argnums=0)
    def _ias_step(self, logits_full, logits_stats, state: P.IASState, valid):
        # thresholds from the stats grid (OS8 by default), selection at full
        # res.  Pad samples are a ROW SUFFIX of the flattened pixel order
        # (self._pad appends), so the Pallas kernels mask them via a single
        # valid-pixel count.
        ias = self.cfg.pseudo_policy.ias
        if self.cfg.pseudo_policy.use_pallas_select:
            from hiast_tpu.ops.pallas.select_kernel import (
                fused_hist,
                fused_select_batched,
            )

            n_samples = jnp.sum(valid).astype(jnp.int32)
            per_sample_stats = 1
            for s in logits_stats.shape[1:-1]:
                per_sample_stats *= s
            _, _, hist = fused_hist(
                logits_stats, n_samples * per_sample_stats, num_bins=self.num_bins,
                with_pixels=False,
            )
            new_thr = P.ias_update(state, hist, ias.alpha, ias.beta, ias.gamma)
            per_sample_full = 1
            for s in logits_full.shape[1:-1]:
                per_sample_full *= s
            plbl, maxprob, counts, sums, totals = fused_select_batched(
                logits_full, new_thr, nvalid=n_samples * per_sample_full
            )
        else:
            stats_maxprob, stats_pred = P.confidences(logits_stats)
            w = jnp.broadcast_to(valid[:, None, None], stats_pred.shape)
            hist = P.class_prob_histogram(
                stats_maxprob, stats_pred, self.num_classes, self.num_bins, w
            )
            new_thr = P.ias_update(state, hist, ias.alpha, ias.beta, ias.gamma)
            maxprob, pred = P.confidences(logits_full)
            plbl = P.select_pseudo_labels(maxprob, pred, new_thr)
            plbl = jnp.where(valid[:, None, None] > 0, plbl, P.IGNORE)
            counts = P.per_sample_class_counts(plbl, self.num_classes)
            sums, totals = P.class_prob_sums(plbl, maxprob, self.num_classes)
        new_cmp = P.update_class_mean_probs(
            state.class_mean_probs, sums, totals, self.cfg.preprocessor.copy_paste.gamma
        )
        return plbl.astype(jnp.uint8), counts, P.IASState(new_thr, new_cmp)

    def run(self):
        if self.already_done():
            print(f"%% pseudo labels already exist in {self.save_dir}; skipping")
            return
        self.prepare_dirs()
        state = P.IASState(
            thresholds=jnp.full((self.num_classes,), 0.9, jnp.float32),
            class_mean_probs=jnp.zeros((self.num_classes,), jnp.float32),
        )

        def step(batch):
            nonlocal state
            images, valid, paths = self._pad(batch)
            full, stats_logits = self._forward(images)
            plbl, counts, state = self._ias_step(full, stats_logits, state, valid)
            return plbl, counts, paths

        self._run_select_loop(step)
        self.class_threshold = np.asarray(state.thresholds)
        self.class_mean_probs = np.asarray(state.class_mean_probs)
        self.save_data()
