"""jit-compiled train steps.

One fused XLA program per trainer type holds: on-device strong-view color
augmentation, ImageNet normalization, teacher (EMA) forward, student
forward/backward, every loss term, the optimizer update, and the EMA update —
replacing the reference's Python-side loop body (loss dict -> apex scale_loss
-> backward -> step -> update_ema_model, reference:
code/workflows/trainer/base_trainer.py:127-141,
code/workflows/trainer/consistency_self_training_trainer.py:62-124,
code/utils/utils.py:115-123).  Under a sharded-batch mesh the gradient
all-reduce and cross-replica BatchNorm statistics are emitted by XLA
automatically over ICI.

Batches arrive as uint8 images ([B, H, W, 3], RGB, 0..255) — normalization
happens on device, quartering host->device transfer bytes.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from hiast_tpu.ops.color_aug import batched_color_aug
from hiast_tpu.selftrain.train_state import TrainState, ema_update

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_image(img_uint8: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [0,255] RGB -> ImageNet-normalized float32 (reference
    code/sseg/datasets/utils.py:37-55)."""
    x = img_uint8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std


def _total_loss(losses: dict) -> jnp.ndarray:
    """Sum of all non-discriminator losses (reference base_trainer.py:128)."""
    return sum(v for k, v in losses.items() if "D_" not in k)


def _loss_grid(segmentor):
    """('full' | 'os8', label-downsample fn) per cfg.train.loss_resolution."""
    res = segmentor.cfg.train.loss_resolution
    assert res in ("full", "os8"), res
    return res


def _forward_for_loss(segmentor, variables, img, train, mutable=False):
    """Model forward returning logits at the configured loss resolution."""
    if _loss_grid(segmentor) == "full":
        return segmentor.forward(variables, img, train=train, mutable=mutable)
    out = segmentor.raw_apply(variables, img, train=train, mutable=mutable)
    if mutable:
        out, new_state = out
    result = {"logits": out["logits"].astype(jnp.float32), "backbone": out["backbone"]}
    return (result, new_state) if mutable else result


def _labels_for_loss(segmentor, lbl, logits):
    """Match label resolution to the loss grid (logits may be stride 8 for
    DeepLab or stride 4 for SegFormer)."""
    from hiast_tpu.ops.resize import nearest_resize

    if _loss_grid(segmentor) == "full":
        return lbl
    return nearest_resize(lbl, logits.shape[1], logits.shape[2])


def _apply_updates(state: TrainState, tx, grads, losses, new_batch_stats) -> TrainState:
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_batch_stats,
        opt_state=new_opt_state,
    )
    return new_state


def _guard_nonfinite(cfg, state, new_state, losses, grad_trees) -> TrainState:
    """Optional non-finite guard (``runtime.skip_nonfinite_updates``): if any
    loss or gradient is non-finite, keep the WHOLE old state (params, peer/D
    params, optimizer moments, batch stats) for this step instead of
    poisoning the run.  Production hardening with no reference analog (a NaN
    there corrupts every replica through the DDP all-reduce).

    ``losses`` includes discriminator terms on purpose (a NaN D grad must
    also skip), and ``grad_trees`` lists every gradient pytree the step
    applied (student, peer, discriminator)."""
    if not getattr(cfg.runtime, "skip_nonfinite_updates", False):
        return new_state
    finite = functools.reduce(
        lambda acc, v: acc & jnp.all(jnp.isfinite(v)), losses.values(), jnp.bool_(True)
    )
    for g in grad_trees:
        finite = jax.tree_util.tree_reduce(
            lambda acc, x: acc & jnp.all(jnp.isfinite(x)), g, finite
        )
    # On skip, keep the OLD batch_stats too: a NaN forward pass (the usual
    # source of a non-finite loss) writes NaN into the BN running stats, which
    # would poison the model permanently even though params were protected.
    skipped = state.replace(step=state.step + 1)
    return jax.tree.map(lambda a, b: jnp.where(finite, a, b), new_state, skipped)


def _guarded_apply_updates(cfg, state, tx, grads, losses, new_batch_stats) -> TrainState:
    new_state = _apply_updates(state, tx, grads, losses, new_batch_stats)
    return _guard_nonfinite(cfg, state, new_state, losses, (grads,))


# ---------------------------------------------------------------------------
# source-only (reference source_only_trainer.py)
# ---------------------------------------------------------------------------
def make_source_only_step(segmentor, tx) -> Callable:
    def step(state: TrainState, batch, rng):
        img = normalize_image(batch["s_img"])
        s_lbl = batch["s_lbl"].astype(jnp.int32)  # labels ship as uint8

        def loss_fn(params):
            out, new_model = segmentor.forward(
                {"params": params, "batch_stats": state.batch_stats},
                img, train=True, mutable=["batch_stats"],
            )
            losses = segmentor.compute_loss(out["logits"], s_lbl)
            return _total_loss(losses), (losses, new_model["batch_stats"])

        grads, (losses, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        return _guarded_apply_updates(segmentor.cfg, state, tx, grads, losses, new_bs), losses

    return step


# ---------------------------------------------------------------------------
# plain self-training (reference self_training_trainer.py)
# ---------------------------------------------------------------------------
def make_self_training_step(segmentor, tx) -> Callable:
    def step(state: TrainState, batch, rng):
        img = normalize_image(batch["t_img"])

        def loss_fn(params):
            out, new_model = _forward_for_loss(
                segmentor,
                {"params": params, "batch_stats": state.batch_stats},
                img, train=True, mutable=["batch_stats"],
            )
            plbl = _labels_for_loss(
                segmentor, batch["t_plbl"].astype(jnp.int32), out["logits"]
            )
            losses = segmentor.compute_loss(out["logits"], plbl)
            return _total_loss(losses), (losses, new_model["batch_stats"])

        grads, (losses, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        return _guarded_apply_updates(segmentor.cfg, state, tx, grads, losses, new_bs), losses

    return step


# ---------------------------------------------------------------------------
# HIAST consistency self-training (reference consistency_self_training_trainer.py)
# ---------------------------------------------------------------------------
def make_consistency_step(segmentor, tx, strong_aug: str | None = "CCA") -> Callable:
    """Weak view in, strong view made ON DEVICE, EMA teacher target, student
    update, EMA update — one program."""
    cfg = segmentor.cfg
    ema_gamma = cfg.cst_training.ema_model.gamma
    ema_iter_update = max(1, int(cfg.cst_training.ema_model.iter_update))
    hard_teacher = cfg.cst_training.cst_loss.type == "CE"

    def step(state: TrainState, batch, rng):
        weak_raw = batch["t_img"].astype(jnp.float32)
        if strong_aug is not None:
            # bf16: halves the HBM traffic of the bandwidth-bound aug chain;
            # quantization-equivalent to the reference's uint8 host aug
            strong_raw = batched_color_aug(
                batch["t_img"], rng, kind=strong_aug, dtype=jnp.bfloat16
            )
        else:
            strong_raw = batch.get("t_img_strong", weak_raw).astype(jnp.float32)
        weak = normalize_image(weak_raw)
        strong = normalize_image(strong_raw)

        # EMA teacher forward (eval mode, running stats; reference :113-119)
        t_weak_logits = _forward_for_loss(
            segmentor,
            {"params": state.ema_params, "batch_stats": state.batch_stats},
            weak, train=False,
        )["logits"]
        plbl = _labels_for_loss(segmentor, batch["t_plbl"].astype(jnp.int32), t_weak_logits)
        if hard_teacher:
            cst_lbl = jnp.argmax(t_weak_logits, axis=-1)
        else:
            cst_lbl = jax.nn.softmax(t_weak_logits, axis=-1)
        cst_lbl = jax.lax.stop_gradient(cst_lbl)
        # directional consistency on copy-pasted regions (optional; the
        # teacher is the confident side candidate, gradient-free)
        cp_mask = None
        if cfg.cst_training.dcst_loss.weight > 0 and "copy_paste_mask" in batch:
            cp_mask = _labels_for_loss(
                segmentor, batch["copy_paste_mask"].astype(jnp.int32), t_weak_logits
            )

        def loss_fn(params):
            out, new_model = _forward_for_loss(
                segmentor,
                {"params": params, "batch_stats": state.batch_stats},
                strong, train=True, mutable=["batch_stats"],
            )
            losses = segmentor.compute_loss(out["logits"], plbl, t_cst_lbl=cst_lbl)
            if cp_mask is not None:
                losses.update(
                    segmentor.compute_directional_consistency_loss(
                        out["logits"], t_weak_logits, cp_mask, bidirectional=False
                    )
                )
            return _total_loss(losses), (losses, new_model["batch_stats"])

        grads, (losses, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = _guarded_apply_updates(cfg, state, tx, grads, losses, new_bs)
        # EMA of params every `iter_update` iterations (reference consistency
        # trainer :69-71); buffers (batch_stats) track the student wholesale
        # (reference utils.py:115-123 copies buffers each update)
        if ema_iter_update == 1:
            new_ema = ema_update(state.ema_params, new_state.params, ema_gamma)
        else:
            new_ema = jax.lax.cond(
                new_state.step % ema_iter_update == 0,
                lambda ema, p: ema_update(ema, p, ema_gamma),
                lambda ema, p: ema,
                state.ema_params, new_state.params,
            )
        new_state = new_state.replace(ema_params=new_ema)
        return new_state, losses

    return step


# ---------------------------------------------------------------------------
# mutual learning (the reference's latent mut_training surface:
# default_config.py:159-167, self_training_segmentor.py:55-61 — two students
# teach each other through soft targets; here both live in ONE jit program)
# ---------------------------------------------------------------------------
def make_mutual_step(segmentor, tx, strong_aug: str | None = None) -> Callable:
    """Two students (params / peer_params) train on the same pseudo-labeled
    batch; each additionally matches the OTHER's soft prediction (stop-grad)
    on the configured region.  With ``mut_training.is_strong_input`` each
    student trains on its own strongly-augmented view while the peer targets
    come from the weak view — the mutual analog of the consistency step."""
    cfg = segmentor.cfg
    strong_input = cfg.mut_training.is_strong_input and strong_aug is not None
    # the mutual loss is ALIASED to the consistency loss (the reference's
    # explicit choice, self_training_segmentor.py:22-23), so the peer target
    # follows the same convention as the consistency teacher target
    # (consistency trainer :117-119): hard argmax for CE, softmax otherwise
    hard_target = cfg.cst_training.cst_loss.type == "CE"

    def step(state: TrainState, batch, rng):
        weak_raw = batch["t_img"].astype(jnp.float32)
        rng_a, rng_b = jax.random.split(rng)
        if strong_input:
            aug = functools.partial(
                batched_color_aug, batch["t_img"], kind=strong_aug, dtype=jnp.bfloat16
            )
            in_a = normalize_image(aug(rng_a))
            in_b = normalize_image(aug(rng_b))
        else:
            in_a = in_b = normalize_image(weak_raw)
        weak = normalize_image(weak_raw)

        # peer targets from the weak view, eval mode, no gradients
        def peer_target(params, batch_stats):
            logits = _forward_for_loss(
                segmentor, {"params": params, "batch_stats": batch_stats}, weak,
                train=False,
            )["logits"]
            tgt = (
                jnp.argmax(logits, axis=-1)
                if hard_target
                else jax.nn.softmax(logits, axis=-1)
            )
            return jax.lax.stop_gradient(tgt)

        tgt_from_a = peer_target(state.params, state.batch_stats)
        tgt_from_b = peer_target(state.peer_params, state.peer_batch_stats)
        plbl_full = batch["t_plbl"].astype(jnp.int32)
        plbl = _labels_for_loss(segmentor, plbl_full, tgt_from_a)

        def one_student(params, batch_stats, img, mut_target):
            out, new_model = _forward_for_loss(
                segmentor, {"params": params, "batch_stats": batch_stats},
                img, train=True, mutable=["batch_stats"],
            )
            losses = segmentor.compute_loss(out["logits"], plbl)
            losses.update(segmentor.compute_mutual_loss(out["logits"], plbl, mut_target))
            return losses, new_model["batch_stats"]

        def loss_fn(params_a, params_b):
            losses_a, bs_a = one_student(params_a, state.batch_stats, in_a, tgt_from_b)
            losses_b, bs_b = one_student(
                params_b, state.peer_batch_stats, in_b, tgt_from_a
            )
            total = _total_loss(losses_a) + _total_loss(losses_b)
            merged = {**losses_a, **{f"peer_{k}": v for k, v in losses_b.items()}}
            return total, (merged, bs_a, bs_b)

        grads = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)
        (g_a, g_b), (losses, bs_a, bs_b) = grads(state.params, state.peer_params)

        new_state = _apply_updates(state, tx, g_a, losses, bs_a)
        upd_b, new_opt_b = tx.update(g_b, state.peer_opt_state, state.peer_params)
        new_peer = jax.tree.map(lambda p, u: p + u, state.peer_params, upd_b)
        new_state = new_state.replace(
            peer_params=new_peer, peer_batch_stats=bs_b, peer_opt_state=new_opt_b
        )
        return _guard_nonfinite(cfg, state, new_state, losses, (g_a, g_b)), losses

    return step


# ---------------------------------------------------------------------------
# adversarial warmup (reference adversarial_warmup_trainer.py)
# ---------------------------------------------------------------------------
def make_adversarial_step(segmentor, tx, d_tx) -> Callable:
    def step(state: TrainState, batch, rng):
        s_img = normalize_image(batch["s_img"])
        t_img = normalize_image(batch["t_img"])
        s_lbl = batch["s_lbl"].astype(jnp.int32)

        def g_loss_fn(params):
            s_out, new_model = segmentor.forward(
                {"params": params, "batch_stats": state.batch_stats},
                s_img, train=True, mutable=["batch_stats"],
            )
            t_out, new_model2 = segmentor.forward(
                {"params": params, "batch_stats": new_model["batch_stats"]},
                t_img, train=True, mutable=["batch_stats"],
            )
            losses = segmentor.compute_g_loss(
                s_out["logits"], t_out["logits"], s_lbl, state.d_params
            )
            aux = (losses, new_model2["batch_stats"], s_out["logits"], t_out["logits"])
            return _total_loss(losses), aux

        grads, (losses, new_bs, s_logits, t_logits) = jax.grad(g_loss_fn, has_aux=True)(
            state.params
        )

        def d_loss_fn(d_params):
            d_losses = segmentor.compute_d_loss(s_logits, t_logits, d_params)
            return d_losses["D_loss"], d_losses

        d_grads, d_losses = jax.grad(d_loss_fn, has_aux=True)(state.d_params)

        new_state = _apply_updates(state, tx, grads, losses, new_bs)
        d_updates, new_d_opt = d_tx.update(d_grads, state.d_opt_state, state.d_params)
        new_d_params = jax.tree.map(lambda p, u: p + u, state.d_params, d_updates)
        new_state = new_state.replace(d_params=new_d_params, d_opt_state=new_d_opt)
        losses = {**losses, **d_losses}
        cfg = segmentor.cfg
        return _guard_nonfinite(cfg, state, new_state, losses, (grads, d_grads)), losses

    return step


# ---------------------------------------------------------------------------
# shared eval forward
# ---------------------------------------------------------------------------
def make_eval_forward(segmentor) -> Callable:
    """Normalized eval forward returning full-res fp32 logits."""

    def fwd(params, batch_stats, img_uint8):
        img = normalize_image(img_uint8)
        return segmentor.forward(
            {"params": params, "batch_stats": batch_stats}, img, train=False
        )["logits"]

    return fwd
