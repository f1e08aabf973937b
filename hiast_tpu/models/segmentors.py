"""Segmentors: model forward + loss assembly as pure traced functions.

Each segmentor couples the segmentation trunk with its training objective,
mirroring the reference's three segmentor modules (reference:
code/sseg/models/segmentors/*.py) — but as stateless assemblies of pure
functions over ``(variables, batch)``, designed to live entirely inside one
jit'd step.  The bilinear logit upsampling to input resolution
(align_corners=True, reference self_training_segmentor.py:27) runs as MXU
matmuls (ops/resize.py) in float32.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from hiast_tpu.models.deeplab_v2 import FCDiscriminator, build_seg_model, validate_remat_mode
from hiast_tpu.ops import losses as L
from hiast_tpu.ops.resize import bilinear_resize
from hiast_tpu.registry import LOSS, MODEL


class BaseSegmentor:
    """Holds the Flax trunk + cfg; methods are pure and trace-safe."""

    def __init__(self, cfg, dtype: Any = jnp.bfloat16, backbone_layers=None):
        self.cfg = cfg
        self.dtype = dtype
        self.module = build_seg_model(cfg, dtype=dtype, backbone_layers=backbone_layers)

    # -- init / forward ------------------------------------------------------
    def init_variables(self, rng, input_shape=(1, 65, 65, 3)):
        """Initialize params/batch_stats under ONE jit program.

        Un-jitted flax init dispatches thousands of tiny eager device ops —
        ~4 min for MiT-B5 through the tunneled TPU's ~25 ms roundtrip
        (measured, PERF.md round 4); jitted it is one cached program. No
        parameter here depends on the input spatial size (convs/dense/LN/BN
        only — no positional embeddings), so the small default shape yields
        bit-identical variables to a full-resolution init."""
        import jax

        def _init(rng):
            return self.module.init(
                rng, jnp.zeros(input_shape, self.dtype), train=False,
                return_representation=True,
            )

        return jax.jit(_init)(rng)

    def raw_apply(self, variables, img, train: bool = False, mutable=False):
        """module.apply with optional gradient rematerialization
        (``cfg.runtime.remat`` on/off, ``cfg.runtime.remat_mode`` selects):

        - ``'full'``: whole-trunk ``jax.checkpoint`` — store only the
          inputs, recompute everything in the backward pass;
        - ``'dots'``: whole-trunk checkpoint that SAVES matmul outputs
          (``dots_with_no_batch_dims_saveable``) — less recompute, more HBM;
        - ``'blocks'`` / ``'blocks_dots'``: per-transformer-block remat,
          applied INSIDE the SegFormer module (models/segformer.py) — lowest
          peak HBM for deep transformer trunks.  On non-transformer trunks
          these fall back to whole-trunk 'full'.
        """
        import jax

        def apply_fn(variables, x):
            return self.module.apply(
                variables, x.astype(self.dtype), train=train, mutable=mutable
            )

        if train and getattr(self.cfg.runtime, "remat", False):
            mode = validate_remat_mode(getattr(self.cfg.runtime, "remat_mode", "full"))
            if mode == "dots":
                apply_fn = jax.checkpoint(
                    apply_fn,
                    policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                )
            elif mode in ("blocks", "blocks_dots"):
                # handled inside the module when it supports it (SegFormer);
                # whole-trunk fallback otherwise
                if getattr(self.module, "remat", "none") == "none":
                    apply_fn = jax.checkpoint(apply_fn)
            else:  # 'full'
                apply_fn = jax.checkpoint(apply_fn)
        return apply_fn(variables, img)

    def forward(self, variables, img, train: bool = False, mutable=False):
        """Returns {'logits' (full-res fp32), 'backbone'} (+ new model state)."""
        out = self.raw_apply(variables, img, train=train, mutable=mutable)
        if mutable:
            out, new_state = out
        logits = bilinear_resize(
            out["logits"].astype(jnp.float32), img.shape[1], img.shape[2]
        )
        result = {"logits": logits, "backbone": out["backbone"]}
        return (result, new_state) if mutable else result


@MODEL.register("SourceOnlySegmentor")
class SourceOnlySegmentor(BaseSegmentor):
    """Supervised training on source only (reference source_only_segmentor.py)."""

    def compute_loss(self, logits, lbl):
        seg_loss_fn = LOSS[self.cfg.model.predictor.seg_loss.type]
        return {
            "seg_loss": self.cfg.model.predictor.seg_loss.source_weight
            * seg_loss_fn(logits, lbl)
        }


@MODEL.register("SelfTrainingSegmentor")
class SelfTrainingSegmentor(BaseSegmentor):
    """HIAST loss assembly (reference self_training_segmentor.py:30-53):
    pseudo-label CE + KLD-to-uniform on the confident region + entropy
    sharpening on the ignored region + optional SoftCE consistency."""

    def compute_loss(self, t_logits, t_plbl, t_cst_lbl=None, s_logits=None, s_lbl=None):
        cfg = self.cfg
        seg_loss_fn = LOSS[cfg.model.predictor.seg_loss.type]
        losses = {}
        if s_lbl is not None:
            losses["source_seg_loss"] = seg_loss_fn(s_logits, s_lbl)

        losses["target_seg_loss"] = (
            cfg.model.predictor.seg_loss.target_pseudo_weight * seg_loss_fn(t_logits, t_plbl)
        )

        confident, ignored = L.build_region_weight(t_plbl)
        if cfg.model.predictor.kld_loss.weight > 0:
            losses["kld_confident_loss"] = cfg.model.predictor.kld_loss.weight * L.kld_to_uniform(
                t_logits, confident
            )
        if cfg.model.predictor.ent_loss.weight > 0:
            losses["ent_ignored_loss"] = cfg.model.predictor.ent_loss.weight * L.entropy_sharpen(
                t_logits, ignored
            )
        if t_cst_lbl is not None and cfg.cst_training.is_enabled and cfg.cst_training.cst_loss.weight > 0:
            # t_cst_lbl follows the reference teacher-target contract
            # (consistency trainer :117-119): hard argmax for 'CE', softmax
            # probabilities for everything else.  NOTE this matches the
            # reference even where that is questionable — e.g. 'KLDIV'
            # (losses take target LOGITS and softmax internally, reference
            # losses.py:16-23) would see softmax(softmax(logits)), exactly as
            # the reference would; released recipes only use SoftCE/CE.
            cst_loss_fn = LOSS[cfg.cst_training.cst_loss.type]
            losses["cst_loss"] = cfg.cst_training.cst_loss.weight * cst_loss_fn(
                t_logits,
                t_cst_lbl,
                refer_labels=t_plbl,
                region=cfg.cst_training.cst_loss.region,
            )
        return losses

    def compute_directional_consistency_loss(
        self, logits_a, logits_b, cp_mask, bidirectional: bool = True
    ):
        """Pixel-level DIRECTIONAL consistency on copy-pasted regions — the
        reference's commented-out ``compute_directional_consistency_loss``
        (self_training_segmentor.py:85-117, the active pixel-level variant),
        made real: within pasted pixels (``cp_mask != 255``), the LESS
        confident view aligns to the MORE confident view's soft prediction
        (SoftCE, both directions).  Deviations from the dead torch draft:
        the alignment target is stop-gradient (the draft backprops into the
        better view, pulling it DOWN toward the worse one — plainly
        unintended), and empty regions contribute exactly 0 via the
        nonzero-mean protocol instead of a host-side NaN guard.
        """
        weight = self.cfg.cst_training.dcst_loss.weight
        prob_a = jax.nn.softmax(logits_a, axis=-1)
        prob_b = jax.nn.softmax(logits_b, axis=-1)
        conf_a = jnp.max(prob_a, axis=-1)
        conf_b = jnp.max(prob_b, axis=-1)
        pasted = cp_mask != 255
        soft_ce = LOSS["SoftCE"]

        def one_direction(logits_src, prob_tgt, src_worse):
            mask = (pasted & src_worse).astype(jnp.int32)  # 1 = in-region
            return soft_ce(
                logits_src,
                jax.lax.stop_gradient(prob_tgt),
                refer_labels=mask,
                region="confident",
                ignore_index=0,
            )

        loss = one_direction(logits_a, prob_b, conf_a < conf_b)
        if bidirectional:  # False when b is a no-gradient teacher
            loss = loss + one_direction(logits_b, prob_a, conf_b < conf_a)
        return {"dcst_loss": weight * loss}

    def compute_mutual_loss(self, t_logits, t_plbl, t_mut_lbl):
        """Mutual-learning consistency against a peer model's soft target
        (the reference's latent ``mut_training`` surface,
        self_training_segmentor.py:55-61 / default_config.py:159-167)."""
        cfg = self.cfg
        losses = {}
        if cfg.mut_training.is_enabled and cfg.mut_training.mut_loss.weight > 0:
            mut_loss_fn = LOSS[cfg.cst_training.cst_loss.type]
            losses["mut_loss"] = cfg.mut_training.mut_loss.weight * mut_loss_fn(
                t_logits,
                t_mut_lbl,
                refer_labels=t_plbl,
                region=cfg.mut_training.mut_loss.region,
            )
        return losses


@MODEL.register("AdversarialWarmupSegmentor")
class AdversarialWarmupSegmentor(BaseSegmentor):
    """AdaptSegNet/AdvEnt-style adversarial warmup
    (reference adversarial_warmup_segmentor.py:12-86)."""

    def __init__(self, cfg, dtype: Any = jnp.bfloat16, backbone_layers=None):
        super().__init__(cfg, dtype, backbone_layers=backbone_layers)
        assert cfg.model.discriminator.is_enabled
        self.discriminator = FCDiscriminator(dtype=dtype)

    def init_d_variables(self, rng, input_shape=(1, 64, 64, None)):
        c = self.cfg.dataset.num_classes
        shape = tuple(s if s is not None else c for s in input_shape)
        return self.discriminator.init(rng, jnp.zeros(shape, self.dtype))

    def d_input(self, logits):
        """softmax (AdaptSegNet) or entropy map (AdvEnt) discriminator input."""
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if self.cfg.model.discriminator.is_entropy_input:
            return L.prob_to_entropy(probs)
        return probs

    def d_forward(self, d_params, logits):
        return self.discriminator.apply(d_params, self.d_input(logits).astype(self.dtype)).astype(
            jnp.float32
        )

    def compute_g_loss(self, s_logits, t_logits, s_lbl, d_params):
        """Generator-side losses (D params held fixed)."""
        cfg = self.cfg
        seg_loss_fn = LOSS[cfg.model.predictor.seg_loss.type]
        d_loss_fn = LOSS[cfg.model.discriminator.D_loss.type]
        losses = {
            "source_seg_loss": cfg.model.predictor.seg_loss.source_weight
            * seg_loss_fn(s_logits, s_lbl)
        }
        t_d_logits = self.d_forward(d_params, t_logits)
        is_source = jnp.zeros_like(t_d_logits)
        losses["adv_loss"] = cfg.model.discriminator.D_loss.adv_weight * d_loss_fn(
            t_d_logits, is_source
        )
        if cfg.model.predictor.ent_loss.weight > 0:  # MinEnt
            probs = jax.nn.softmax(t_logits.astype(jnp.float32), axis=-1)
            losses["target_ent_loss"] = cfg.model.predictor.ent_loss.weight * L.mean_entropy(probs)
        return losses

    def compute_d_loss(self, s_logits, t_logits, d_params):
        """Discriminator loss on detached segmentation logits."""
        cfg = self.cfg
        d_loss_fn = LOSS[cfg.model.discriminator.D_loss.type]
        s_d = self.d_forward(d_params, jax.lax.stop_gradient(s_logits))
        t_d = self.d_forward(d_params, jax.lax.stop_gradient(t_logits))
        d_loss = (
            d_loss_fn(s_d, jnp.zeros_like(s_d)) + d_loss_fn(t_d, jnp.ones_like(t_d))
        ) / 2
        return {"D_loss": cfg.model.discriminator.D_loss.weight * d_loss}


def build_segmentor(cfg, dtype: Any = jnp.bfloat16, backbone_layers=None) -> BaseSegmentor:
    return MODEL[cfg.model.type](cfg, dtype=dtype, backbone_layers=backbone_layers)
