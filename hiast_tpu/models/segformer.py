"""SegFormer (Mix Transformer) segmentation models, Flax / NHWC.

The modern-ViT stretch goal named in BASELINE.json ("SegFormer MiT-B5
backbone"): hierarchical Mix-Transformer encoder (overlapping patch embeds,
spatial-reduction attention, Mix-FFN with a depthwise conv) + the all-MLP
SegFormer decode head producing stride-4 logits.

TPU notes: attention runs over (H/stride * W/stride) tokens with
spatial-reduction ratios (8,4,2,1) — queries are long but K/V stay ~512
tokens at train resolution.  The default path is plain `jnp.einsum`
attention (maps straight onto the MXU; no sequence parallelism needed,
SURVEY §5.7); `runtime.fused_attention` opts into the flash-style Pallas
kernel (ops/pallas/attention.py) that keeps the [N_q, N_kv] score matrix
in VMEM instead of round-tripping HBM — same math, same param tree.

Variants: B0..B5 via (embed_dims, depths).  Registered as
SEG_MODEL['SegFormer_B5'] etc., drop-in for DeepLab_V2 in any config
(`model.seg_model.type: 'SegFormer_B5'`).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from hiast_tpu.models.norm import TorchBatchNorm
from hiast_tpu.registry import SEG_MODEL

LN_EPS = 1e-6

VARIANTS = {
    # embed_dims, depths
    "B0": ((32, 64, 160, 256), (2, 2, 2, 2)),
    "B1": ((64, 128, 320, 512), (2, 2, 2, 2)),
    "B2": ((64, 128, 320, 512), (3, 4, 6, 3)),
    "B3": ((64, 128, 320, 512), (3, 4, 18, 3)),
    "B4": ((64, 128, 320, 512), (3, 8, 27, 3)),
    "B5": ((64, 128, 320, 512), (3, 6, 40, 3)),
}
NUM_HEADS = (1, 2, 5, 8)
SR_RATIOS = (8, 4, 2, 1)
MLP_RATIOS = (4, 4, 4, 4)


class OverlapPatchEmbed(nn.Module):
    dim: int
    patch: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch // 2
        x = nn.Conv(
            self.dim, (self.patch, self.patch), strides=(self.stride, self.stride),
            padding=((p, p), (p, p)), dtype=self.dtype, name="proj",
        )(x)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)


class EfficientAttention(nn.Module):
    """Self-attention with spatially-reduced K/V (SegFormer's SRA).

    ``fused=True`` (cfg ``runtime.fused_attention``) routes the softmax
    chain through the flash-style Pallas kernel
    (ops/pallas/attention.py) — the [N_q, N_kv] score matrix stays in
    VMEM instead of round-tripping HBM (0.5 GB/block f32 for stage 1 at
    512x1024 batch 8).  Identical math; parameters are unaffected.
    """

    dim: int
    heads: int
    sr: int
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        head_dim = self.dim // self.heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x).reshape(
            b, h * w, self.heads, head_dim
        )
        kv_in = x
        if self.sr > 1:
            from hiast_tpu.parallel.hints import constrain_space_replicated

            # The reduced K/V grid (H/sr x W/sr) is consumed replicated by
            # the attention contraction; pinning it at both ends of sr_norm
            # stops GSPMD from guessing conflicting layouts for the k-/v-
            # branch cotangents, whose accumulation otherwise falls into
            # "[SPMD] Involuntary full rematerialization" on every dp x sp
            # step.  No-op on space=1 meshes (parallel/hints.py).
            kv_in = nn.Conv(
                self.dim, (self.sr, self.sr), strides=(self.sr, self.sr),
                dtype=self.dtype, name="sr",
            )(x)
            kv_in = constrain_space_replicated(kv_in)
            kv_in = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="sr_norm")(kv_in)
            kv_in = constrain_space_replicated(kv_in)
        n_kv = kv_in.shape[1] * kv_in.shape[2]
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(kv_in).reshape(
            b, n_kv, self.heads, head_dim
        )
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(kv_in).reshape(
            b, n_kv, self.heads, head_dim
        )
        from hiast_tpu.ops.pallas.attention import sra_attention, sra_attention_reference

        attn_fn = sra_attention if self.fused else sra_attention_reference
        out = attn_fn(q, k, v).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class MixFFN(nn.Module):
    dim: int
    ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = self.dim * self.ratio
        y = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        # depthwise 3x3 conv mixes local position information (the "Mix")
        y = nn.Conv(
            hidden, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=hidden,
            dtype=self.dtype, name="dwconv",
        )(y)
        y = nn.gelu(y)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)


class MiTBlock(nn.Module):
    dim: int
    heads: int
    sr: int
    ratio: int
    dtype: Any = jnp.float32
    fused_attention: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(x)
        x = x + EfficientAttention(
            self.dim, self.heads, self.sr, dtype=self.dtype,
            fused=self.fused_attention, name="attn",
        )(y)
        y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(x)
        return x + MixFFN(self.dim, self.ratio, dtype=self.dtype, name="ffn")(y)


class MixTransformer(nn.Module):
    embed_dims: Sequence[int]
    depths: Sequence[int]
    dtype: Any = jnp.float32
    # 'none' | 'blocks' | 'blocks_dots': per-BLOCK gradient rematerialization.
    # Unlike whole-trunk jax.checkpoint (which recomputes the full forward and
    # then holds nearly every residual live during the backward), per-block
    # remat stores only the block-boundary activations and recomputes one
    # block at a time — same +1-forward FLOP cost, far lower peak HBM.
    # 'blocks_dots' additionally SAVES matmul outputs inside each block
    # (dots_with_no_batch_dims_saveable): less recompute, more memory.
    remat: str = "none"
    fused_attention: Any = False  # bool or per-stage 4-tuple, see __call__

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = MiTBlock
        if train and self.remat in ("blocks", "blocks_dots"):
            import jax

            policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                if self.remat == "blocks_dots"
                else None
            )
            # nn.remat is parameter-transparent: same param tree + names
            block_cls = nn.remat(MiTBlock, policy=policy)
        # fused_attention: bool, or a per-stage 4-tuple — stage 4 (sr=1,
        # 8 heads, short 16x32 token grid) measured as a fused/einsum wash
        # on real Mosaic while stages 1-3 win 23-41% (PERF.md round 4), so
        # the production mix can route each stage to its winner.
        per_stage = (
            tuple(self.fused_attention)
            if isinstance(self.fused_attention, (list, tuple))
            else (self.fused_attention,) * 4
        )
        assert len(per_stage) == 4, (
            f"fused_attention must be a bool or 4 per-stage flags, got "
            f"{self.fused_attention!r}"
        )
        feats = []
        for s in range(4):
            patch, stride = (7, 4) if s == 0 else (3, 2)
            x = OverlapPatchEmbed(
                self.embed_dims[s], patch, stride, dtype=self.dtype, name=f"patch_embed{s + 1}"
            )(x)
            for b in range(self.depths[s]):
                x = block_cls(
                    self.embed_dims[s], NUM_HEADS[s], SR_RATIOS[s], MLP_RATIOS[s],
                    dtype=self.dtype, fused_attention=per_stage[s],
                    name=f"block{s + 1}_{b}",
                )(x)
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name=f"norm{s + 1}")(x)
            feats.append(x)
        return feats  # strides 4, 8, 16, 32


class LinearFuse(nn.Module):
    """The head's fuse 1x1 conv, applied per stage BEFORE upsampling.

    The kernel is kept in the reference concat layout
    ``[1, 1, n_stages*embed_dim, embed_dim]`` (exact .pth/HF interop —
    models/convert_segformer.py), but because a 1x1 conv is linear and
    commutes with bilinear interpolation,
    ``fuse(concat(up(y_4)..up(y_1))) == sum_i up(y_i @ W_i)`` exactly.
    Applying each stage's kernel block at that stage's native grid moves
    3/4 of the fuse FLOPs off the 1/4-resolution grid (the fuse matmul
    alone was 1.24 TFLOP/fwd on MiT-B5 at 512x1024 batch 8 — 37% of the
    model, PERF.md round 4) and never materializes the n_stages*embed_dim
    concat tensor (1.6 GB there)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, parts, out_hw):
        """parts: per-stage [B, h_i, w_i, embed_dim] in CONCAT ORDER
        (deepest stage first, as the reference concatenates); returns the
        fused [B, *out_hw, features] map."""
        from hiast_tpu.ops.resize import bilinear_resize

        total_in = sum(p.shape[-1] for p in parts)
        # same name/shape/init as the nn.Conv kernel this replaces
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, total_in, self.features), jnp.float32,
        )
        w_all = kernel[0, 0].astype(self.dtype)
        h, w = out_hw
        x = None
        off = 0
        for p in parts:
            blk = w_all[off:off + p.shape[-1]]
            off += p.shape[-1]
            z = jnp.einsum("bhwc,cd->bhwd", p, blk)
            if z.shape[1] != h or z.shape[2] != w:
                z = bilinear_resize(z, h, w, align_corners=False)
            x = z if x is None else x + z
        return x


class SegFormerHead(nn.Module):
    """All-MLP decode head: per-stage projection -> fuse -> upsample to
    1/4 -> sum -> classify (the fuse/upsample order is swapped vs the
    reference concat formulation — mathematically identical, see
    LinearFuse)."""

    num_classes: int
    embed_dim: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        h, w = feats[0].shape[1], feats[0].shape[2]
        proj = []
        for i, f in enumerate(feats):
            y = nn.Dense(self.embed_dim, dtype=self.dtype, name=f"linear_c{i + 1}")(f)
            proj.append(y)
        x = LinearFuse(self.embed_dim, dtype=self.dtype, name="fuse")(
            proj[::-1], (h, w)
        )
        x = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="fuse_bn",
        )(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="classifier")(x)


class SegFormer(nn.Module):
    """Full model with the seg_model interface ({'logits','backbone'})."""

    num_classes: int = 19
    variant: str = "B5"
    output_dim: int = 256  # interface parity; unused
    dtype: Any = jnp.float32
    remat: str = "none"  # see MixTransformer.remat
    fused_attention: Any = False  # bool or per-stage 4-tuple (MixTransformer)

    @nn.compact
    def __call__(self, x, train: bool = False, bn_axis_name=None, return_representation=False):
        embed_dims, depths = VARIANTS[self.variant]
        feats = MixTransformer(
            embed_dims, depths, dtype=self.dtype, remat=self.remat,
            fused_attention=self.fused_attention, name="backbone",
        )(x, train=train)
        head_dim = 256 if self.variant in ("B0",) else 768
        logits = SegFormerHead(
            self.num_classes, embed_dim=head_dim, dtype=self.dtype, name="decode_head"
        )(feats, train=train)
        out = {"logits": logits, "backbone": feats[-1]}
        if return_representation:
            out["representation"] = feats[-1]
        return out


def _make_variant_factory(variant: str):
    def factory(num_classes=19, output_dim=256, dtype=jnp.float32, remat="none",
                fused_attention=False, **_ignored):
        return SegFormer(
            num_classes=num_classes, variant=variant, output_dim=output_dim,
            dtype=dtype, remat=remat, fused_attention=fused_attention,
        )

    return factory


for _variant in VARIANTS:
    SEG_MODEL.register(f"SegFormer_{_variant}", _make_variant_factory(_variant))
