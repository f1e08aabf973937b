"""Attribute the SegFormer MiT-B5 consistency-step cost to components on
the real TPU: full step vs fwd+bwd core vs forward, trunk vs decode head,
a PER-STAGE trunk decomposition, and the Mix-FFN depthwise conv in
isolation — at the round-4 production settings (fused Pallas SRA
attention, no remat, bf16, batch 8, 512x1024).

All timings use pipelined dispatch (scripts/profile_train.timeit_pipelined):
enqueue the window back-to-back, fetch one scalar at the end — the same
dispatch pattern as the production loops and the bench windows, so the
tunnel's ~25 ms scalar-fetch roundtrip is amortized over the window
instead of taxing every iteration (the earlier run of this script taxed
each entry; PERF.md notes which table is which).

The round-4 ablation (PERF.md) got the step to 0.292 s/iter pipelined,
24.5% model-MFU; this script answers "where do the other 75% go" so the
next optimization targets the real hotspot instead of a guess.

Run from the repo root:  python scripts/profile_segformer_components.py
(one TPU process at a time; ~10 min warm)
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_train import flops_of, sync, timeit_pipelined  # noqa: E402


def measure(report, tag, jitted, dispatch, fetch, *flop_args, iters=10):
    from hiast_tpu.runtime_init import chip_peak_flops

    try:
        dt = timeit_pipelined(dispatch, fetch, iters=iters)
    except Exception as e:  # noqa: BLE001 - keep profiling the rest
        report[tag] = f"FAILED: {str(e)[-160:]}"
        return
    report[tag] = dt
    flops = flops_of(jitted, *flop_args)
    peak = chip_peak_flops()
    if flops and peak:
        report[f"{tag}_mfu"] = flops / dt / peak
        report[f"{tag}_gflops"] = flops / 1e9
    print(f"  {tag}: {dt*1e3:.1f} ms", flush=True)


def fetch_scalar(out):
    return sync(out if getattr(out, "ndim", 1) == 0 else out.ravel()[0])


def main(batch_size=8, h=512, w=1024, variant="B5"):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from hiast_tpu.runtime_init import init_runtime

    init_runtime()

    from hiast_tpu.config import default_config
    from hiast_tpu.models import segformer as SF
    from hiast_tpu.models.segmentors import build_segmentor
    from hiast_tpu.registry import populate
    from hiast_tpu.selftrain import steps as S
    from hiast_tpu.selftrain.train_state import TrainState, make_optimizer

    populate()
    report = {"batch": batch_size, "hw": [h, w], "variant": variant}
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, size=(batch_size, h, w, 3), dtype=np.uint8))
    batch = {
        "t_img": img,
        "t_plbl": jnp.asarray(
            np.where(
                rng.random(size=(batch_size, h, w)) < 0.4,
                255,
                rng.integers(0, 19, size=(batch_size, h, w)),
            ).astype(np.int32)
        ),
    }
    key = jax.random.PRNGKey(1)

    cfg = default_config()
    cfg.model.type = "SelfTrainingSegmentor"
    cfg.model.seg_model.type = f"SegFormer_{variant}"
    cfg.cst_training.is_enabled = True
    cfg.cst_training.cst_loss.weight = 0.5
    cfg.train.batch_size = batch_size
    cfg.train.lr = 3e-6
    cfg.train.total_iter = 8000
    cfg.runtime.fused_attention = True
    segmentor = build_segmentor(cfg, dtype=jnp.bfloat16)
    variables = segmentor.init_variables(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        ema_params=jax.tree.map(jnp.copy, variables["params"]),
    )

    # 1) full consistency step (the bench number)
    step_full = jax.jit(S.make_consistency_step(segmentor, tx, strong_aug="CCA"))
    measure(report, "consistency_step", step_full,
            lambda: step_full(state, batch, key)[1]["target_seg_loss"], sync,
            state, batch, key)

    # 2) student fwd+bwd+update only (no teacher fwd, no CCA): the training core
    step_st = jax.jit(S.make_self_training_step(segmentor, tx))
    measure(report, "self_training_step", step_st,
            lambda: step_st(state, batch, key)[1]["target_seg_loss"], sync,
            state, batch, key)

    # 3) eval forward (the teacher-pass / pseudo-gen cost)
    fwd = jax.jit(S.make_eval_forward(segmentor))
    measure(report, "fwd_full_model", fwd,
            lambda: fwd(state.params, state.batch_stats, img), fetch_scalar,
            state.params, state.batch_stats, img, iters=20)

    # 4/5) trunk-only vs decode-head-only, forward (fresh bare modules: same
    # architecture/shapes as inside the segmentor, so the timing attributes)
    embed_dims, depths = SF.VARIANTS[variant]
    trunk = SF.MixTransformer(embed_dims, depths, dtype=jnp.bfloat16, fused_attention=True)
    x0 = (img.astype(jnp.bfloat16) / 255.0) - 0.5
    tvars = jax.jit(trunk.init, static_argnames=("train",))(jax.random.PRNGKey(0), x0[:1], train=False)

    @jax.jit
    def trunk_fwd(tvars, x):
        return trunk.apply(tvars, x, train=False)[-1]

    measure(report, "fwd_trunk_only", trunk_fwd,
            lambda: trunk_fwd(tvars, x0), fetch_scalar, tvars, x0, iters=20)

    head_dim = 256 if variant in ("B0",) else 768
    head = SF.SegFormerHead(19, embed_dim=head_dim, dtype=jnp.bfloat16)
    feats = [
        jnp.zeros((batch_size, h // s, w // s, c), jnp.bfloat16)
        for s, c in zip((4, 8, 16, 32), embed_dims)
    ]
    hvars = head.init(jax.random.PRNGKey(0), [f[:1] for f in feats], train=False)

    @jax.jit
    def head_fwd(hvars, feats):
        return head.apply(hvars, feats, train=False)

    measure(report, "fwd_head_only", head_fwd,
            lambda: head_fwd(hvars, feats), fetch_scalar, hvars, feats, iters=20)

    def grad_sum(g):
        # Reduce EVERY grad leaf into the returned scalar: a value_and_grad
        # whose gradient never escapes the jit is dead code — XLA deletes
        # the whole backward and "fwd+bwd" silently measures fwd only
        # (burned this script once; the reduction is one ~0.4 ms pass).
        return jax.tree_util.tree_reduce(
            lambda a, b: a + b.astype(jnp.float32).sum(), g, jnp.float32(0.0)
        )

    # 6) trunk fwd+bwd (where remat/attention live)
    @jax.jit
    def trunk_fwdbwd(tvars, x):
        def loss(v):
            return trunk.apply(v, x, train=False)[-1].astype(jnp.float32).mean()

        l, g = jax.value_and_grad(loss)(tvars)
        return l + grad_sum(g)

    measure(report, "fwdbwd_trunk_only", trunk_fwdbwd,
            lambda: trunk_fwdbwd(tvars, x0), sync, tvars, x0)

    # 7) PER-STAGE trunk forward: patch embed + that stage's blocks at the
    # stage's native grid.  B5 = 3/6/40/3 blocks at strides 4/8/16/32.
    # The per-stage sum vs fwd_trunk_only cross-checks the attribution.
    stage_in = [(h, w, 3)]
    for s in range(3):
        stride = 4 * (2 ** s)
        stage_in.append((h // stride, w // stride, embed_dims[s]))

    for s in range(4):
        class _Stage(nn.Module):
            @nn.compact
            def __call__(self, x, _s=s):
                patch, stride = (7, 4) if _s == 0 else (3, 2)
                x = SF.OverlapPatchEmbed(
                    embed_dims[_s], patch, stride, dtype=jnp.bfloat16, name="pe")(x)
                for b in range(depths[_s]):
                    x = SF.MiTBlock(
                        embed_dims[_s], SF.NUM_HEADS[_s], SF.SR_RATIOS[_s],
                        SF.MLP_RATIOS[_s], dtype=jnp.bfloat16,
                        fused_attention=True, name=f"blk{b}")(x)
                return x

        stage = _Stage()
        xs = jnp.zeros((batch_size, *stage_in[s]), jnp.bfloat16)
        svars = jax.jit(stage.init)(jax.random.PRNGKey(0), xs[:1])

        @jax.jit
        def stage_fwd(svars, x, _stage=stage):
            return _stage.apply(svars, x)

        measure(report, f"fwd_stage{s + 1}_only", stage_fwd,
                lambda: stage_fwd(svars, xs), fetch_scalar, svars, xs, iters=20)

        @jax.jit
        def stage_fwdbwd(svars, x, _stage=stage):
            def loss(v):
                return _stage.apply(v, x).astype(jnp.float32).mean()

            l, g = jax.value_and_grad(loss)(svars)
            return l + grad_sum(g)

        if s in (0, 2):  # the two interesting backwards: bandwidth-bound
            # large grid (stage 1) vs FLOP-dominant depth (stage 3); each
            # extra program is a fresh 30-100 s tunnel compile.
            measure(report, f"fwdbwd_stage{s + 1}_only", stage_fwdbwd,
                    lambda: stage_fwdbwd(svars, xs), sync, svars, xs, iters=20)

    # 8) the Mix-FFN depthwise 3x3 in isolation at the stage-3 shape (40 of
    # B5's 52 blocks): is XLA's TPU depthwise lowering a bottleneck?
    s3_tokens = (h // 16, w // 16)
    dim3 = embed_dims[2] * 4  # ffn hidden
    y3 = jnp.zeros((batch_size, *s3_tokens, dim3), jnp.bfloat16)

    dw = nn.Conv(dim3, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=dim3,
                 dtype=jnp.bfloat16)
    dvars = dw.init(jax.random.PRNGKey(0), y3[:1])

    @jax.jit
    def dw_fwd(dvars, y):
        # chain 8 deep: one dwconv is shorter than the dispatch turnaround
        for _ in range(8):
            y = dw.apply(dvars, y)
        return y

    measure(report, "dwconv_stage3_x8", dw_fwd,
            lambda: dw_fwd(dvars, y3), fetch_scalar, dvars, y3, iters=20)

    dense = nn.Dense(dim3, dtype=jnp.bfloat16)
    nvars = dense.init(jax.random.PRNGKey(0), y3[:1])

    @jax.jit
    def dense_fwd(nvars, y):
        for _ in range(8):
            y = dense.apply(nvars, y)
        return y

    measure(report, "dense_stage3_x8_ref", dense_fwd,
            lambda: dense_fwd(nvars, y3), fetch_scalar, nvars, y3, iters=20)

    # 9) LayerNorm + residual chain at the stage-1 grid (longest token dim):
    # every MiT block runs two of these; they are pure-bandwidth ops.
    y1 = jnp.zeros((batch_size, h // 4, w // 4, embed_dims[0]), jnp.bfloat16)
    ln = nn.LayerNorm(epsilon=SF.LN_EPS, dtype=jnp.bfloat16)
    lvars = ln.init(jax.random.PRNGKey(0), y1[:1])

    @jax.jit
    def ln_fwd(lvars, y):
        for _ in range(8):
            y = y + ln.apply(lvars, y)
        return y

    measure(report, "ln_residual_stage1_x8", ln_fwd,
            lambda: ln_fwd(lvars, y1), fetch_scalar, lvars, y1, iters=20)

    print("PROFILE " + json.dumps(
        {k: round(v, 4) if isinstance(v, float) else v for k, v in report.items()}
    ), flush=True)


if __name__ == "__main__":
    main()
