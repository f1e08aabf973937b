"""Pseudo-label generation entry point (reference code/generate_pseudo_labels.py).

    python -m hiast_tpu.cli.generate_pseudo_labels --config_file configs/sl_1.yaml \
        --pseudo_resume_from .../pseudo_resume_from.pth \
        --pseudo_save_dir .../sl_1/pseudo_label/gray_label
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from hiast_tpu.cli.common import build_cfg, standard_parser
from hiast_tpu.data.datasets import build_dataset
from hiast_tpu.data.pipeline import BatchIterator, prefetched
from hiast_tpu.models.segmentors import build_segmentor
from hiast_tpu.registry import PSEUDO_POLICY
from hiast_tpu.selftrain.steps import normalize_image
from hiast_tpu.utils.checkpoint import load_weights


def make_forward(cfg, segmentor, variables):
    """uint8 [B,H,W,3] -> {'full': full-res fp32 logits, 'low': OS8 logits}.

    The 'low' grid feeds threshold statistics (see pseudo/generator.py);
    'full' feeds the per-pixel selection.  With ``pseudo_policy.ms_sizes`` /
    ``is_flip``, probabilities are softmax-fused over scales and mirrored
    views (the validator's fusion, applied to generation — no reference
    analog) and returned as log-probabilities, which the downstream
    softmax-max selection consumes unchanged.
    """
    from hiast_tpu.ops.resize import bilinear_resize
    from hiast_tpu.parallel.mesh import make_mesh, shard_state, spatial_sharding

    mesh = make_mesh(cfg, batch_size=cfg.pseudo_policy.batch_size)
    # batch over 'data'; with runtime.mesh.space > 1 image rows are sharded
    # over 'space' as well (generation at 768x1536+ beyond one chip's HBM);
    # with runtime.mesh.model > 1 the weights are channel-sharded (tensor
    # parallelism) so generation runs on the same mesh configs as training
    sharding = spatial_sharding(mesh)
    variables = shard_state(mesh, variables)

    ms_sizes = [tuple(s) for s in (cfg.pseudo_policy.ms_sizes or [])]
    is_flip = bool(cfg.pseudo_policy.is_flip)

    def _apply_probs(x):
        out = segmentor.module.apply(variables, x.astype(segmentor.dtype), train=False)
        logits = bilinear_resize(out["logits"].astype(jnp.float32), x.shape[1], x.shape[2])
        return jax.nn.softmax(logits, axis=-1)

    if ms_sizes or is_flip:

        @jax.jit
        def _forward(images):
            img = normalize_image(images)
            h, w = images.shape[1], images.shape[2]
            sizes = ms_sizes or [(h, w)]
            fused = None
            for rh, rw in sizes:
                scaled = img if (rh, rw) == (h, w) else bilinear_resize(img, rh, rw)
                probs = _apply_probs(scaled)
                if is_flip:
                    probs = probs + _apply_probs(scaled[:, :, ::-1])[:, :, ::-1]
                if (rh, rw) != (h, w):
                    probs = bilinear_resize(probs, h, w)
                fused = probs if fused is None else fused + probs
            # each softmax sums to 1, so dividing by the view count
            # renormalizes exactly; log puts it back on the logits interface
            fused = fused / (len(sizes) * (2 if is_flip else 1))
            logp = jnp.log(fused + 1e-12)
            return {"full": logp, "low": logp[:, ::8, ::8]}

    else:

        @jax.jit
        def _forward(images):
            img = normalize_image(images)
            out = segmentor.module.apply(variables, img.astype(segmentor.dtype), train=False)
            low = out["logits"].astype(jnp.float32)
            full = bilinear_resize(low, images.shape[1], images.shape[2])
            return {"full": full, "low": low}

    def forward(images):
        images = jnp.asarray(images)
        # shard evenly-divisible batches over the data mesh axis; the IAS
        # histogram/stats reductions are global under jit (see
        # tests/test_multichip.py), so the carried state stays replicated
        if images.shape[0] % mesh.shape["data"] == 0:
            images = jax.device_put(images, sharding)
        return _forward(images)

    return forward


def main(argv=None):
    args = standard_parser("hiast_tpu pseudo-label generator").parse_args(argv)
    cfg = build_cfg(args)

    segmentor = build_segmentor(cfg, dtype=jnp.bfloat16)
    variables = segmentor.init_variables(jax.random.PRNGKey(0))
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    if cfg.pseudo_policy.resume_from:
        variables = load_weights(cfg.pseudo_policy.resume_from, variables)
    else:
        import warnings

        warnings.warn("no --pseudo_resume_from given: generating from RANDOM weights")

    h, w = cfg.pseudo_policy.resize_size
    dataset = build_dataset(cfg, "target", aug_type=[f"PRS-{h}-{w}"])

    def data_iter_factory():
        # shuffle=True matches the reference IAS pass (online thresholds see
        # a random batch order, pseudo_label_generator.py:36)
        return prefetched(
            iter(
                BatchIterator(
                    dataset,
                    cfg.pseudo_policy.batch_size,
                    shuffle=True,
                    seed=cfg.train.random_seed,
                    drop_last=False,
                )
            ),
            depth=2,
        )

    generator = PSEUDO_POLICY[cfg.pseudo_policy.type](
        cfg, make_forward(cfg, segmentor, variables), data_iter_factory,
        expected_count=len(dataset),
    )
    generator.run()


if __name__ == "__main__":
    main()
