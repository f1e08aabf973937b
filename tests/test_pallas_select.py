"""Pallas fused-selection kernel vs the pure-jnp reference (interpret mode)."""
import functools

import jax.numpy as jnp
import numpy as np
import pytest

from hiast_tpu.ops.pallas.select_kernel import fused_select
from hiast_tpu.pseudo import policies as P

RNG = np.random.default_rng(9)


@pytest.mark.parametrize("shape", [(2, 16, 24, 19), (1, 100, 19)])
def test_matches_jnp_reference(shape):
    logits = RNG.normal(size=shape).astype(np.float32) * 3
    thr = RNG.uniform(0.3, 0.95, size=19).astype(np.float32)

    plbl, maxprob, counts, sums = fused_select(
        jnp.asarray(logits), jnp.asarray(thr), interpret=True
    )

    want_mp, want_pred = P.confidences(jnp.asarray(logits))
    want_plbl = P.select_pseudo_labels(want_mp, want_pred, jnp.asarray(thr))
    want_sums, want_counts = P.class_prob_sums(want_plbl, want_mp, 19)

    np.testing.assert_array_equal(np.asarray(plbl), np.asarray(want_plbl))
    np.testing.assert_allclose(np.asarray(maxprob), np.asarray(want_mp), atol=1e-6)
    np.testing.assert_allclose(np.asarray(counts), np.asarray(want_counts), atol=0)
    np.testing.assert_allclose(np.asarray(sums), np.asarray(want_sums), rtol=1e-5)


def test_padding_rows_excluded():
    # n = 100 is far below the tile size; padded rows must not leak into stats
    logits = RNG.normal(size=(1, 100, 19)).astype(np.float32)
    thr = np.zeros(19, np.float32)  # select everything valid
    plbl, _, counts, _ = fused_select(jnp.asarray(logits), jnp.asarray(thr), interpret=True)
    assert float(jnp.sum(counts)) == 100.0  # padded rows excluded
    assert np.all(np.asarray(plbl) != 255)


def test_batched_per_sample_counts():
    from hiast_tpu.ops.pallas.select_kernel import TILE, fused_select_batched

    b, h, w = 2, 32, 64  # h*w = TILE
    logits = RNG.normal(size=(b, h, w, 19)).astype(np.float32) * 3
    thr = RNG.uniform(0.2, 0.8, size=19).astype(np.float32)
    plbl, mp, per_sample, sums, counts = fused_select_batched(
        jnp.asarray(logits), jnp.asarray(thr), interpret=True
    )
    want_mp, want_pred = P.confidences(jnp.asarray(logits))
    want_plbl = P.select_pseudo_labels(want_mp, want_pred, jnp.asarray(thr))
    want_per_sample = P.per_sample_class_counts(want_plbl, 19)
    np.testing.assert_array_equal(np.asarray(per_sample), np.asarray(want_per_sample))


class TestFusedHist:
    @pytest.mark.parametrize("num_bins", [2048, 256, 128])
    def test_matches_jnp_histogram(self, num_bins):
        from hiast_tpu.ops.pallas.select_kernel import fused_hist

        logits = RNG.normal(size=(2, 24, 40, 19)).astype(np.float32) * 3
        maxprob, pred, hist = fused_hist(
            jnp.asarray(logits), num_bins=num_bins, interpret=True
        )
        want_mp, want_pred = P.confidences(jnp.asarray(logits))
        want_hist = P.class_prob_histogram(want_mp, want_pred, 19, num_bins)
        np.testing.assert_allclose(np.asarray(maxprob), np.asarray(want_mp), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(pred), np.asarray(want_pred))
        np.testing.assert_array_equal(np.asarray(hist), np.asarray(want_hist))

    def test_hist_only_matches_full(self):
        """with_pixels=False (the production stats-only call) returns the
        identical histogram without the per-pixel outputs."""
        from hiast_tpu.ops.pallas.select_kernel import fused_hist

        logits = RNG.normal(size=(2, 24, 40, 19)).astype(np.float32) * 3
        _, _, want = fused_hist(jnp.asarray(logits), num_bins=256, interpret=True)
        mp, pred, hist = fused_hist(
            jnp.asarray(logits), num_bins=256, interpret=True, with_pixels=False
        )
        assert mp is None and pred is None
        np.testing.assert_array_equal(np.asarray(hist), np.asarray(want))

    def test_nvalid_suffix_masked(self):
        from hiast_tpu.ops.pallas.select_kernel import fused_hist

        logits = RNG.normal(size=(4, 10, 12, 19)).astype(np.float32) * 3
        # mask the last sample (suffix of the flattened pixel order)
        n_pix = 3 * 10 * 12
        _, _, hist = fused_hist(
            jnp.asarray(logits), nvalid=jnp.asarray(n_pix), num_bins=256, interpret=True
        )
        mp, pred = P.confidences(jnp.asarray(logits[:3]))
        want = P.class_prob_histogram(mp, pred, 19, 256)
        np.testing.assert_array_equal(np.asarray(hist), np.asarray(want))
        assert float(hist.sum()) == n_pix

    def test_ias_step_pallas_matches_xla(self, tmp_path):
        """The full _ias_step with use_pallas_select (interpret) equals the
        XLA path: same thresholds, labels, counts, cmp."""
        from hiast_tpu.config import default_config
        from hiast_tpu.pseudo.generator import IASGenerator

        logits_full = jnp.asarray(RNG.normal(size=(3, 32, 48, 19)).astype(np.float32) * 4)
        logits_stats = logits_full[:, ::8, ::8]
        valid = jnp.asarray([1.0, 1.0, 0.0])  # one pad sample
        state = P.IASState(jnp.full((19,), 0.9), jnp.zeros((19,)))

        def build(use_pallas):
            cfg = default_config()
            cfg.pseudo_policy.type = "IAS"
            cfg.pseudo_policy.save_dir = str(tmp_path / f"p{use_pallas}" / "g")
            cfg.pseudo_policy.use_pallas_select = use_pallas
            cfg.pseudo_policy.stats_source = "low"
            return IASGenerator(cfg, lambda x: x, lambda: iter(()))

        gen_x = build(False)
        plbl_x, counts_x, st_x = gen_x._ias_step(logits_full, logits_stats, state, valid)

        gen_p = build(True)
        # CPU backend auto-selects interpret mode inside the kernels
        plbl_p, counts_p, st_p = gen_p._ias_step(
            logits_full, logits_stats, state, valid
        )
        np.testing.assert_allclose(
            np.asarray(st_p.thresholds), np.asarray(st_x.thresholds), atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(plbl_p), np.asarray(plbl_x))
        np.testing.assert_array_equal(np.asarray(counts_p), np.asarray(counts_x))
        np.testing.assert_allclose(
            np.asarray(st_p.class_mean_probs), np.asarray(st_x.class_mean_probs), atol=1e-5
        )
