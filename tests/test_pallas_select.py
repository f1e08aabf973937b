"""Pallas fused-selection kernel vs the pure-jnp reference (interpret mode)."""
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
