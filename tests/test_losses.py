"""Loss functions vs hand-computed references."""

import jax
import jax.numpy as jnp
import numpy as np

from openpsg_tpu.train import losses as L


class TestMCCE:
    def test_matches_manual_logsumexp(self):
        """MCCE = logsumexp(neg ∪ {0}) + logsumexp(-pos ∪ {0})."""
        y_true = jnp.asarray([[1.0, 0.0, 0.0, 1.0]])
        y_pred = jnp.asarray([[2.0, -1.0, 0.5, -0.3]])
        got = float(L.multilabel_categorical_crossentropy(y_true, y_pred)[0])
        neg = np.logaddexp.reduce([-1.0, 0.5, 0.0])      # negatives + 0
        pos = np.logaddexp.reduce([-2.0, 0.3, 0.0])      # -positives + 0
        np.testing.assert_allclose(got, neg + pos, rtol=1e-5)

    def test_perfect_prediction_low_loss(self):
        y_true = jnp.asarray([[1.0, 0.0]])
        good = jnp.asarray([[20.0, -20.0]])
        bad = jnp.asarray([[-20.0, 20.0]])
        lg = float(L.multilabel_categorical_crossentropy(y_true, good)[0])
        lb = float(L.multilabel_categorical_crossentropy(y_true, bad)[0])
        assert lg < 1e-3 < 30 < lb

    def test_reweighted_with_sample_weight(self):
        y_true = jnp.zeros((4, 6)).at[0, 1].set(1.0)
        y_pred = jnp.zeros((4, 6))
        w = jnp.asarray([1.0, 1.0, 0.0, 0.0])
        out = float(L.reweighted_mcce(y_true, y_pred, sample_weight=w))
        assert np.isfinite(out) and out > 0


class TestBinary:
    def test_matches_manual_bce(self):
        logits = jnp.asarray([0.5, -1.0])
        labels = jnp.asarray([1.0, 0.0])
        got = float(L.binary_existence_loss(logits, labels))
        want = np.mean([
            np.log1p(np.exp(-0.5)),
            np.log1p(np.exp(-1.0)),
        ])
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_weight_excludes(self):
        logits = jnp.asarray([100.0, 0.0])
        labels = jnp.asarray([0.0, 0.0])       # first is a terrible pred
        full = float(L.binary_existence_loss(logits, labels))
        masked = float(L.binary_existence_loss(
            logits, labels, weight=jnp.asarray([0.0, 1.0])
        ))
        assert masked < full


class TestRecallAtK:
    def test_perfect_and_zero(self):
        R, N = 4, 5
        target = jnp.zeros((1, R, N, N)).at[0, 2, 1, 3].set(1.0)
        pred_good = jnp.zeros((1, R, N, N)).at[0, 2, 1, 3].set(9.0)
        pred_bad = jnp.zeros((1, R, N, N)).at[0, 0, 0, 0].set(9.0)
        assert float(L.recall_at_k(pred_good, target, k=1)) == 100.0
        assert float(L.recall_at_k(pred_bad, target, k=1)) == 0.0

    def test_partial(self):
        R, N = 4, 5
        target = jnp.zeros((1, R, N, N)).at[0, 2, 1, 3].set(1.0).at[0, 1, 0, 2].set(1.0)
        pred = jnp.zeros((1, R, N, N)).at[0, 2, 1, 3].set(9.0).at[0, 3, 4, 4].set(8.0)
        val = float(L.recall_at_k(pred, target, k=2))
        np.testing.assert_allclose(val, 50.0, atol=1e-4)
