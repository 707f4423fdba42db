"""Segmenter training: matching correctness + loss descent (overfit)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from openpsg_tpu.models.segmenter.mask2former import (
    Mask2FormerConfig,
    Mask2FormerSegmenter,
)
from openpsg_tpu.train.segmenter_trainer import (
    SegmenterTrainer,
    SegTrainBatch,
    dice_loss,
)


class TestMatching:
    def test_hungarian_prefers_low_cost(self):
        costs = np.asarray([[[1.0, 9.0], [9.0, 1.0], [5.0, 5.0]]])  # [1, 3, 2]
        valid = np.asarray([[True, True]])
        m = SegmenterTrainer.assign(costs, valid)
        assert m[0, 0] == 0 and m[0, 1] == 1 and m[0, 2] == -1

    def test_no_gt(self):
        costs = np.ones((1, 3, 2))
        valid = np.asarray([[False, False]])
        m = SegmenterTrainer.assign(costs, valid)
        assert (m == -1).all()


class TestDice:
    def test_perfect_and_disjoint(self):
        t = jnp.asarray([1.0, 1.0, 0.0, 0.0])
        good = jnp.asarray([20.0, 20.0, -20.0, -20.0])
        bad = jnp.asarray([-20.0, -20.0, 20.0, 20.0])
        assert float(dice_loss(good, t)) < 0.01
        # disjoint with eps=1 smoothing: 1 - 1/(4+1) = 0.8
        assert float(dice_loss(bad, t)) > 0.7


class TestSegTraining:
    def test_overfit_one_image(self):
        cfg = Mask2FormerConfig.tiny_test()
        seg = Mask2FormerSegmenter(cfg)
        H = 64
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (1, H, H, 3)).astype(np.float32)
        gt_masks = np.zeros((1, 4, 16, 16), bool)
        gt_masks[0, 0, :8, :8] = True
        gt_masks[0, 1, 8:, 8:] = True
        gt_labels = np.asarray([[1, 3, 0, 0]], np.int32)
        gt_valid = np.asarray([[True, True, False, False]])
        batch = SegTrainBatch(
            image=jnp.asarray(img),
            gt_masks=jnp.asarray(gt_masks),
            gt_labels=jnp.asarray(gt_labels),
            gt_valid=jnp.asarray(gt_valid),
        )

        params = jax.jit(seg.init)(
            jax.random.PRNGKey(0), jnp.zeros((H, H, 3))
        )
        trainer = SegmenterTrainer(seg, num_classes=cfg.num_classes)
        opt = optax.adamw(1e-3)
        opt_state = opt.init(params)
        cost_fn, step = trainer.make_step_fns(opt)

        losses = []
        for i in range(12):
            costs = np.asarray(cost_fn(params, batch))
            match = jnp.asarray(trainer.assign(costs, np.asarray(gt_valid)))
            params, opt_state, d = step(params, opt_state, batch, match)
            losses.append(float(d["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.8, losses
