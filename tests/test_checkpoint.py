"""PartCheckpointer: save/restore/rotate semantics (PartCheckpointHook
parity — trainable-only, max_keep rotation, latest pointer)."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from openpsg_tpu.train.checkpoint import PartCheckpointer, split_trainable


class TestPartCheckpointer:
    def test_roundtrip_and_rotation(self, tmp_path):
        ckpt = PartCheckpointer(str(tmp_path / "ck"), max_keep=3)
        params = {"head": {"w": jnp.arange(4.0)}}
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        for step in (1, 2, 3, 4):
            p = {"head": {"w": jnp.arange(4.0) * step}}
            ckpt.save(step, p, opt_state, meta={"epoch": step})
        assert ckpt.latest_step() == 4
        got_p, got_o, meta, step = ckpt.restore(
            like_params=params, like_opt_state=opt_state
        )
        assert step == 4 and meta["epoch"] == 4
        np.testing.assert_allclose(np.asarray(got_p["head"]["w"]), np.arange(4.0) * 4)
        # rotation: step 1 evicted
        with pytest.raises(Exception):
            ckpt.restore(step=1, like_params=params, like_opt_state=opt_state)
        # explicit older step still present
        _, _, meta2, s2 = ckpt.restore(
            step=2, like_params=params, like_opt_state=opt_state
        )
        assert s2 == 2 and meta2["epoch"] == 2
        ckpt.close()

    def test_step_for_epoch(self, tmp_path):
        # tools/train.py keys checkpoints by global_step but the infer CLI
        # addresses them by EPOCH (reference epoch_N.pth surface)
        ckpt = PartCheckpointer(str(tmp_path / "ck"), max_keep=3)
        params = {"head": {"w": jnp.arange(4.0)}}
        opt_state = optax.adam(1e-3).init(params)
        for epoch, step in ((1, 100), (2, 200), (3, 300)):
            ckpt.save(step, params, opt_state, meta={"epoch": epoch})
        assert ckpt.step_for_epoch(2) == 200
        assert ckpt.step_for_epoch(3) == 300
        assert ckpt.step_for_epoch(9) is None
        ckpt.close()

    def test_empty_dir_raises(self, tmp_path):
        ckpt = PartCheckpointer(str(tmp_path / "empty"))
        assert ckpt.latest_step() is None
        with pytest.raises(FileNotFoundError):
            ckpt.restore()
        ckpt.close()


class TestSplitTrainable:
    def test_split(self):
        params = {"head": 1, "llm": 2, "segmenter": 3}
        tr, fr = split_trainable(params, ("llm", "segmenter"))
        assert tr == {"head": 1}
        assert fr == {"llm": 2, "segmenter": 3}
