"""Pipeline-parallel LLaMA (parallel/pipeline.py) vs the unsharded module.

The reference's distributed story is DDP-only (tools/train.py:84-88); pp
is a new v5e requirement (SURVEY.md §5 "distributed": bf16 7B > 16 GB
HBM/chip).  These tests pin the GPipe schedule — forward AND backward —
against the plain ``LlamaWithEmbeddings`` forward on the 8-virtual-device
CPU mesh from conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpsg_tpu.models.llm.llama import (
    LlamaConfig,
    LlamaWithEmbeddings,
    quantize_llama,
)
from openpsg_tpu.parallel.pipeline import (
    make_dp_pp_mesh,
    pipelined_llama_logits,
    pp_param_shardings,
)


def _tiny(quant=False, n_layers=4):
    cfg = LlamaConfig(
        vocab_size=64, dim=32, n_layers=n_layers, n_heads=4, n_kv_heads=2,
        ffn_hidden=64, max_seq_len=32, dtype=jnp.float32, quant=quant,
    )
    return cfg, LlamaWithEmbeddings(cfg)


def _inputs(cfg, B=8, L=10):
    emb = jax.random.normal(jax.random.PRNGKey(0), (B, L, cfg.dim))
    # mid-sequence pads on one row: the PSGv4 prompt layout
    # [visual ; left-padded text] must survive the pipeline unchanged
    amask = jnp.ones((B, L), bool).at[2, 3:5].set(False)
    pos = jnp.maximum(jnp.cumsum(amask.astype(jnp.int32), axis=1) - 1, 0)
    return emb, amask, pos


class TestPipelinedForward:
    @pytest.mark.parametrize("pp,dp,n_micro", [(4, 2, 4), (2, 4, 2), (8, 1, 1)])
    def test_matches_unsharded(self, pp, dp, n_micro):
        cfg, model = _tiny(n_layers=8)
        emb, amask, pos = _inputs(cfg)
        params = model.init(
            jax.random.PRNGKey(1), input_embeds=emb, attention_mask=amask,
            positions=pos,
        )
        ref, _ = model.apply(
            params, input_embeds=emb, attention_mask=amask, positions=pos
        )
        mesh = make_dp_pp_mesh(pp=pp, dp=dp)
        params_s = jax.device_put(params, pp_param_shardings(params, mesh))
        out = jax.jit(
            lambda p, e, m, po: pipelined_llama_logits(
                model, p, e, m, po, mesh, n_micro=n_micro
            )
        )(params_s, emb, amask, pos)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-5
        )

    def test_last_logit_only(self):
        cfg, model = _tiny()
        emb, amask, pos = _inputs(cfg)
        params = model.init(
            jax.random.PRNGKey(1), input_embeds=emb, attention_mask=amask,
            positions=pos,
        )
        ref, _ = model.apply(
            params, input_embeds=emb, attention_mask=amask, positions=pos,
            last_logit_only=True,
        )
        mesh = make_dp_pp_mesh(pp=4)
        params_s = jax.device_put(params, pp_param_shardings(params, mesh))
        out = jax.jit(
            lambda p, e, m, po: pipelined_llama_logits(
                model, p, e, m, po, mesh, n_micro=2, last_logit_only=True
            )
        )(params_s, emb, amask, pos)
        assert out.shape == ref.shape == (emb.shape[0], 1, cfg.vocab_size)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-5
        )

    def test_int8_weights(self):
        """The frozen 7B ships weight-only int8 (LlamaConfig.quant); its
        QDense leaves (int8 kernel_q + f32 scale) must shard and scan on
        the pp layer axis like dense kernels."""
        cfg, model = _tiny()
        emb, amask, pos = _inputs(cfg)
        params = model.init(
            jax.random.PRNGKey(1), input_embeds=emb, attention_mask=amask,
            positions=pos,
        )
        qcfg, qmodel = _tiny(quant=True)
        qparams = jax.tree_util.tree_map(
            jnp.asarray, quantize_llama(jax.device_get(params))
        )
        ref, _ = qmodel.apply(
            qparams, input_embeds=emb, attention_mask=amask, positions=pos
        )
        mesh = make_dp_pp_mesh(pp=4, dp=2)
        qparams_s = jax.device_put(qparams, pp_param_shardings(qparams, mesh))
        out = jax.jit(
            lambda p, e, m, po: pipelined_llama_logits(
                qmodel, p, e, m, po, mesh, n_micro=2
            )
        )(qparams_s, emb, amask, pos)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-5
        )


class TestPipelineTensorComposition:
    """pp×tp over one ("dp","pp","tp") mesh: shard_map is manual over
    dp/pp only, tp stays GSPMD-auto — the Megatron feature-axis shardings
    (parallel/sharding.py rules, composed by pp_param_shardings) propagate
    through each stage and XLA inserts the tp psums inside the pipeline
    ticks.  3D parallelism with zero model-code changes."""

    @pytest.mark.parametrize("pp,dp,tp,n_micro", [
        (2, 2, 2, 4),   # full 3D
        (2, 1, 4, 2),   # tp-heavy
        (4, 1, 2, 4),   # pp-heavy
    ])
    def test_matches_unsharded(self, pp, dp, tp, n_micro):
        cfg, model = _tiny(n_layers=8)
        emb, amask, pos = _inputs(cfg)
        params = model.init(
            jax.random.PRNGKey(1), input_embeds=emb, attention_mask=amask,
            positions=pos,
        )
        ref, _ = model.apply(
            params, input_embeds=emb, attention_mask=amask, positions=pos
        )
        mesh = make_dp_pp_mesh(pp=pp, dp=dp, tp=tp)
        shardings = pp_param_shardings(params, mesh)
        # the plan must actually engage BOTH model-parallel axes
        specs = [
            str(s.spec) for s in jax.tree_util.tree_leaves(shardings)
        ]
        assert any("tp" in s and "pp" in s for s in specs), specs[:6]
        params_s = jax.device_put(params, shardings)
        out = jax.jit(
            lambda p, e, m, po: pipelined_llama_logits(
                model, p, e, m, po, mesh, n_micro=n_micro
            )
        )(params_s, emb, amask, pos)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-5
        )

    def test_int8_weights_3d(self):
        """QDense int8 leaves under pp×tp: col-parallel kernel_q AND its
        per-output-channel scale co-shard on tp (sharding.py:41-51) while
        the layer axis shards on pp."""
        cfg, model = _tiny()
        emb, amask, pos = _inputs(cfg)
        params = model.init(
            jax.random.PRNGKey(1), input_embeds=emb, attention_mask=amask,
            positions=pos,
        )
        qcfg, qmodel = _tiny(quant=True)
        qparams = jax.tree_util.tree_map(
            jnp.asarray, quantize_llama(jax.device_get(params))
        )
        ref, _ = qmodel.apply(
            qparams, input_embeds=emb, attention_mask=amask, positions=pos
        )
        mesh = make_dp_pp_mesh(pp=2, dp=2, tp=2)
        shardings = pp_param_shardings(qparams, mesh)
        wq = shardings["params"]["core"]["layers"]["wq"]
        assert "tp" in str(wq["kernel_q"].spec), wq["kernel_q"].spec
        assert "tp" in str(wq["scale"].spec), wq["scale"].spec
        qparams_s = jax.device_put(qparams, shardings)
        out = jax.jit(
            lambda p, e, m, po: pipelined_llama_logits(
                qmodel, p, e, m, po, mesh, n_micro=2
            )
        )(qparams_s, emb, amask, pos)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-5
        )

    def test_grads_match_unsharded_3d(self):
        cfg, model = _tiny()
        emb, amask, pos = _inputs(cfg)
        params = model.init(
            jax.random.PRNGKey(1), input_embeds=emb, attention_mask=amask,
            positions=pos,
        )
        tgt = jax.random.randint(
            jax.random.PRNGKey(2), emb.shape[:2], 0, cfg.vocab_size
        )

        def loss_ref(p):
            lg, _ = model.apply(
                p, input_embeds=emb, attention_mask=amask, positions=pos
            )
            lp = jnp.take_along_axis(
                jax.nn.log_softmax(lg), tgt[..., None], -1
            )
            return -jnp.mean(lp)

        mesh = make_dp_pp_mesh(pp=2, dp=2, tp=2)
        params_s = jax.device_put(params, pp_param_shardings(params, mesh))

        def loss_pp(p):
            lg = pipelined_llama_logits(
                model, p, emb, amask, pos, mesh, n_micro=4, remat=True
            )
            lp = jnp.take_along_axis(
                jax.nn.log_softmax(lg), tgt[..., None], -1
            )
            return -jnp.mean(lp)

        g_ref = jax.grad(loss_ref)(params)["params"]["core"]["layers"]
        g_pp = jax.jit(jax.grad(loss_pp))(params_s)["params"]["core"]["layers"]
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), g_ref, g_pp
        )
        assert max(jax.tree_util.tree_leaves(diffs)) < 3e-5, diffs
        # grads keep BOTH shardings (optimizer state inherits 3D layout)
        specs = [
            str(g.sharding.spec)
            for g in jax.tree_util.tree_leaves(g_pp)
        ]
        assert any("pp" in s and "tp" in s for s in specs), specs[:6]


class TestPipelinedTrainStep:
    """V4Trainer.make_pipelined_train_step == make_train_step: the LLM
    teacher-forcing forward is hoisted out of the per-image vmap into ONE
    GPipe call (tools/train.py wires it from ``tpu.mesh = dict(dp, pp,
    tp)``); losses and updated params must match the plain step."""

    def test_matches_plain_step(self):
        from openpsg_tpu.models.detectors.psg_v4 import PSGv4, PSGv4Config
        from openpsg_tpu.train.trainer import (
            TrainBatch,
            V4Trainer,
            build_llm_labels,
            make_lr_schedule,
            make_optimizer,
            sample_training_pairs,
        )

        p = PSGv4(PSGv4Config.tiny_test(), jax.random.PRNGKey(0))
        M = p.cfg.head.max_objects_padded
        R = p.cfg.head.num_relation_classes
        H = W = 64
        B = 2
        rng = np.random.default_rng(0)

        rows = []
        for _ in range(B):
            valid = np.zeros(M, bool)
            valid[:4] = True
            t = np.zeros((M, M, R), np.float32)
            t[0, 1, 3] = 1
            t[2, 0, 10] = 1
            qi, qw, li, lv = sample_training_pairs(
                rng, t, np.repeat(valid, M) & np.tile(valid, M),
                sample_size=p.cfg.head.sampled_qformer_batch_size,
            )
            ids, msk = build_llm_labels(p.tokenizer, p.relation_names, t, li, 12)
            rows.append(dict(
                image=rng.integers(0, 255, (H, W, 3)).astype(np.float32),
                object_masks=rng.uniform(size=(M, H // 4, W // 4)) > 0.8,
                object_labels=rng.integers(0, 133, M).astype(np.int32),
                object_valid=valid, relation_target=t,
                qf_sel_idx=qi, qf_sel_weight=qw, llm_sel_idx=li,
                llm_valid=lv, llm_label_ids=ids, llm_label_mask=msk,
            ))
        batch = TrainBatch(**{
            k: jnp.asarray(np.stack([r[k] for r in rows]))
            for k in rows[0]
        })

        trainer = V4Trainer(p)
        opt = make_optimizer(make_lr_schedule(steps_per_epoch=10))
        trainable = {"head": p.params["head"]}
        frozen = {k: v for k, v in p.params.items() if k != "head"}
        opt_state = opt.init(trainable)

        ref_tr, _, ref_m = jax.jit(trainer.make_train_step(opt))(
            trainable, opt_state, frozen, batch
        )

        from openpsg_tpu.parallel.pipeline import (
            make_dp_pp_mesh,
            pp_param_shardings,
        )
        from openpsg_tpu.parallel.sharding import batch_sharding, replicated

        mesh = make_dp_pp_mesh(pp=2, dp=2, tp=2)   # full 3D, 8 devices
        frozen_s = {
            k: (
                jax.device_put(v, pp_param_shardings(v, mesh))
                if k == "llm"
                else jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, replicated(mesh)), v
                )
            )
            for k, v in frozen.items()
        }
        trainable_s = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated(mesh)), trainable
        )
        batch_s = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, batch_sharding(mesh)), batch
        )
        pp_tr, _, pp_m = jax.jit(
            trainer.make_pipelined_train_step(opt, mesh)
        )(trainable_s, opt.init(trainable_s), frozen_s, batch_s)

        for k in ref_m:
            np.testing.assert_allclose(
                float(pp_m[k]), float(ref_m[k]), rtol=1e-4, atol=1e-5,
                err_msg=k,
            )
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), ref_tr, pp_tr
        )
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4, diffs


class TestPipelinedBackward:
    def test_grads_match_unsharded(self):
        """jax.grad through the pipeline IS pipelined backprop (ppermute's
        transpose is the reverse shift); per-layer grads must equal the
        unsharded module's — incl. with per-stage remat, the memory shape
        a real 7B run needs."""
        cfg, model = _tiny()
        emb, amask, pos = _inputs(cfg)
        params = model.init(
            jax.random.PRNGKey(1), input_embeds=emb, attention_mask=amask,
            positions=pos,
        )
        tgt = jax.random.randint(
            jax.random.PRNGKey(2), emb.shape[:2], 0, cfg.vocab_size
        )

        def loss_ref(p):
            lg, _ = model.apply(
                p, input_embeds=emb, attention_mask=amask, positions=pos
            )
            lp = jnp.take_along_axis(
                jax.nn.log_softmax(lg), tgt[..., None], -1
            )
            return -jnp.mean(lp)

        mesh = make_dp_pp_mesh(pp=4, dp=2)
        params_s = jax.device_put(params, pp_param_shardings(params, mesh))

        def loss_pp(p):
            lg = pipelined_llama_logits(
                model, p, emb, amask, pos, mesh, n_micro=4, remat=True
            )
            lp = jnp.take_along_axis(
                jax.nn.log_softmax(lg), tgt[..., None], -1
            )
            return -jnp.mean(lp)

        g_ref = jax.grad(loss_ref)(params)["params"]["core"]["layers"]
        g_pp = jax.jit(jax.grad(loss_pp))(params_s)["params"]["core"]
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), g_ref,
            g_pp["layers"],
        )
        assert max(jax.tree_util.tree_leaves(diffs)) < 3e-5, diffs
        # grads keep the pp sharding (optimizer state will inherit it)
        specs = {
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(lambda g: g.sharding.spec, g_pp["layers"])
            )[0]
        }
        assert any("pp" in str(s) for s in specs), specs
