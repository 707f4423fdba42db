"""Import a reference relation checkpoint (PartCheckpointHook .pth).

The reference trains with ``PartCheckpointHook``, which saves the model
state_dict minus the ``freeze_layers`` prefixes
(kings_sgg/utils/part_checkpoint_hook.py:96-115) — i.e. ``relation_head.*``
plus ``object_cls_embed.weight`` for the Mask2Former family
(mask2former_relation.py:48-50), and the relation head minus
``language_model`` for v4 (baseline_v4_ov.py:65).  This tool converts such
a checkpoint into an orbax part-checkpoint that ``tools/infer.py
--checkpoint`` (and tools/serve.py) consume directly:

    python tools/convert_relation.py epoch_12.pth \
        --config configs/psg/baseline_r50.py --out work_dirs/imported/ckpts

The head version is dispatched from the config's ``relation_head.type``
exactly like the reference registry.  For head v3 the checkpoint also
carries the TRAINED Meta-layout LLaMA trunk (``relation_head.llama_model.*``
— v3 configs freeze only backbone+panoptic_head, baseline_v3_r50.py:160);
it converts through ``meta_llama_to_hf_state`` (interleaved→rotate-half
RoPE permutation, golden-tested against the reference module) into the
head's ``llama`` scope.

``--verify`` eval-shape-initializes the corresponding head module and
asserts the converted tree matches path-for-path (layout-drift guard, no
device memory needed).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _strip(state, prefix):
    return {k[len(prefix):]: v for k, v in state.items()
            if k.startswith(prefix)}


def convert_checkpoint(state, cfg):
    """state: flat numpy state_dict (``relation_head.*`` keys + extras).
    cfg: loaded Config.  → (trainable_params dict, head_version str)."""
    import jax.numpy as jnp

    from openpsg_tpu.models.relation.weight_convert import (
        convert_relation_head_v1,
        convert_relation_head_v2,
        convert_relation_head_v3,
        convert_relation_head_v4,
    )

    model_cfg = cfg["model"] if "model" in cfg else cfg
    head_dict = dict(model_cfg.get("relation_head", {}))
    head_type = head_dict.get("type", "RelationTransformerHead")
    head_state = _strip(state, "relation_head.")

    if head_type == "RelationTransformerHeadV4":
        from openpsg_tpu.core.builder import _head_cfg_from_dict

        hcfg = _head_cfg_from_dict(head_dict, dict(cfg.get("tpu", {})))
        head = convert_relation_head_v4(head_state, hcfg)
        return {"head": {"params": head}}, "v4", hcfg

    from openpsg_tpu.core.builder import m2f_relation_config

    mcfg = m2f_relation_config(cfg)
    version = mcfg.head_version
    if version == "v1":
        head = convert_relation_head_v1(head_state, mcfg.head_v1)
        hcfg = mcfg.head_v1
    elif version == "v2":
        head = convert_relation_head_v2(head_state, mcfg.head_v2)
        hcfg = mcfg.head_v2
    else:
        hcfg = mcfg.head_v3
        head = convert_relation_head_v3(head_state, hcfg)
        llama_state = _strip(head_state, "llama_model.")
        if llama_state:
            # v3 checkpoints carry the (trained) Meta-format trunk
            from openpsg_tpu.models.llm.weight_convert import (
                convert_llama,
                meta_llama_to_hf_state,
            )

            hf_state = meta_llama_to_hf_state(
                llama_state, n_heads=hcfg.llm.n_heads,
                n_kv_heads=hcfg.llm.n_kv_heads,
            )
            llm = convert_llama(hf_state, hcfg.llm, dtype=jnp.float32)
            llm = llm["params"]
            # return_hidden trunks never instantiate lm_head — drop it so
            # the tree matches the head init exactly (typed orbax restore)
            llm["core"].pop("lm_head", None)
            head["llama"] = llm if hcfg.ov_relation else llm["core"]
        else:
            print("[convert_relation] no relation_head.llama_model.* keys "
                  "— load the trunk from official llama weights instead")

    out = {"head": {"params": head}}
    if "object_cls_embed.weight" in state:
        out["object_cls_embed"] = np.asarray(state["object_cls_embed.weight"])
    return out, version, hcfg


def _eval_shape_head(version, hcfg, trainable):
    """Eval-shape-init the head module with zero inputs and assert the
    converted head tree matches it path-for-path."""
    import jax
    import jax.numpy as jnp

    from openpsg_tpu.models.llm.weight_convert import verify_structure

    M = 4
    if version == "v1":
        from openpsg_tpu.models.relation.head_v1 import RelationHeadV1

        head = RelationHeadV1(hcfg)
        init = jax.eval_shape(
            lambda k: head.init(
                k,
                jnp.zeros((1, M, hcfg.input_feature_size)),
                jnp.zeros((1, M), bool),
            ),
            jax.random.PRNGKey(0),
        )
    elif version == "v2":
        from openpsg_tpu.models.relation.head_v2 import RelationHeadV2

        head = RelationHeadV2(hcfg)
        R = hcfg.num_relation_classes
        T = hcfg.text_embedding_size
        kw = {}
        if hcfg.use_moe_gate or (
            {"pair_text2vision", "pair_vision2text"} & set(hcfg.experts)
        ):
            kw["pair_text_embeds"] = jnp.zeros((1, M, M, T))
        if "triplet_text_w_vision" in hcfg.experts or hcfg.use_moe_gate:
            kw["triplet_text_embeds"] = jnp.zeros((1, M, M, R, T))
        init = jax.eval_shape(
            lambda k: head.init(
                k,
                jnp.zeros((1, M, hcfg.feature_size)),
                jnp.zeros((1, M), bool),
                **kw,
            ),
            jax.random.PRNGKey(0),
        )
    elif version == "v3":
        from openpsg_tpu.models.relation.head_v3 import RelationHeadV3

        head = RelationHeadV3(hcfg)
        R = hcfg.num_relation_classes
        L = 2 * R
        kw = {}
        if hcfg.ov_relation:
            kw = dict(
                relation_token_ids=jnp.zeros((L,), jnp.int32),
                relation_spans=jnp.zeros((R, L)),
            )
        init = jax.eval_shape(
            lambda k: head.init(
                k,
                jnp.zeros((1, M, hcfg.input_feature_size)),
                jnp.zeros((1, M), bool),
                **kw,
            ),
            jax.random.PRNGKey(0),
        )
    else:  # v4
        from openpsg_tpu.models.relation.head_v4 import RelationHeadV4

        head = RelationHeadV4(hcfg)
        H4 = 4 * hcfg.patch_size
        NP = M * M
        T = 8
        init = jax.eval_shape(
            lambda k: head.init(
                k,
                jnp.zeros((H4, H4, hcfg.object_feature_size)),
                jnp.zeros((M, H4, H4), bool),
                jnp.zeros((M,), bool),
                jnp.zeros((NP, T), jnp.int32),
                jnp.zeros((NP, T), bool),
            ),
            jax.random.PRNGKey(0),
        )
    verify_structure(trainable["head"], init)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("checkpoint", help="reference PartCheckpointHook .pth")
    ap.add_argument("--config", required=True,
                    help="reference-style config file")
    ap.add_argument("--out", required=True,
                    help="orbax checkpoint directory to write")
    ap.add_argument("--epoch", type=int, default=None,
                    help="epoch recorded in meta (default: from .pth meta)")
    ap.add_argument("--verify", action="store_true",
                    help="eval-shape-check the converted tree against the "
                         "head module init")
    args = ap.parse_args(argv)

    import torch

    from openpsg_tpu.core.config import Config
    from openpsg_tpu.models.llm.weight_convert import load_state_dict
    from openpsg_tpu.train.checkpoint import PartCheckpointer

    cfg = Config.fromfile(args.config, import_custom_modules=False)
    raw = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    meta = raw.get("meta", {}) if isinstance(raw, dict) else {}
    state = load_state_dict(args.checkpoint)

    trainable, version, hcfg = convert_checkpoint(state, cfg)
    n_leaves = sum(
        1 for _ in __import__("jax").tree_util.tree_leaves(trainable)
    )
    consumed_prefixes = ("relation_head.", "object_cls_embed.")
    leftovers = sorted(
        {k.split(".")[0] for k in state
         if not k.startswith(consumed_prefixes)}
    )
    print(f"[convert_relation] head {version}: {n_leaves} converted leaves; "
          f"unconsumed top-level prefixes: {leftovers or 'none'}")

    if args.verify:
        _eval_shape_head(version, hcfg, trainable)
        print("[convert_relation] verify: converted tree matches head init")

    epoch = args.epoch
    if epoch is None:
        epoch = meta.get("epoch") if isinstance(meta, dict) else None
    ckpt = PartCheckpointer(args.out)
    # orbax rejects empty subtrees; a scalar placeholder stands in for the
    # optimizer state an imported checkpoint doesn't have
    ckpt.save(0, trainable, opt_state={"imported": np.zeros(1, np.float32)},
              meta={"epoch": epoch or 1,
                    "imported_from": args.checkpoint})
    ckpt.close()
    print(f"[convert_relation] wrote orbax part-checkpoint to {args.out} "
          f"(epoch {epoch or 1})")


if __name__ == "__main__":
    main()
