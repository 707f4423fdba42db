#!/usr/bin/env python
"""Convert a published OpenSeeD checkpoint for the TPU segmenter.

The reference loads ``model_state_dict_swint_51.2ap.pt`` through OpenSeeD's
BaseModel (openseed_relation_v2.py:37-41) and precomputes class text
embeddings (:59-60).  This tool performs both steps offline:

    python tools/convert_openseed.py model_state_dict_swint_51.2ap.pt \
        --out data/openseed_tpu [--merges bpe_simple_vocab_16e6.txt.gz]

emits:
    out/segmenter.msgpack   flax params for OpenSeedSegmenter
    out/lang.npz            CLIP text tower + lang_proj + logit_scale
    out/class_embeds.npy    [133, proj_dim] unit-norm class matrix
                            (requires --merges for the CLIP BPE assets)

Wire into configs via ``model.openseed_pretrained_path`` (the .msgpack) and
``model.precomputed_class_embeds`` (the .npy).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help=".pt state dict (torch format)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--merges", default=None,
                    help="CLIP BPE merges file (txt or .gz) for class embeds")
    ap.add_argument("--queries", type=int, default=300)
    args = ap.parse_args()

    import torch

    from flax import serialization

    from openpsg_tpu.data.vocab import OBJECT_CLASSES, clean_name
    from openpsg_tpu.models.segmenter.openseed import SegmenterConfig
    from openpsg_tpu.models.segmenter.weight_convert import convert_openseed

    state = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model" in state and not any(
        k.startswith(("backbone.", "sem_seg_head.")) for k in state
    ):
        state = state["model"]
    state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
             for k, v in state.items()}

    from openpsg_tpu.models.segmenter.weight_convert import conversion_report

    cfg = SegmenterConfig(num_queries=args.queries)
    params, lang = convert_openseed(state, cfg)
    # per-level sanity stats: a wrong level-order assumption is visible
    # HERE, before anything runs (see VALIDATION.md for the runbook)
    print(conversion_report(params, cfg, state))
    os.makedirs(args.out, exist_ok=True)

    with open(os.path.join(args.out, "segmenter.msgpack"), "wb") as f:
        f.write(serialization.to_bytes({"params": params}))
    np.savez(
        os.path.join(args.out, "lang.npz"),
        lang_proj=lang["lang_proj"],
        logit_scale=lang["logit_scale"],
        **{
            "tower." + "/".join(map(str, path)): leaf
            for path, leaf in _flatten(lang["tower"])
        },
    )
    print(f"segmenter + lang converted → {args.out}")

    if args.merges:
        from openpsg_tpu.models.commons.clip_bpe import CLIPBPETokenizer
        from openpsg_tpu.models.segmenter.language import (
            clip_class_embeddings,
            clip_text_tower_config,
        )

        tok = CLIPBPETokenizer.from_files(args.merges)
        D = lang["tower"]["word_embed"]["embedding"].shape[1]
        L = lang["tower"]["layers"]["ffn_up"]["kernel"].shape[0]
        tcfg = clip_text_tower_config(width=D, layers=L,
                                      vocab=lang["tower"]["word_embed"]["embedding"].shape[0])
        names = [clean_name(n) for n in OBJECT_CLASSES]
        emb = clip_class_embeddings(
            tcfg, lang["tower"], lang["lang_proj"], tok, names
        )
        np.save(os.path.join(args.out, "class_embeds.npy"), emb)
        print(f"class_embeds.npy [{emb.shape[0]}, {emb.shape[1]}] written")


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


if __name__ == "__main__":
    main()
