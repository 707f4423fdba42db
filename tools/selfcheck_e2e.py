#!/usr/bin/env python
"""Self-contained end-to-end system check: train EVERYTHING from scratch
on a synthetic PSG dataset, run inference through the real pipeline, and
grade the submission (R@K must beat chance).

Phases:
  A. segmenter pretraining (Hungarian + mask/class losses, sigmoid mode);
  B. relation head + LLM training (V4Trainer, LLM unfrozen — no external
     checkpoints anywhere);
  C. tools-path inference on held-out images → SGG grading.

This exercises every layer of the framework with LEARNED weights — the
strongest available correctness signal without external checkpoints.
Exit code 0 iff R@20 > 0 on the held-out images.

Grading is the STRICT protocol (subject/object class equality + mask
IoU > 0.5).  The tiny scratch models make the score sensitive to
training length: measured 83.3 R@20 at seg_steps=900 (default), 66.7 at
600 or 1200 (under/overfit) — treat movements of one image (±16.7) as
trajectory noise, not regressions.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main(root="/tmp/psg_selfcheck", seg_steps=900, rel_steps=400):
    import jax

    from openpsg_tpu.utils.logging import honor_platform_env
    honor_platform_env()

    # correctness check, not a perf tool: run on CPU (the tunneled TPU's
    # per-step host round trips make the Hungarian loop pointlessly slow)
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp
    import optax

    from fixtures import make_fixture
    from openpsg_tpu.data.preprocess import Preprocessor
    from openpsg_tpu.data.psg_dataset import PSGDataset
    from openpsg_tpu.eval.sgg_metrics import sgg_recall
    from openpsg_tpu.models.detectors.psg_v4 import PSGv4, PSGv4Config
    from openpsg_tpu.train.segmenter_trainer import (
        SegTrainBatch,
        SegmenterTrainer,
    )
    from openpsg_tpu.train.trainer import (
        TrainBatch,
        V4Trainer,
        build_llm_labels,
        make_optimizer,
        sample_training_pairs,
    )
    from openpsg_tpu.utils.panoptic import rgb2id
    from openpsg_tpu.data.preprocess import load_image_rgb

    os.makedirs(root, exist_ok=True)
    # 3 train / 3 held-out: two training images are too few for the tiny
    # from-scratch segmenter to generalize reliably
    ann = make_fixture(root, n_images=6, hw=(64, 64))
    pipeline = PSGv4(PSGv4Config.tiny_test(), jax.random.PRNGKey(0))
    H, _ = pipeline._model_hw()
    pre = Preprocessor(scale=(H, H))
    M = pipeline.cfg.head.max_objects_padded

    ds = PSGDataset(ann, img_prefix=root, seg_prefix=root, split="train")
    exs = [ds.load_example(i, pre, M) for i in range(len(ds))]
    images = jnp.asarray(np.stack([e["image"] for e in exs]))
    gt_masks = jnp.asarray(np.stack([e["object_masks"] for e in exs]))
    gt_labels = jnp.asarray(np.stack([e["object_labels"] for e in exs]))
    gt_valid = jnp.asarray(np.stack([e["object_valid"] for e in exs]))
    rel_target = jnp.asarray(np.stack([e["relation_target"] for e in exs]))

    # ---------------- phase A: segmenter ----------------
    print("[A] segmenter pretraining")
    # class embeddings train jointly: in scratch training there is no
    # pretrained language tower, so the frozen byte-tower init gives
    # near-collinear class directions that sigmoid CE cannot separate in
    # a few hundred steps (observed: right masks, wrong classes)
    seg_trainer = SegmenterTrainer(
        pipeline.segmenter,
        num_classes=len(pipeline.class_names),
        cls_mode="sigmoid",
        apply_fn=lambda p, img: pipeline.segmenter.apply(
            p["seg"], img, p["ce"]
        ),
    )
    seg_batch = SegTrainBatch(images, gt_masks, gt_labels, gt_valid)
    opt = optax.adamw(optax.cosine_decay_schedule(2e-3, seg_steps, 0.05))
    seg_params = {
        "seg": pipeline.params["segmenter"],
        "ce": pipeline.params["class_embeds"],
    }
    opt_state = opt.init(seg_params)
    cost_fn, seg_step = seg_trainer.make_step_fns(opt)
    for i in range(seg_steps):
        costs = np.asarray(cost_fn(seg_params, seg_batch))
        match = jnp.asarray(seg_trainer.assign(costs, np.asarray(gt_valid)))
        seg_params, opt_state, d = seg_step(seg_params, opt_state, seg_batch, match)
        if i % 50 == 0 or i == seg_steps - 1:
            print(f"  step {i}: " + " ".join(f"{k}={float(v):.3f}" for k, v in d.items()))
    pipeline.params["segmenter"] = seg_params["seg"]
    pipeline.params["class_embeds"] = seg_params["ce"]

    # ---------------- phase B: relation head + LLM ----------------
    print("[B] relation training (LLM unfrozen)")
    nprng = np.random.default_rng(0)
    S = pipeline.cfg.head.sampled_qformer_batch_size
    T = pipeline.cfg.head.max_llm_forward_num
    qf_i, qf_w, llm_i, llm_v, lab_i, lab_m = [], [], [], [], [], []
    for e in exs:
        v = e["object_valid"]
        pv = np.repeat(v, M) & np.tile(v, M)
        qi, qw, li, lv = sample_training_pairs(
            nprng, e["relation_target"], pv, sample_size=S, llm_pairs=T
        )
        ids, msk = build_llm_labels(
            pipeline.tokenizer, pipeline.relation_names, e["relation_target"], li, 12
        )
        qf_i.append(qi); qf_w.append(qw); llm_i.append(li)
        llm_v.append(lv); lab_i.append(ids); lab_m.append(msk)
    batch = TrainBatch(
        image=images, object_masks=gt_masks, object_labels=gt_labels,
        object_valid=gt_valid, relation_target=rel_target,
        qf_sel_idx=jnp.asarray(np.stack(qf_i)),
        qf_sel_weight=jnp.asarray(np.stack(qf_w)),
        llm_sel_idx=jnp.asarray(np.stack(llm_i)),
        llm_valid=jnp.asarray(np.stack(llm_v)),
        llm_label_ids=jnp.asarray(np.stack(lab_i)),
        llm_label_mask=jnp.asarray(np.stack(lab_m)),
    )
    trainer = V4Trainer(pipeline)
    opt2 = make_optimizer(lambda c: 2e-3, max_norm=1.0)
    trainable = {"head": pipeline.params["head"], "llm": pipeline.params["llm"]}
    frozen = {k: v for k, v in pipeline.params.items() if k not in trainable}
    st = opt2.init(trainable)
    import jax as _j
    step = _j.jit(trainer.make_train_step(opt2), donate_argnums=(0, 1))
    for i in range(rel_steps):
        trainable, st, m = step(trainable, st, frozen, batch)
        if i % 100 == 0 or i == rel_steps - 1:
            print(f"  step {i}: loss={float(m['loss']):.3f} llm={float(m['rel_llm_loss']):.4f}")
    pipeline.params.update(jax.device_get(trainable))
    import pickle
    with open(os.path.join(root, "trained_params.pkl"), "wb") as f:
        pickle.dump(jax.device_get(pipeline.params), f)

    # ---------------- phase C: inference + grading ----------------
    print("[C] held-out inference + grading")
    with open(ann) as f:
        gtj = json.load(f)
    test_ids = set(gtj["test_image_ids"])
    recs = [d for d in gtj["data"] if d["image_id"] in test_ids and d["relations"]]
    images_eval = []
    for d in recs:
        img = load_image_rgb(os.path.join(root, d["file_name"]))
        ex = pre(img)
        res = pipeline.infer(ex["image"].astype(np.float32), ex["img_shape"])
        # predicted masks at model res; GT masks at ori res — same here (64)
        pan = res["pan_results"]
        pred_masks = [pan == oid for oid in res["rel_results"]["object_id_list"]]
        gt_png = load_image_rgb(os.path.join(root, d["pan_seg_file_name"]))
        gt_idmap = rgb2id(gt_png)
        gt_masks_l = [gt_idmap == s["id"] for s in d["segments_info"]]
        images_eval.append({
            "pred_masks": pred_masks,
            "pred_triplets": res["rel_results"]["relation"],
            "gt_masks": gt_masks_l,
            "gt_triplets": [list(t) for t in d["relations"]],
        })
        classes = [oid % 1000 for oid in res["rel_results"]["object_id_list"]]
        iou = np.zeros((len(pred_masks), len(gt_masks_l)))
        for a, pm_ in enumerate(pred_masks):
            for b, gm_ in enumerate(gt_masks_l):
                inter = np.logical_and(pm_, gm_).sum()
                union = np.logical_or(pm_, gm_).sum()
                iou[a, b] = inter / union if union else 0
        print(f"  {d['file_name']}: {len(pred_masks)} objects cls={classes}, "
              f"{len(res['rel_results']['relation'])} triplets "
              f"{res['rel_results']['relation'][:4]}")
        print(f"    iou(pred x gt)=\n{np.round(iou, 2)}")
    scores = sgg_recall(images_eval, ks=(20,))
    print(f"  R@20={scores['R@20']:.1f} mR@20={scores['mR@20']:.1f}")
    ok = scores["R@20"] > 0
    print("SELFCHECK", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
