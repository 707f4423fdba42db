#!/usr/bin/env python
"""Training-step throughput bench at real widths (one chip).

The reference trains 12 epochs × ~46k PSG images on 8×A100 with
batch 1/GPU (README.md:14-22).  This measures OUR per-chip train-step
time for the flagship v4 recipe — frozen segmenter + frozen LLM forward,
Q-Former/projection/queries/patch-embed backward (the reference's
freeze_layers), 32 sampled Q-Former pairs @3:1, ≤4 teacher-forced LLM
pairs — at the real 1344px / 32-layer-int8-7B geometry.

Timing uses the same dependency-chained ``lax.scan`` slope method as
bench.py (the axon tunnel's block_until_ready does not block).

Env knobs: BENCH_IMAGE (default 1344), BENCH_LLM_LAYERS (32),
BENCH_TRAIN_LLM (0 = reference recipe, freeze the LLM; 1 = scratch
recipe, train it), BENCH_ITERS (4).

Prints one JSON line {"metric", "value", "unit"}.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import openpsg_tpu  # noqa: F401  (compile cache)
    from openpsg_tpu.models.detectors.psg_v4 import PSGv4, PSGv4Config
    from openpsg_tpu.models.llm.llama import LlamaConfig
    from openpsg_tpu.models.relation.head_v4 import HeadV4Config
    from openpsg_tpu.models.relation.qformer import QFormerConfig
    from openpsg_tpu.models.segmenter.openseed import SegmenterConfig
    from openpsg_tpu.train.trainer import (
        TrainBatch,
        V4Trainer,
        build_llm_labels,
        make_optimizer,
        sample_training_pairs,
    )

    spec = os.environ.get("BENCH_IMAGE", "1344")
    if "x" in spec:
        size, size_w = (int(t) for t in spec.split("x"))
    else:
        size = size_w = int(spec)
    llm_layers = int(os.environ.get("BENCH_LLM_LAYERS", 32))
    train_llm = bool(int(os.environ.get("BENCH_TRAIN_LLM", 0)))
    iters = int(os.environ.get("BENCH_ITERS", 4))

    cfg = PSGv4Config(
        segmenter=SegmenterConfig(dtype=jnp.bfloat16),
        head=HeadV4Config(
            qformer=QFormerConfig(dtype=jnp.bfloat16), dtype=jnp.bfloat16
        ),
        llm=LlamaConfig(
            n_layers=llm_layers, dim=4096, n_heads=32, n_kv_heads=32,
            ffn_hidden=11008, dtype=jnp.bfloat16,
            # a TRAINABLE llm must be bf16 — int8 kernel_q leaves are not
            # differentiable (and AdamW moments on int8 are meaningless);
            # the frozen reference recipe keeps the int8 deployment config
            quant=not train_llm,
        ),
        input_hw=(size, size_w),
    )
    pipeline = PSGv4(cfg, jax.random.PRNGKey(0))
    M = cfg.head.max_objects_padded
    S = cfg.head.sampled_qformer_batch_size
    T = cfg.head.max_llm_forward_num
    R = cfg.head.num_relation_classes
    H4, W4 = size // 4, size_w // 4

    # synthetic GT: 8 rectangle objects + a handful of relations
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1, size, size_w, 3)).astype(np.float32)
    masks = np.zeros((1, M, H4, W4), bool)
    for i in range(8):
        y, x = (i // 4) * (H4 // 2), (i % 4) * (W4 // 4)
        masks[0, i, y : y + H4 // 2, x : x + W4 // 4] = True
    labels = np.zeros((1, M), np.int32)
    labels[0, :8] = rng.integers(0, 133, 8)
    valid = np.zeros((1, M), bool)
    valid[0, :8] = True
    target = np.zeros((1, M, M, R), np.float32)
    for s, o, r in [(0, 1, 4), (2, 3, 23), (4, 5, 7), (6, 7, 0)]:
        target[0, s, o, r] = 1.0

    pv = np.repeat(valid[0], M) & np.tile(valid[0], M)
    qi, qw, li, lv = sample_training_pairs(
        rng, target[0], pv, sample_size=S, llm_pairs=T
    )
    ids, msk = build_llm_labels(
        pipeline.tokenizer, pipeline.relation_names, target[0], li, 12
    )
    batch = TrainBatch(
        image=jnp.asarray(img),
        object_masks=jnp.asarray(masks),
        object_labels=jnp.asarray(labels),
        object_valid=jnp.asarray(valid),
        relation_target=jnp.asarray(target),
        qf_sel_idx=jnp.asarray(qi[None]),
        qf_sel_weight=jnp.asarray(qw[None]),
        llm_sel_idx=jnp.asarray(li[None]),
        llm_valid=jnp.asarray(lv[None]),
        llm_label_ids=jnp.asarray(ids[None]),
        llm_label_mask=jnp.asarray(msk[None]),
    )

    trainer = V4Trainer(pipeline)
    opt = make_optimizer(lambda c: 1e-4, max_norm=0.01)
    keys = {"head"} | ({"llm"} if train_llm else set())
    trainable = {k: pipeline.params[k] for k in keys}
    frozen = {k: v for k, v in pipeline.params.items() if k not in keys}
    opt_state = opt.init(trainable)
    step_fn = trainer.make_train_step(opt)

    def make_run(n):
        @jax.jit
        def run(trainable, opt_state, frozen, batch):
            def body(carry, _):
                tr, st = carry
                tr, st, m = step_fn(tr, st, frozen, batch)
                return (tr, st), m["loss"]
            (tr, st), losses = jax.lax.scan(
                body, (trainable, opt_state), None, length=n
            )
            return jnp.sum(losses)
        return run

    run_n, run_3n = make_run(iters), make_run(3 * iters)
    t0 = time.time()
    chk = float(run_n(trainable, opt_state, frozen, batch))
    float(run_3n(trainable, opt_state, frozen, batch))
    compile_s = time.time() - t0

    def sample(fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            float(fn(trainable, opt_state, frozen, batch))
            best = min(best, time.time() - t0)
        return best

    step = max(sample(run_3n) - sample(run_n), 1e-9) / (2 * iters)
    print(json.dumps({
        "metric": (
            f"psg_v4_train_step_img_per_s@{spec}px_llm{llm_layers}L"
            + ("_trainllm" if train_llm else "_frozenllm")
        ),
        "value": round(1.0 / step, 3),
        "unit": "images/sec/chip",
        "detail": {
            "step_ms": round(step * 1e3, 2),
            "compile_plus_first_s": round(compile_s, 1),
            "checksum": chk,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
