#!/usr/bin/env python
"""Fine-grained on-TPU stage timings for the flagship v4 pipeline.

Complements bench.py's BENCH_BREAKDOWN (segmenter / qformer / llm) with the
next level down — backbone vs pixel decoder vs query decoder, fusion block,
LLM prefill vs per-step decode — plus matmul microbenches that diagnose the
weight-only-int8 dequant path.  Timing uses the chained-``lax.scan`` method
(see bench.py docstring: ``block_until_ready`` does not block through the
axon tunnel, so every measurement is ONE jit returning a scalar).

Env knobs mirror bench.py: BENCH_IMAGE, BENCH_LLM_LAYERS, BENCH_LLM_INT8,
BENCH_ACT_INT8, BENCH_ENC_POINTS, BENCH_QUERIES, BENCH_ITERS, plus
STAGES=comma,list to run a subset
(backbone,pixel,msda,decoder,fusion,qformer,prefill,decode,micro).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import openpsg_tpu  # noqa: F401  (persistent compile cache)
    from openpsg_tpu.models.detectors.psg_v4 import PSGv4, PSGv4Config
    from openpsg_tpu.models.llm.llama import LlamaConfig
    from openpsg_tpu.models.relation.head_v4 import HeadV4Config
    from openpsg_tpu.models.relation.qformer import QFormerConfig
    from openpsg_tpu.models.segmenter.openseed import (
        SegmenterConfig,
        normalize_image,
    )

    size = int(os.environ.get("BENCH_IMAGE", 1344))
    llm_layers = int(os.environ.get("BENCH_LLM_LAYERS", 32))
    llm_int8 = bool(int(os.environ.get("BENCH_LLM_INT8", 1)))
    act_int8 = bool(int(os.environ.get("BENCH_ACT_INT8", 0)))
    queries = int(os.environ.get("BENCH_QUERIES", 0))
    iters = int(os.environ.get("BENCH_ITERS", 8))
    stages = set(
        os.environ.get(
            "STAGES",
            "backbone,pixel,msda,decoder,fusion,qformer,prefill,decode,micro",
        ).split(",")
    )

    seg_cfg = SegmenterConfig(dtype=jnp.bfloat16)
    import dataclasses as _dc

    if queries:
        seg_cfg = _dc.replace(seg_cfg, num_queries=queries)
    enc_points = os.environ.get("BENCH_ENC_POINTS", "")
    if enc_points:   # e.g. BENCH_ENC_POINTS=2,2,2,4 (fine-first)
        seg_cfg = _dc.replace(
            seg_cfg,
            enc_points_per_level=tuple(int(t) for t in enc_points.split(",")),
        )
    cfg = PSGv4Config(
        segmenter=seg_cfg,
        head=HeadV4Config(qformer=QFormerConfig(dtype=jnp.bfloat16),
                          dtype=jnp.bfloat16),
        llm=LlamaConfig(
            n_layers=llm_layers, dim=4096, n_heads=32, n_kv_heads=32,
            ffn_hidden=11008, dtype=jnp.bfloat16, quant=llm_int8,
            act_int8=act_int8,
        ),
        input_hw=(size, size),
    )
    pipeline = PSGv4(cfg, jax.random.PRNGKey(0))
    params = pipeline.params
    c = pipeline.cfg

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (size, size, 3)).astype(np.float32))

    # rtt estimate, subtracted per print
    trivial = jax.jit(lambda x: jnp.sum(x))
    float(trivial(img))
    t0 = time.time()
    for _ in range(3):
        float(trivial(img + 1.0))
    rtt = (time.time() - t0) / 3
    results = {}

    def timed(name, fn, *args):
        # slope method: time scan-length N and 3N programs and use the
        # difference — cancels the (highly variable) tunnel round-trip
        # instead of subtracting a stale rtt estimate.  min-of-2 guards
        # against rtt spikes inside a sample.
        def make(n):
            @jax.jit
            def run(args):
                def body(carry, _):
                    return fn(*args, carry), None
                s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return s
            return run

        lo, hi = make(iters), make(3 * iters)
        t0 = time.time()
        float(lo(args))
        float(hi(args))  # compiles + first runs
        compile_s = time.time() - t0

        def sample(run):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                float(run(args))
                best = min(best, time.time() - t0)
            return best

        ms = max(sample(hi) - sample(lo), 0.0) / (2 * iters) * 1e3
        results[name] = round(ms, 2)
        print(f"  {name}: {ms:.2f} ms/iter  (compile {compile_s:.0f}s)",
              flush=True)

    # ---------------- segmenter internals ----------------
    from openpsg_tpu.models.segmenter.pixel_decoder import PixelDecoder
    from openpsg_tpu.models.segmenter.swin import SwinTransformer

    sc = c.segmenter
    backbone = SwinTransformer(
        embed_dim=sc.embed_dim, depths=sc.depths, num_heads=sc.num_heads,
        window=sc.window, dtype=sc.dtype, name="backbone",
    )
    bb_params = {"params": params["segmenter"]["params"]["backbone"]}

    if "backbone" in stages:
        def bb_fn(p, image, carry):
            feats = backbone.apply(p, normalize_image(image + carry * 1e-9))
            return sum(jnp.sum(f).astype(jnp.float32) for f in feats)
        timed("swin_backbone", bb_fn, bb_params, img)

    # concrete backbone features stay on device for the later stages
    feats = jax.jit(backbone.apply)(bb_params, normalize_image(img))

    pixdec = PixelDecoder(
        dim=sc.dim, num_layers=sc.enc_layers, num_points=sc.num_points,
        ffn_hidden=sc.ffn_hidden, mask_dim=sc.mask_dim,
        total_levels=sc.total_levels,
        enc_points_per_level=sc.enc_points_per_level,
        dtype=sc.dtype, name="pixel_decoder",
    )
    px_params = {"params": params["segmenter"]["params"]["pixel_decoder"]}

    if "pixel" in stages:
        def px_fn(p, feats, carry):
            # perturb EVERY input level: c2 feeds only the FPN tail, so
            # perturbing it alone lets XLA hoist the whole encoder out of
            # the timing loop (observed: 1.4 ms for a 280 ms stage)
            f = [fi + carry.astype(fi.dtype) * 1e-9 for fi in feats]
            memory, shapes, mf = pixdec.apply(p, f)
            return (jnp.sum(mf) + jnp.sum(memory)).astype(jnp.float32)
        timed(f"pixel_decoder_{sc.enc_layers}L", px_fn, px_params, feats)

    if "msda" in stages:
        # one deformable-attention core call at encoder geometry
        from openpsg_tpu.ops.deform_attn import ms_deform_attn

        shapes = []
        h, w = size // 8, size // 8
        for _ in range(sc.total_levels):
            shapes.append((h, w))
            h, w = h // 2, w // 2
        Lv = sum(h * w for h, w in shapes)
        nH, hd, K = 8, sc.dim // 8, sc.num_points
        val = jnp.asarray(rng.normal(size=(1, Lv, nH, hd)), sc.dtype)
        loc = jnp.asarray(
            rng.uniform(0.05, 0.95, (1, Lv, nH, len(shapes), K, 2)), jnp.float32
        )
        aw = jax.nn.softmax(
            jnp.asarray(rng.normal(size=(1, Lv, nH, len(shapes), K)), jnp.float32),
            axis=-1,
        ).reshape(1, Lv, nH, len(shapes), K)

        def msda_fn(val, loc, aw, carry):
            o = ms_deform_attn(val + carry.astype(val.dtype) * 1e-9, shapes, loc, aw)
            return jnp.sum(o).astype(jnp.float32)
        timed("msda_core_1layer_encoder_geom", msda_fn, val, loc, aw)

    # static level geometry (strides 8, 16, 32, 64...)
    shapes_static = []
    h, w = size // 8, size // 8
    for _ in range(sc.total_levels):
        shapes_static.append((h, w))
        h, w = h // 2, w // 2
    shapes_static = tuple(shapes_static)

    @jax.jit
    def _px(p, feats):
        s, _, mf = pixdec.apply(p, feats)
        return s, mf

    memory, mask_features = _px(px_params, feats)

    if "decoder" in stages:
        from openpsg_tpu.models.segmenter.decoder import QueryDecoder

        qdec = QueryDecoder(
            dim=sc.dim, num_queries=sc.num_queries, num_layers=sc.dec_layers,
            num_points=sc.num_points, ffn_hidden=sc.ffn_hidden,
            mask_dim=sc.mask_dim, proj_dim=sc.proj_dim, dtype=sc.dtype,
            name="decoder",
        )
        qd_params = {"params": params["segmenter"]["params"]["decoder"]}

        def qd_fn(p, memory, mf, ce, carry):
            out = qdec.apply(
                p, memory + carry.astype(memory.dtype) * 1e-9, shapes_static,
                mf, ce,
            )
            return jnp.sum(out["cls_logits"]).astype(jnp.float32)
        timed(
            f"query_decoder_{sc.dec_layers}L_{sc.num_queries}q",
            qd_fn, qd_params, memory, mask_features, params["class_embeds"],
        )

    if "fusion" in stages:
        from openpsg_tpu.models.segmenter.fusion import panoptic_fusion

        Q = sc.num_queries
        H4 = size // 4
        cls_l = jnp.asarray(rng.normal(size=(Q, 133)), jnp.float32)
        masks_s = jnp.asarray(rng.normal(size=(Q, H4, H4)), jnp.float32)
        Cc = int(c.fusion_candidates)

        def fus_fn(cls_l, masks_s, carry):
            cl, ms = cls_l + carry * 1e-9, masks_s
            if Cc and Cc < Q:
                sel = jnp.max(jax.nn.sigmoid(cl), axis=-1)
                _, cand = jax.lax.top_k(sel, Cc)
                cand = jnp.sort(cand)
                cl = jnp.take(cl, cand, axis=0)
                ms = jnp.take(ms, cand, axis=0)
            big = jax.image.resize(ms, (ms.shape[0], size, size), "bilinear")
            fr = panoptic_fusion(
                cl, big, cls_mode="sigmoid",
                object_mask_thr=c.object_mask_thr, iou_thr=c.iou_thr,
                instance_mode="per_class", num_things=pipeline.num_things,
            )
            return (jnp.sum(fr.pan_seg) + jnp.sum(fr.query_scores)).astype(
                jnp.float32
            )
        timed(f"fusion_block_top{Cc}_of_{Q}", fus_fn, cls_l, masks_s)

    if "qformer" in stages:
        M = c.head.max_objects_padded
        Ti = pipeline.qf_parts["max_len"]
        mf = jnp.zeros((size // 4, size // 4, sc.mask_dim), c.head.dtype)
        omask = jnp.zeros((M, size // 4, size // 4), bool).at[:, :8, :8].set(True)
        valid = jnp.ones((M,), bool)
        ids = jnp.ones((M * M, Ti), jnp.int32)
        tmask = jnp.ones((M * M, Ti), bool)

        def head_fn(p, mf, carry):
            out = pipeline.head.apply(
                p["head"], mf + carry.astype(mf.dtype) * 1e-9, omask, valid, ids,
                tmask,
            )
            return jnp.sum(out["binary_logits"]).astype(jnp.float32)
        timed(f"qformer_{M * M}pairs", head_fn, params, mf)

    # ---------------- LLM ----------------
    K = c.head.top_pairs
    Lp = c.head.qformer.num_relation_queries + pipeline.llm_parts["max_len"]
    prefix = jnp.asarray(rng.normal(size=(K, Lp, c.llm.dim)) * 0.02, c.llm.dtype)
    pmask = jnp.ones((K, Lp), bool)

    if "prefill" in stages:
        from openpsg_tpu.models.llm.llama import init_kv_cache

        S = Lp + c.max_new_tokens

        def prefill_fn(p, prefix, carry):
            cache = init_kv_cache(c.llm, K, S)
            key_mask = jnp.concatenate(
                [pmask, jnp.zeros((K, c.max_new_tokens), bool)], 1
            )
            pos = jnp.cumsum(pmask.astype(jnp.int32), 1) - 1
            kpos = jnp.concatenate(
                [pos, jnp.zeros((K, c.max_new_tokens), jnp.int32)], 1
            )
            logits, _ = pipeline.llm.apply(
                p["llm"], input_embeds=prefix + carry.astype(prefix.dtype) * 1e-9,
                attention_mask=key_mask, positions=pos, cache=cache,
                cache_index=jnp.int32(0), key_positions=kpos,
            )
            return jnp.sum(logits[:, -1]).astype(jnp.float32)
        timed(f"llm_prefill_{K}x{Lp}", prefill_fn, params, prefix)

    if "decode" in stages:
        from openpsg_tpu.models.llm.decode import greedy_decode

        def dec_fn(p, prefix, carry):
            toks, scores = greedy_decode(
                pipeline.llm, p["llm"],
                prefix + carry.astype(prefix.dtype) * 1e-9, pmask,
                c.max_new_tokens, eos_id=2, pad_id=0,
                early_exit=False,  # pinned worst case, like bench.py
            )
            return jnp.sum(scores).astype(jnp.float32)
        timed(f"llm_prefill+decode_{K}x{c.max_new_tokens}", dec_fn, params,
              prefix)

    # ---------------- matmul microbenches ----------------
    if "micro" in stages:
        D, F = 4096, 11008
        x1 = jnp.asarray(rng.normal(size=(K, 1, D)) * 0.02, jnp.bfloat16)
        xp = jnp.asarray(rng.normal(size=(K, Lp, D)) * 0.02, jnp.bfloat16)
        wbf = jnp.asarray(rng.normal(size=(D, F)) * 0.02, jnp.bfloat16)
        wq = jnp.asarray(rng.integers(-127, 128, (D, F)), jnp.int8)
        ws = jnp.full((F,), 1.0 / 127.0, jnp.float32)
        reps = 32  # ~one layer-stack worth of matmuls

        def loopw(f):
            def g(x, carry):
                def body(cc, _):
                    y = f(x + cc.astype(x.dtype) * 1e-9)
                    return jnp.sum(y).astype(jnp.float32) * 1e-9, None
                s, _ = jax.lax.scan(body, carry, None, length=reps)
                return s
            return g

        timed("micro_bf16_decode_[20,1]x[4096,11008]x32", loopw(
            lambda x: jnp.einsum("bld,df->blf", x, wbf,
                                 preferred_element_type=jnp.float32)
        ), x1)
        timed("micro_int8deq_decode_[20,1]x[4096,11008]x32", loopw(
            lambda x: jnp.einsum("bld,df->blf", x, wq.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32) * ws
        ), x1)
        # decode batch-flatness: cost at 2 images' worth of pairs (40) is
        # the basis for the BENCH_PIPELINE micro-batch lever (measured
        # 1.538 ms @20 vs 1.537 @40, +7% @60 — pure weight streaming)
        x2 = jnp.asarray(rng.normal(size=(2 * K, 1, D)) * 0.02, jnp.bfloat16)
        timed("micro_int8deq_decode_[40,1]x[4096,11008]x32", loopw(
            lambda x: jnp.einsum("bld,df->blf", x, wq.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32) * ws
        ), x2)
        # KV-cache attention read at decode: scales WITH the pair batch
        # (unlike the weight stream), which is why mb4 decode amortizes
        # 3x not 4x (r5 probe: 0.59 ms/32L-stack at B=20 pairs, 5.13 at
        # B=80 — 2.85 GB of bf16 cache at 556 GB/s sustained; PARITY.md
        # speed-of-light notes, int8-KV lever bounded there)
        for Bkv in (K, 4 * K):
            S_kv, Hh, hd = 68, 32, 128
            qa = jnp.asarray(
                rng.normal(size=(Bkv, Hh, 1, hd)) * 0.02, jnp.bfloat16
            )
            ka = jnp.asarray(
                rng.normal(size=(Bkv, Hh, S_kv, hd)) * 0.02, jnp.bfloat16
            )
            va = jnp.asarray(
                rng.normal(size=(Bkv, Hh, S_kv, hd)) * 0.02, jnp.bfloat16
            )

            def kv_att(q, k=ka, v=va):
                s = jnp.einsum("bhqd,bhkd->bhqk", q, k)
                p = jax.nn.softmax(
                    s.astype(jnp.float32), axis=-1
                ).astype(jnp.bfloat16)
                return jnp.einsum("bhqk,bhkd->bhqd", p, v)

            timed(f"micro_kv_attn_decode_[{Bkv},{S_kv}]x32", loopw(kv_att), qa)
        timed("micro_bf16_prefill_[20,52]x[4096,11008]x32", loopw(
            lambda x: jnp.einsum("bld,df->blf", x, wbf,
                                 preferred_element_type=jnp.float32)
        ), xp)
        timed("micro_int8deq_prefill_[20,52]x[4096,11008]x32", loopw(
            lambda x: jnp.einsum("bld,df->blf", x, wq.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32) * ws
        ), xp)

    print(json.dumps({"stages_ms": results, "rtt_ms": round(rtt * 1e3, 1)}))


if __name__ == "__main__":
    main()
