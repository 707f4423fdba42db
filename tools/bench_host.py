#!/usr/bin/env python
"""Host-side serving throughput: postprocess + panoptic paint + PNG.

The TPU side sustains ~3.7 img/s/chip (PARITY.md); a pod host feeding 8
chips must keep ≥ 30 img/s of HOST work — `PSGv4.postprocess` (token →
predicate matching, pure Python over top-K pairs), the submission paint
(`paint_panoptic`: id map → distinct-color BGR), PNG encode (cv2), and
the serve.py base64 wrap.  This tool measures each stage per image at
full 1344² output resolution and prints one JSON line; the number lands
in PARITY.md (VERDICT r3 next #8).

    python tools/bench_host.py [--size 1344] [--iters 30]

Runs on CPU only (the model is the tiny fixture config; the `dev` dict a
realistic-shape synthetic — postprocess cost depends on shapes, not
values).
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dev(size: int, n_obj: int, top_k: int, pipe) -> dict:
    """Realistic-shape PSGv4 device-output dict (psg_v4.py _infer_jit
    returns: pan_seg full-res, object ids/valid, top-K pair tokens,
    multiclass top-100)."""
    rng = np.random.default_rng(0)
    M = pipe.cfg.head.max_objects_padded
    tok = pipe.tokenizer
    # panoptic map: n_obj random rectangles over background (worst-case-ish
    # segment count for PSG val is ~20 objects).  The model side caps at
    # M (tiny fixture M=8) — postprocess cost is driven by top_k, the
    # paint/PNG cost by the FULL n_obj segment count, so both stay honest.
    oids = (rng.integers(0, 80, n_obj) + 1000 * np.arange(n_obj)).astype(np.int64)
    pan = np.full((size, size), 133, np.int64)
    for i, oid in enumerate(oids):
        y, x = rng.integers(0, size // 2, 2)
        h, w = rng.integers(size // 8, size // 2, 2)
        pan[y : y + h, x : x + w] = oid
    n_obj = min(n_obj, M)
    valid = np.zeros(M, bool)
    valid[:n_obj] = True
    object_ids = np.zeros(M, np.int64)
    object_ids[:n_obj] = oids[:n_obj]
    # decoded predicate tokens: real vocabulary names through the real
    # tokenizer, EOS-terminated, padded
    T = pipe.cfg.max_new_tokens
    gen = np.full((top_k, T), tok.pad_id, np.int32)
    names = pipe.relation_names
    for k in range(top_k):
        ids = tok.encode(" " + names[k % len(names)])[:T - 1]
        gen[k, : len(ids)] = ids
        gen[k, len(ids)] = tok.eos_id
    pairs = rng.choice(n_obj * n_obj, top_k, replace=False)
    sub, obj = pairs // n_obj, pairs % n_obj
    return {
        "paint_oids": [int(x) for x in oids],   # full segment list for paint
        "pan_seg": pan,
        "object_valid": valid,
        "object_ids": object_ids,
        "top_pair_idx": (sub * M + obj).astype(np.int32),
        "top_pair_scores": rng.uniform(0.1, 1.0, top_k).astype(np.float32),
        "gen_tokens": gen,
        "mc_triplets": rng.integers(0, n_obj, (100, 3)).astype(np.int32),
        "mc_scores": rng.uniform(0, 1, 100).astype(np.float32),
        "fusion_pass_count": np.int32(n_obj),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1344)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--objects", type=int, default=20)
    ap.add_argument("--top-k", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import cv2

    from openpsg_tpu import native
    from openpsg_tpu.models.detectors.psg_v4 import PSGv4, PSGv4Config
    from openpsg_tpu.utils.submission import (
        SubmissionWriter,
        paint_panoptic,
        paint_panoptic_indexed,
    )

    pipe = PSGv4(PSGv4Config.tiny_test(), jax.random.PRNGKey(0))
    dev = make_dev(args.size, args.objects, args.top_k, pipe)

    def timeit(fn, iters=args.iters):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        return (time.perf_counter() - t0) / iters

    paint_oids = dev.pop("paint_oids")
    res = pipe.postprocess(dev)
    t_post = timeit(lambda: pipe.postprocess(dev))

    t_paint = timeit(lambda: paint_panoptic(dev["pan_seg"], paint_oids))
    idx, palette, _, _, _ = paint_panoptic_indexed(dev["pan_seg"], paint_oids)
    t_paint_idx = timeit(
        lambda: paint_panoptic_indexed(dev["pan_seg"], paint_oids)
    )
    out_bgr = palette[..., ::-1][idx]
    t_png_cv2 = timeit(
        lambda: cv2.imencode(
            ".png", out_bgr, [cv2.IMWRITE_PNG_COMPRESSION, 1]
        )
    )
    png_native = native.encode_palette_png(idx, palette)
    t_png_native = (
        timeit(lambda: native.encode_palette_png(idx, palette))
        if png_native is not None else float("nan")
    )
    t_b64 = timeit(
        lambda: base64.b64encode(png_native or b"x" * (1 << 20))
    )

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        w = SubmissionWriter(td)
        t_writer = timeit(
            lambda: w.add(
                dev["pan_seg"],
                paint_oids,
                res["rel_results"]["relation"],
                test_idx=0,
            ),
            iters=max(args.iters // 3, 5),
        )

    per_img = t_post + t_writer   # the tools/infer.py host path
    serve_img = t_post + t_paint_idx + (
        t_png_native if png_native is not None else t_png_cv2
    ) + t_b64
    line = {
        "size": args.size,
        "postprocess_ms": round(t_post * 1e3, 2),
        "paint_indexed_ms": round(t_paint_idx * 1e3, 2),
        "paint_bgr_ms": round(t_paint * 1e3, 2),
        "png_native_ms": round(t_png_native * 1e3, 2),
        "png_cv2_ms": round(t_png_cv2 * 1e3, 2),
        "serve_b64_ms": round(t_b64 * 1e3, 2),
        "writer_add_ms": round(t_writer * 1e3, 2),
        "infer_host_img_per_s": round(1.0 / per_img, 2),
        "serve_host_img_per_s": round(1.0 / serve_img, 2),
        "pod8_required_img_per_s": 30.0,
        "native_codec": native.is_native(),
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
