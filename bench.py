#!/usr/bin/env python
"""Benchmark: end-to-end PSG inference images/sec on one chip.

Measures the flagship v4 pipeline (Swin-T segmenter at real widths →
deformable encoder/decoder → panoptic fusion → Q-Former over all 1024
pairs → batched 16-step LLM greedy decode over top-20 pairs) as ONE jitted
program per image, steady-state.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 20 img/s — the driver's north-star target for PSG
val on v5e-8 (BASELINE.md).  Size knobs via env:
  BENCH_IMAGE=512   input bucket (square, ÷64)
  BENCH_LLM_LAYERS=2  truncated-LLM depth stand-in (7B convert pending)
  BENCH_ITERS=8
"""

from __future__ import annotations

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    from openpsg_tpu.models.detectors.psg_v4 import PSGv4, PSGv4Config
    from openpsg_tpu.models.llm.llama import LlamaConfig
    from openpsg_tpu.models.relation.head_v4 import HeadV4Config
    from openpsg_tpu.models.relation.qformer import QFormerConfig
    from openpsg_tpu.models.segmenter.openseed import SegmenterConfig

    size = int(os.environ.get("BENCH_IMAGE", 512))
    llm_layers = int(os.environ.get("BENCH_LLM_LAYERS", 2))
    iters = int(os.environ.get("BENCH_ITERS", 8))

    cfg = PSGv4Config(
        segmenter=SegmenterConfig(dtype=jnp.bfloat16),
        head=HeadV4Config(
            qformer=QFormerConfig(dtype=jnp.bfloat16),
            dtype=jnp.bfloat16,
        ),
        llm=LlamaConfig(
            n_layers=llm_layers, dim=4096, n_heads=32, n_kv_heads=32,
            ffn_hidden=11008, dtype=jnp.bfloat16,
        ),
        input_hw=(size, size),
    )
    pipeline = PSGv4(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (size, size, 3)).astype(np.float32))
    hw = jnp.asarray([size, size - 8], jnp.int32)

    t0 = time.time()
    out = pipeline._infer_jit(pipeline.params, img, hw)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        out = pipeline._infer_jit(pipeline.params, img, hw)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    ips = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": f"psg_v4_e2e_infer_img_per_s@{size}px_llm{llm_layers}L",
                "value": round(ips, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / 20.0, 4),
                "detail": {
                    "compile_s": round(compile_s, 1),
                    "step_ms": round(dt * 1e3, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
