#!/usr/bin/env python
"""Closed-set family bench: v1/v2/v3 end-to-end inference img/s on one chip.

bench.py covers the flagship v4 (OpenSeeDRelationV2) pipeline; this tool
gives the OTHER three generations of the reference family their own
measured numbers at REAL geometry, built straight from the shipped
configs (configs/psg/baseline_r50.py, baseline_v2_r50.py,
baseline_v3_r50.py — the same field surface as the reference's configs):

  v1  Mask2FormerRelation      R50 Mask2Former + 2-layer BERT-style head
  v2  Mask2FormerRelationV2    + 5-expert MoE head on offline text features
  v3  OpenSeeDRelation         + truncated-LLaMA head (shave at 6 layers)

Weights are random-init (no published checkpoints in this environment);
throughput is weight-value independent.  Timing uses bench.py's
chained-``lax.scan`` slope method — the axon tunnel's
``block_until_ready`` does not block, so each measurement is ONE jitted
program running the pipeline N / 3N times with a scalar data dependency
between iterations, step = (T(3N) - T(N)) / 2N.

Env knobs: BENCH_FAMILY (default "v1,v2,v3"; also accepts v3_ov and
v1_swinb), BENCH_IMAGE (default 1344, "HxW" accepted), BENCH_ITERS (4),
BENCH_TINY=1 (tiny test presets — CPU smoke path for the test suite).

Prints one JSON line per family; vs_baseline = img/s / 2.5 (the v5e-8
20 img/s north-star of BASELINE.md divided over 8 chips — same yardstick
as bench.py so the generations are comparable).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "v1": "baseline_r50.py",
    "v1_swinb": "baseline_swin_b.py",
    "v2": "baseline_v2_r50.py",
    "v3": "baseline_v3_r50.py",
    "v3_ov": "baseline_v3_ov.py",
}


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import openpsg_tpu  # noqa: F401  (persistent compile cache)
    from openpsg_tpu.utils.logging import honor_platform_env
    honor_platform_env()
    from openpsg_tpu.core.builder import build_detector_from_config
    from openpsg_tpu.core.config import Config

    spec = os.environ.get("BENCH_IMAGE", "1344")
    if "x" in spec:
        size, size_w = (int(t) for t in spec.split("x"))
    else:
        size = size_w = int(spec)
    iters = int(os.environ.get("BENCH_ITERS", 4))
    fams = os.environ.get("BENCH_FAMILY", "v1,v2,v3").split(",")
    tiny = bool(int(os.environ.get("BENCH_TINY", 0)))
    if tiny:
        size = size_w = 64
        spec = "tiny64"

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (size, size_w, 3)).astype(np.float32))
    hw = jnp.asarray([size, size_w - 8], jnp.int32)

    for fam in fams:
        cfg = Config.fromfile(
            os.path.join(here, "configs", "psg", CONFIGS[fam]),
            import_custom_modules=False,
        )
        if tiny:
            cfg.merge_from_dict({
                "tpu.segmenter_preset": "tiny",
                "tpu.head_preset": "tiny",
                "tpu.llm_preset": "tiny",
                "tpu.bf16": False,
            })
        t_build = time.time()
        model = build_detector_from_config(cfg, jax.random.PRNGKey(0))
        t_build = time.time() - t_build
        impl = model._infer_jit.__wrapped__

        def make_run(n):
            @jax.jit
            def run_n(params, image, img_hw):
                def body(carry, _):
                    # scalar data dependency: iterations can't be elided
                    out = impl(model, params, image + carry * 1e-9, img_hw)
                    s = (
                        jnp.sum(out["triplet_scores"])
                        + jnp.sum(out["object_scores"])
                    )
                    return s.astype(jnp.float32), None
                s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return s
            return run_n

        run_n, run_3n = make_run(iters), make_run(3 * iters)
        t0 = time.time()
        checksum = float(run_n(model.params, img, hw))   # includes compile
        float(run_3n(model.params, img, hw))
        compile_and_first = time.time() - t0

        def sample(fn):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                float(fn(model.params, img, hw))
                best = min(best, time.time() - t0)
            return best

        step = max(sample(run_3n) - sample(run_n), 1e-9) / (2 * iters)
        ips = 1.0 / step
        print(
            json.dumps(
                {
                    "metric": f"psg_{fam}_e2e_infer_img_per_s@{spec}px",
                    "value": round(ips, 3),
                    "unit": "images/sec/chip",
                    "vs_baseline": round(ips / 2.5, 4),
                    "detail": {
                        "config": CONFIGS[fam],
                        "step_ms": round(step * 1e3, 2),
                        "build_s": round(t_build, 1),
                        "compile_plus_first_s": round(compile_and_first, 1),
                        "iters": iters,
                        "checksum": checksum,
                        "device": str(jax.devices()[0]),
                    },
                }
            ),
            flush=True,
        )
        del model


if __name__ == "__main__":
    main()
