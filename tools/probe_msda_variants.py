#!/usr/bin/env python
"""Probe msda gather formulations at exact encoder geometry (on-TPU).

The shipped op (ops/deform_attn.py) measures ~19 ms/layer at the 1344px
4-level geometry, but its gather bill — 4.8M rows (B*nH*L*K takes of Lq
rows) at the measured ~2 ns/row flat-gather rate — predicts ~9.6 ms.
Hypotheses for the 2x gap, each probed as a variant:

  raw   pure gather rate: 128 takes of Lq rows from a CONTIGUOUS
        [Lv, 4hd] table (static indices, perturbed table) — the floor.
  v0    shipped op (quad_all[b,:,hh] strided head slice inside each take).
  v1    head-major quad table [nH, Lv, 4hd] materialized once; each take
        reads a contiguous operand.
  v2    v1 + ONE take per head (L*K*Lq merged indices) — 8 takes/layer.
  v4    merged indices but strided operand (separates the two effects).

Timing: slope method (scan length N vs 3N inside one jit returning a
scalar) — see bench.py; block_until_ready does not block through the
axon tunnel.  Run: python tools/probe_msda_variants.py [--size 1344]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import openpsg_tpu  # noqa: F401  (persistent compile cache)
    from openpsg_tpu.ops.deform_attn import ms_deform_attn

    size = int(os.environ.get("BENCH_IMAGE", 1344))
    iters = int(os.environ.get("BENCH_ITERS", 4))
    which = set(os.environ.get("VARIANTS", "raw,v0,v1,v2,v4").split(","))

    shapes = []
    h, w = size // 8, size // 8
    for _ in range(4):
        shapes.append((h, w))
        h, w = h // 2, w // 2
    shapes = tuple(shapes)
    Lv = sum(h * w for h, w in shapes)
    nH, hd, K, L = 8, 32, 4, len(shapes)
    Lq = Lv

    rng = np.random.default_rng(0)
    val = jnp.asarray(rng.normal(size=(1, Lv, nH, hd)), jnp.bfloat16)
    loc = jnp.asarray(
        rng.uniform(0.05, 0.95, (1, Lq, nH, L, K, 2)), jnp.float32
    )
    aw = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(1, Lq, nH, L, K)), jnp.float32), -1
    )

    def timed(name, fn, *args):
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
        float(lo(args)); float(hi(args))
        compile_s = time.time() - t0

        def sample(run):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                float(run(args))
                best = min(best, time.time() - t0)
            return best

        ms = max(sample(hi) - sample(lo), 0.0) / (2 * iters) * 1e3
        print(f"  {name}: {ms:.2f} ms/iter  (compile {compile_s:.0f}s)",
              flush=True)
        return ms

    # ---- shared precompute (mirrors ops/deform_attn.py) -------------
    def build(value):
        quads, bases, cws = [], [], []
        start = 0
        for lvl, (hh_, ww_) in enumerate(shapes):
            vl = jax.lax.slice_in_dim(value, start, start + hh_ * ww_, axis=1)
            quads.append(jnp.concatenate(
                [vl, jnp.roll(vl, -1, 1), jnp.roll(vl, -ww_, 1),
                 jnp.roll(vl, -(ww_ + 1), 1)], -1))
            l2 = loc[:, :, :, lvl]
            x = l2[..., 0] * ww_ - 0.5
            y = l2[..., 1] * hh_ - 0.5
            bx = jnp.clip(jnp.floor(x), 0, max(ww_ - 2, 0)).astype(jnp.int32)
            by = jnp.clip(jnp.floor(y), 0, max(hh_ - 2, 0)).astype(jnp.int32)
            fx0 = jnp.maximum(0.0, 1.0 - jnp.abs(x - bx))
            fx1 = jnp.maximum(0.0, 1.0 - jnp.abs(x - (bx + 1)))
            fy0 = jnp.maximum(0.0, 1.0 - jnp.abs(y - by))
            fy1 = jnp.maximum(0.0, 1.0 - jnp.abs(y - (by + 1)))
            cws.append(jnp.stack(
                [fx0 * fy0, fx1 * fy0, fx0 * fy1, fx1 * fy1], -1
            ) * aw[:, :, :, lvl][..., None])
            bases.append(by * ww_ + bx + start)
            start += hh_ * ww_
        quad_all = jnp.concatenate(quads, 1)           # [1,Lv,nH,4hd]
        base = jnp.stack(bases, 3)                     # [1,Lq,nH,L,K]
        cw = jnp.stack(cws, 3)                         # [1,Lq,nH,L,K,4]
        return quad_all, base, cw

    if "raw" in which:
        # pure-gather floor: same take count/shape as v1, weights folded
        table = jnp.reshape(
            jnp.transpose(val[0], (1, 0, 2)), (nH, Lv, hd)
        )
        table4 = jnp.concatenate([table] * 4, -1)      # [nH, Lv, 4hd]
        idx = jnp.asarray(
            rng.integers(0, Lv, (nH, L, K, Lq)), jnp.int32)

        def raw_fn(table4, idx, carry):
            t = table4 + carry.astype(table4.dtype) * 1e-9
            acc = jnp.float32(0.0)
            for hh_ in range(nH):
                th = t[hh_]
                for lvl in range(L):
                    for k in range(K):
                        g = jnp.take(th, idx[hh_, lvl, k], axis=0)
                        acc = acc + jnp.sum(g).astype(jnp.float32) * 1e-9
            return acc
        timed("raw_128takes_contig", raw_fn, table4, idx)

    if "v0" in which:
        def v0_fn(val, loc_, aw_, carry):
            o = ms_deform_attn(
                val + carry.astype(val.dtype) * 1e-9, shapes, loc_, aw_)
            return jnp.sum(o).astype(jnp.float32)
        timed("v0_shipped", v0_fn, val, loc, aw)

    if "v1" in which:
        def v1_fn(val, carry):
            quad_all, base, cw = build(val + carry.astype(val.dtype) * 1e-9)
            quad_hm = jnp.transpose(quad_all[0], (1, 0, 2))  # [nH,Lv,4hd]
            per_h = []
            for hh_ in range(nH):
                th = quad_hm[hh_]
                acc = jnp.zeros((Lq, hd), jnp.float32)
                for lvl in range(L):
                    for k in range(K):
                        g = jnp.take(th, base[0, :, hh_, lvl, k], axis=0
                                     ).reshape(Lq, 4, hd)
                        acc = acc + jnp.einsum(
                            "lcd,lc->ld", g,
                            cw[0, :, hh_, lvl, k].astype(g.dtype),
                            preferred_element_type=jnp.float32)
                per_h.append(acc)
            out = jnp.stack(per_h, 1)
            return jnp.sum(out).astype(jnp.float32)
        timed("v1_headmajor_128takes", v1_fn, val)

    if "v2" in which:
        def v2_fn(val, carry):
            quad_all, base, cw = build(val + carry.astype(val.dtype) * 1e-9)
            quad_hm = jnp.transpose(quad_all[0], (1, 0, 2))
            per_h = []
            for hh_ in range(nH):
                th = quad_hm[hh_]
                # [L,K,Lq] merged indices -> ONE take per head
                idx = jnp.transpose(base[0, :, hh_], (1, 2, 0)).reshape(-1)
                g = jnp.take(th, idx, axis=0).reshape(L * K, Lq, 4, hd)
                wgt = jnp.transpose(cw[0, :, hh_], (1, 2, 0, 3)
                                    ).reshape(L * K, Lq, 4)
                acc = jnp.einsum(
                    "rlcd,rlc->ld", g, wgt.astype(g.dtype),
                    preferred_element_type=jnp.float32)
                per_h.append(acc)
            out = jnp.stack(per_h, 1)
            return jnp.sum(out).astype(jnp.float32)
        timed("v2_headmajor_8takes", v2_fn, val)

    if "v4" in which:
        def v4_fn(val, carry):
            quad_all, base, cw = build(val + carry.astype(val.dtype) * 1e-9)
            per_h = []
            for hh_ in range(nH):
                th = quad_all[0, :, hh_]                 # strided operand
                idx = jnp.transpose(base[0, :, hh_], (1, 2, 0)).reshape(-1)
                g = jnp.take(th, idx, axis=0).reshape(L * K, Lq, 4, hd)
                wgt = jnp.transpose(cw[0, :, hh_], (1, 2, 0, 3)
                                    ).reshape(L * K, Lq, 4)
                acc = jnp.einsum(
                    "rlcd,rlc->ld", g, wgt.astype(g.dtype),
                    preferred_element_type=jnp.float32)
                per_h.append(acc)
            out = jnp.stack(per_h, 1)
            return jnp.sum(out).astype(jnp.float32)
        timed("v4_strided_8takes", v4_fn, val)


if __name__ == "__main__":
    main()
