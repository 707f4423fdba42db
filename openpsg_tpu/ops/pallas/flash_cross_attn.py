"""Pallas TPU kernel: flash-style shared-KV masked cross-attention.

The relation Q-Former cross-attends every object pair's 33 queries to the
SAME image-patch sequence, restricted by a per-pair boolean OR-mask
(reference: relation_transformer_head_v4.py:179-186).  At the 1344px
geometry that is [1024 pairs × 12 heads × 33 queries × 7056 patches] —
the XLA formulation materializes multi-GB score tensors in HBM (a single
f32 score tensor at this shape is ~12 GB; XLA's bf16 softmax chain still
round-trips GBs).  This kernel streams patch chunks through VMEM with an
online softmax, so scores never leave the chip: measured 11.7 ms/call at
the bench geometry (v5e, chunk=1024, pair_tile=32), taking the 2-layer
Q-Former stage from 33.2 to 26.7 ms.

Layout: rows are (query, pair-tile) pairs — query-major, pair-minor with
the pair tile a multiple of 16 — so Lq needs NO padding to tile
boundaries (merging/splitting (Lq, TB) keeps whole sublane tiles for
f32 (8) and bf16 (16)).  Grid (pair_tile, head, patch_chunk), chunk axis
innermost; running max / normalizer / accumulator live in VMEM scratch,
re-initialized when the chunk index wraps.  Fully-masked chunks
contribute exactly zero (p is mask-multiplied, so the -1e9 fill never
leaks through the running max).  The mask arrives as f32 {0,1}: int8 /
bool tiles trip Mosaic's shape-cast and comparison support.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref, acc_ref, m_scr, l_scr,
            *, scale: float, n_chunks: int):
    j = pl.program_id(2)
    _, Lq, TB, hd = q_ref.shape
    C = k_ref.shape[1]
    R = Lq * TB

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)

    q = q_ref[0].reshape(R, hd)                    # (Lq, TB, hd) -> rows
    k = k_ref[0]                                   # [C, hd]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                      # [R, C]
    mskf = m_ref[:]                                # [TB, C] f32 {0,1}
    msk3 = jnp.broadcast_to(mskf[None, :, :], (Lq, TB, C)).reshape(R, C)
    s = s + (msk3 - 1.0) * 1e9                     # -1e9 where masked

    m_old = m_scr[:]                               # [R, 1]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    # multiply by the mask so a fully-masked chunk (s == m_new == -1e9ish)
    # contributes 0, not exp(0)
    p = jnp.exp(s - m_new) * msk3
    alpha = jnp.exp(m_old - m_new)                 # [R, 1]; exp(-inf)=0 at j=0
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new

    @pl.when(j == n_chunks - 1)
    def _():
        o_ref[0] = (
            acc_ref[:] / jnp.maximum(l_scr[:], 1e-20)
        ).reshape(Lq, TB, hd).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("chunk", "pair_tile", "interpret")
)
def flash_shared_kv_cross_attn(
    q: jnp.ndarray,     # [NP, H, Lq, hd]
    k: jnp.ndarray,     # [H, P, hd]
    v: jnp.ndarray,     # [H, P, hd]
    mask: jnp.ndarray,  # [NP, P] bool — per-pair patch mask
    *,
    chunk: int = 1024,
    pair_tile: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:       # [NP, H, Lq, hd], dtype of v
    NP, H, Lq, hd = q.shape
    P = k.shape[1]
    scale = float(hd) ** -0.5

    C = min(chunk, max(P, 8))
    # pair tile: multiple of 16 so the merged (Lq, TB) row dim merges and
    # splits whole sublane tiles for both f32 (8) and bf16 (16) layouts
    TB = max(16, min(pair_tile, -(-NP // 16) * 16))
    TB = -(-TB // 16) * 16
    Lqp = Lq
    NPp = -(-NP // TB) * TB
    Pp = -(-P // C) * C
    n_chunks = Pp // C

    qT = jnp.transpose(q, (1, 2, 0, 3))            # [H, Lq, NP, hd]
    qp = jnp.zeros((H, Lqp, NPp, hd), q.dtype).at[:, :, :NP].set(qT)
    kp = jnp.zeros((H, Pp, hd), k.dtype).at[:, :P].set(k)
    vp = jnp.zeros((H, Pp, hd), v.dtype).at[:, :P].set(v)
    mp = jnp.zeros((NPp, Pp), jnp.float32).at[:NP, :P].set(
        mask.astype(jnp.float32)
    )

    R = Lqp * TB
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_chunks=n_chunks),
        grid=(NPp // TB, H, n_chunks),
        in_specs=[
            pl.BlockSpec((1, Lqp, TB, hd), lambda i, h, j: (h, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, hd), lambda i, h, j: (h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, hd), lambda i, h, j: (h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, C), lambda i, h, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Lqp, TB, hd), lambda i, h, j: (h, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, Lqp, NPp, hd), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((R, hd), jnp.float32),
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((R, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, mp)
    return jnp.transpose(out, (2, 0, 1, 3))[:NP]


def shared_kv_cross_attn_reference(q, k, v, mask):
    """Plain XLA formulation (differentiable; also the CPU path)."""
    hd = q.shape[-1]
    s = jnp.einsum(
        "bhqd,hpd->bhqp", q, k, preferred_element_type=jnp.float32
    ) * (hd ** -0.5)
    s = jnp.where(mask[:, None, None, :], s, -1e9)
    attn = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqp,hpd->bhqd", attn, v)
