"""Swin Transformer backbone (flax.linen), TPU-first.

The OpenSeeD segmenter the reference freezes uses a Swin-T backbone
(SURVEY.md §2.10; /root/reference config names the checkpoint
``model_state_dict_swint_51.2ap.pt``).  This is a from-scratch JAX
implementation of the public Swin architecture (arXiv 2103.14030):
patch embed → 4 stages of windowed attention blocks with shifted windows
and relative position bias, patch-merging downsampling between stages.

TPU notes:
  * all window partitioning is pure reshape/transpose (layout-friendly);
    the cyclic shift is ``jnp.roll`` (XLA collective-permute-free on one
    chip, fuses into the surrounding copy);
  * attention runs in ``dtype`` (bf16 by default) with fp32 softmax;
  * input H, W must be static and divisible by ``patch_size``; each stage
    pads to a multiple of the window size internally (static pads).
Outputs NHWC feature maps at strides 4, 8, 16, 32.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _rel_pos_index(window: int) -> np.ndarray:
    """[win², win²] index into the (2w-1)² relative position bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    ).reshape(2, -1)                                    # [2, w²]
    rel = coords[:, :, None] - coords[:, None, :]       # [2, w², w²]
    rel = rel.transpose(1, 2, 0) + (window - 1)         # shift to ≥0
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: jnp.ndarray | None = None):
        """x: [nW, win², C]; attn_mask: [nW_kinds, win², win²] additive or None."""
        nW, L, C = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(nW, L, 3, self.num_heads, hd), 3, axis=2)
        q = q.squeeze(2).transpose(0, 2, 1, 3)          # [nW, nH, L, hd]
        k = k.squeeze(2).transpose(0, 2, 1, 3)
        v = v.squeeze(2).transpose(0, 2, 1, 3)

        scale = hd ** -0.5
        attn = jnp.einsum(
            "whld,whmd->whlm", q * scale, k, preferred_element_type=jnp.float32
        )                                               # [nW, nH, L, L]

        bias_table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
        )
        idx = _rel_pos_index(self.window)               # static numpy
        bias = bias_table[idx.reshape(-1)].reshape(L, L, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if attn_mask is not None:
            kinds = attn_mask.shape[0]
            attn = attn.reshape(nW // kinds, kinds, self.num_heads, L, L)
            attn = attn + attn_mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(nW, self.num_heads, L, L)

        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("whlm,whmd->whld", attn, v).transpose(0, 2, 1, 3)
        out = out.reshape(nW, L, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: [H, W, C] (single image; batch handled by vmap outside)."""
        H, W, C = x.shape
        w = self.window
        pad_h = (-H) % w
        pad_w = (-W) % w
        Hp, Wp = H + pad_h, W + pad_w

        shortcut = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = jnp.pad(h, ((0, pad_h), (0, pad_w), (0, 0)))
        if self.shift > 0:
            h = jnp.roll(h, (-self.shift, -self.shift), axis=(0, 1))
            mask = self._shift_mask(Hp, Wp)
        else:
            mask = None

        # window partition: [Hp/w, w, Wp/w, w, C] -> [nW, w², C]
        h = h.reshape(Hp // w, w, Wp // w, w, C).transpose(0, 2, 1, 3, 4)
        h = h.reshape(-1, w * w, C)
        h = WindowAttention(
            self.dim, self.num_heads, w, dtype=self.dtype, name="attn"
        )(h, mask)
        h = h.reshape(Hp // w, Wp // w, w, w, C).transpose(0, 2, 1, 3, 4)
        h = h.reshape(Hp, Wp, C)

        if self.shift > 0:
            h = jnp.roll(h, (self.shift, self.shift), axis=(0, 1))
        h = h[:H, :W]
        x = shortcut + h

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h

    def _shift_mask(self, Hp: int, Wp: int) -> jnp.ndarray:
        """Static additive mask distinguishing the 9 shifted-window regions."""
        w, s = self.window, self.shift
        img = np.zeros((Hp, Wp), np.int32)
        cnt = 0
        for hs in (slice(0, -w), slice(-w, -s), slice(-s, None)):
            for ws in (slice(0, -w), slice(-w, -s), slice(-s, None)):
                img[hs, ws] = cnt
                cnt += 1
        win = img.reshape(Hp // w, w, Wp // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
        diff = win[:, None, :] != win[:, :, None]
        return jnp.asarray(np.where(diff, -100.0, 0.0), dtype=jnp.float32)


class PatchMerging(nn.Module):
    dim: int  # input dim; output is 2*dim
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        H, W, C = x.shape
        pad_h, pad_w = H % 2, W % 2
        x = jnp.pad(x, ((0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w
        # 2×2 neighborhood concat, order (0,0),(1,0),(0,1),(1,1) as in the paper
        x = x.reshape(Hp // 2, 2, Wp // 2, 2, C)
        x = jnp.concatenate(
            [x[:, 0, :, 0], x[:, 1, :, 0], x[:, 0, :, 1], x[:, 1, :, 1]], axis=-1
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin backbone. ``swin_t()`` gives the OpenSeeD configuration."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    patch_size: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """image: [H, W, 3] → tuple of [H/4·2^i, W/4·2^i, C·2^i] maps."""
        H, W, _ = image.shape
        assert H % self.patch_size == 0 and W % self.patch_size == 0
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )(image)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        outs = []
        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            for blk in range(depth):
                x = SwinBlock(
                    dim,
                    self.num_heads[stage],
                    self.window,
                    shift=0 if blk % 2 == 0 else self.window // 2,
                    dtype=self.dtype,
                    name=f"stage{stage}_block{blk}",
                )(x)
            if stage in self.out_indices:
                out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"out_norm{stage}")(x)
                outs.append(out)
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"merge{stage}")(x)
                dim *= 2
        return tuple(outs)


def swin_t(dtype=jnp.float32) -> SwinTransformer:
    return SwinTransformer(dtype=dtype)


def swin_b(dtype=jnp.float32) -> SwinTransformer:
    """Swin-B-384 as in configs/psg/baseline_swin_b.py:13-37."""
    return SwinTransformer(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
        window=12, dtype=dtype,
    )
