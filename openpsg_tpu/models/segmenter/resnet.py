"""ResNet-50 backbone (flax), for the v1/v2/v3 Mask2Former configs.

Reference: configs/psg/baseline_r50.py:26-37 uses mmdet's ResNet-50 with
frozen stage 1, outputting strides 4/8/16/32.  Standard bottleneck
architecture (He et al. 2016).

Norm semantics: mmdet runs the backbone with ``norm_eval=True`` and the
reference freezes it outright (freeze_layers, baseline_r50.py:181), so
BatchNorm is ALWAYS in inference mode — a per-channel affine from running
stats, y = x*scale + shift with scale = w/sqrt(var+eps), shift = b -
mean*scale.  ``FrozenBN`` implements exactly that (the converter folds the
four BN tensors into scale/shift); it must NOT be a LayerNorm, which
normalizes across channels from the data and is value-incompatible with
converted torchvision/mmdet weights.

Padding: torch strided convs pad symmetrically (padding=1 for 3x3/s2);
XLA SAME pads (0, 1) on even inputs — a one-pixel shift.  All strided
convs therefore use explicit torch-style padding.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class FrozenBN(nn.Module):
    """Inference-mode BatchNorm: per-channel scale + shift (running stats
    folded in by the weight converter; identity-initialized for scratch
    training, where it acts as a learnable channel affine)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (ch,))
        shift = self.param("shift", nn.initializers.zeros, (ch,))
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


class Bottleneck(nn.Module):
    out_ch: int        # bottleneck width; block output is 4*out_ch
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = FrozenBN(dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.out_ch, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            use_bias=False, dtype=self.dtype, name="conv2",
        )(h)
        h = FrozenBN(dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(4 * self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(h)
        h = FrozenBN(dtype=self.dtype, name="bn3")(h)
        if residual.shape[-1] != 4 * self.out_ch or self.stride != 1:
            residual = nn.Conv(
                4 * self.out_ch, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample",
            )(residual)
            residual = FrozenBN(dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(h + residual)


class ResNet(nn.Module):
    depths: Sequence[int] = (3, 4, 6, 3)   # ResNet-50
    base_ch: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """image [H, W, 3] → feature maps at strides 4, 8, 16, 32."""
        x = image[None]  # NHWC batch of 1 internally
        x = nn.Conv(
            self.base_ch, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="stem",
        )(x)
        x = FrozenBN(dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        ch = self.base_ch
        for stage, depth in enumerate(self.depths):
            for blk in range(depth):
                stride = 2 if (blk == 0 and stage > 0) else 1
                x = Bottleneck(
                    ch, stride=stride, dtype=self.dtype,
                    name=f"stage{stage}_block{blk}",
                )(x)
            outs.append(x[0])
            ch *= 2
        return tuple(outs)


def resnet50(dtype=jnp.float32) -> ResNet:
    return ResNet(dtype=dtype)
