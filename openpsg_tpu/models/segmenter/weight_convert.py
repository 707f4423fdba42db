"""Torch segmenter checkpoints → our flax param trees.

Covers the Swin backbone (standard microsoft/Swin layout, used by both
OpenSeeD's Swin-T and mmdet's Swin-B) and documents the mapping surface
for the OpenSeeD/MaskDINO trunk.  The published OpenSeeD checkpoint
(``model_state_dict_swint_51.2ap.pt``, configs/psg/baseline_v4_ov.py:55)
is not present in this environment; the converter is validated
structurally against synthetic state dicts with the canonical tensor
names (tests/test_weight_convert.py) so real checkpoints slot in without
layout drift.

Swin name map (torch → ours):
  patch_embed.proj.{weight,bias}        → patch_embed kernel [k,k,in,out] (OIHW→HWIO) / bias
  patch_embed.norm.*                    → patch_norm
  layers.{s}.blocks.{b}.norm1/2         → stage{s}_block{b}.norm1/2
  ...attn.qkv / attn.proj               → ...attn.qkv / attn.proj ([out,in]→[in,out])
  ...attn.relative_position_bias_table  → ...attn.rel_pos_bias
  ...mlp.fc1/fc2                        → ...mlp_fc1 / mlp_fc2
  layers.{s}.downsample.reduction/norm  → merge{s}.reduction / norm
  norm{s} (out norms)                   → out_norm{s}
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _t(a):  # torch Linear [out, in] -> flax kernel [in, out]
    return np.asarray(a).T


def _conv(a):  # torch Conv OIHW -> flax HWIO
    return np.asarray(a).transpose(2, 3, 1, 0)


def convert_swin(
    state: Mapping[str, np.ndarray],
    prefix: str = "",
    depths=(2, 2, 6, 2),
) -> Dict[str, Any]:
    """→ params dict matching ``SwinTransformer`` (module 'backbone')."""
    g = lambda k: np.asarray(state[prefix + k])
    out: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _conv(g("patch_embed.proj.weight")),
            "bias": g("patch_embed.proj.bias"),
        },
        "patch_norm": {
            "scale": g("patch_embed.norm.weight"),
            "bias": g("patch_embed.norm.bias"),
        },
    }
    for s, depth in enumerate(depths):
        for b in range(depth):
            p = f"layers.{s}.blocks.{b}."
            blk = {
                "norm1": {"scale": g(p + "norm1.weight"), "bias": g(p + "norm1.bias")},
                "norm2": {"scale": g(p + "norm2.weight"), "bias": g(p + "norm2.bias")},
                "attn": {
                    "qkv": {"kernel": _t(g(p + "attn.qkv.weight")),
                            "bias": g(p + "attn.qkv.bias")},
                    "proj": {"kernel": _t(g(p + "attn.proj.weight")),
                             "bias": g(p + "attn.proj.bias")},
                    "rel_pos_bias": g(p + "attn.relative_position_bias_table"),
                },
                "mlp_fc1": {"kernel": _t(g(p + "mlp.fc1.weight")),
                            "bias": g(p + "mlp.fc1.bias")},
                "mlp_fc2": {"kernel": _t(g(p + "mlp.fc2.weight")),
                            "bias": g(p + "mlp.fc2.bias")},
            }
            out[f"stage{s}_block{b}"] = blk
        if s < len(depths) - 1 and prefix + f"layers.{s}.downsample.reduction.weight" in state:
            out[f"merge{s}"] = {
                "reduction": {"kernel": _t(g(f"layers.{s}.downsample.reduction.weight"))},
                "norm": {"scale": g(f"layers.{s}.downsample.norm.weight"),
                         "bias": g(f"layers.{s}.downsample.norm.bias")},
            }
    # out norms: checkpoints name them norm0..norm3 or norm
    for s in range(len(depths)):
        for cand in (f"norm{s}.weight", "norm.weight" if s == len(depths) - 1 else None):
            if cand and prefix + cand in state:
                base = cand[: -len(".weight")]
                out[f"out_norm{s}"] = {
                    "scale": g(base + ".weight"), "bias": g(base + ".bias"),
                }
                break
    return out


def detect_swin_prefix(state: Mapping[str, np.ndarray]) -> str:
    """Find the backbone prefix in a composite checkpoint."""
    for k in state:
        m = re.match(r"^(.*?)patch_embed\.proj\.weight$", k)
        if m:
            return m.group(1)
    raise KeyError("no swin patch_embed found in state dict")
