"""HF Llama checkpoint → our scanned flax param tree.

The reference loads ``meta-llama/Llama-2-7b-hf`` via HF
(relation_transformer_head_v4.py:99-105).  This converter maps an HF
PyTorch state dict onto :class:`openpsg_tpu.models.llm.llama.Llama`:

  * per-layer tensors stack on a leading layer axis (the ``nn.scan``
    layout);
  * ``*.weight`` of torch ``nn.Linear`` is [out, in] → flax kernel
    [in, out] (transpose);
  * HF uses the rotate-half RoPE convention, which is exactly what our
    ``_rope`` implements — weights load unpermuted;
  * ``llm_truncate_num`` truncation = slice the stacked layer axis.

Works from either a loaded ``state_dict``-like mapping of numpy arrays or
a ``.pt``/``.bin``/``.safetensors`` path (torch-cpu / safetensors decode).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from openpsg_tpu.models.llm.llama import LlamaConfig

_LAYER_MAP = {
    "self_attn.q_proj.weight": "wq",
    "self_attn.k_proj.weight": "wk",
    "self_attn.v_proj.weight": "wv",
    "self_attn.o_proj.weight": "wo",
    "mlp.gate_proj.weight": "w_gate",
    "mlp.up_proj.weight": "w_up",
    "mlp.down_proj.weight": "w_down",
}
_LAYER_NORM_MAP = {
    "input_layernorm.weight": "attn_norm",
    "post_attention_layernorm.weight": "ffn_norm",
}


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch / safetensors checkpoint to numpy on host."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def convert_llama(
    state: Mapping[str, np.ndarray],
    cfg: LlamaConfig,
    dtype: Any = None,
) -> Dict[str, Any]:
    """→ params dict for ``LlamaWithEmbeddings`` ({'params': {...}})."""
    import jax.numpy as jnp

    dtype = dtype or cfg.dtype
    prefix = "model." if any(k.startswith("model.") for k in state) else ""

    def get(name):
        arr = np.asarray(state[name])
        return arr

    n = cfg.n_layers
    stacked: Dict[str, Dict[str, np.ndarray]] = {}
    for hf_name, ours in _LAYER_MAP.items():
        per = [
            get(f"{prefix}layers.{i}.{hf_name}").T  # [out,in] -> [in,out]
            for i in range(n)
        ]
        stacked[ours] = {"kernel": np.stack(per, 0)}
    for hf_name, ours in _LAYER_NORM_MAP.items():
        per = [get(f"{prefix}layers.{i}.{hf_name}") for i in range(n)]
        stacked[ours] = {"weight": np.stack(per, 0)}

    params = {
        "tok_embed": {"embedding": get(f"{prefix}embed_tokens.weight")},
        "core": {
            "layers": stacked,
            "final_norm": {"weight": get(f"{prefix}norm.weight")},
            "lm_head": {"kernel": get("lm_head.weight").T},
        },
    }

    def cast(x):
        return jnp.asarray(x, dtype) if np.issubdtype(
            np.asarray(x).dtype, np.floating
        ) else jnp.asarray(x)

    import jax

    return {"params": jax.tree_util.tree_map(cast, params)}


def verify_structure(converted: Dict[str, Any], reference_params: Dict[str, Any]) -> None:
    """Raise if the converted tree's paths/shapes don't match a
    freshly-initialized param tree (catches layout drift early)."""
    import jax

    ref_paths = {
        jax.tree_util.keystr(p): l.shape
        for p, l in jax.tree_util.tree_leaves_with_path(reference_params)
    }
    got_paths = {
        jax.tree_util.keystr(p): l.shape
        for p, l in jax.tree_util.tree_leaves_with_path(converted)
    }
    missing = set(ref_paths) - set(got_paths)
    extra = set(got_paths) - set(ref_paths)
    mismatch = {
        k: (got_paths[k], ref_paths[k])
        for k in set(got_paths) & set(ref_paths)
        if got_paths[k] != ref_paths[k]
    }
    if missing or extra or mismatch:
        raise ValueError(
            f"param layout drift: missing={sorted(missing)} "
            f"extra={sorted(extra)} mismatch={mismatch}"
        )


_META_LAYER_MAP = {
    "attention.wq.weight": "self_attn.q_proj.weight",
    "attention.wk.weight": "self_attn.k_proj.weight",
    "attention.wv.weight": "self_attn.v_proj.weight",
    "attention.wo.weight": "self_attn.o_proj.weight",
    "feed_forward.w1.weight": "mlp.gate_proj.weight",
    "feed_forward.w2.weight": "mlp.down_proj.weight",
    "feed_forward.w3.weight": "mlp.up_proj.weight",
    "attention_norm.weight": "input_layernorm.weight",
    "ffn_norm.weight": "post_attention_layernorm.weight",
}


def meta_llama_to_hf_state(
    state: Mapping[str, np.ndarray],
    n_heads: int,
    n_kv_heads: int,
    prefix: str = "",
) -> Dict[str, np.ndarray]:
    """Meta/original-llama state layout → HF layout for ``convert_llama``.

    The reference's trunk is the original Meta module
    (kings_sgg/models/commons/llama.py: wq/wk/wv/wo, feed_forward
    w1/w2/w3, tok_embeddings/norm/output) with INTERLEAVED RoPE
    (apply_rotary_emb pairs adjacent channels as complex); our Llama —
    like HF — uses the rotate-half convention.  q/k projections are
    therefore permuted exactly as HF's official
    ``convert_llama_weights_to_hf`` does; everything else renames.
    Non-layer keys the Meta module may carry (``freqs_cis`` buffers,
    fairscale shards) are dropped.  Golden-tested against the reference
    module itself (tests/test_head_golden.py)."""

    def permute(w: np.ndarray, heads: int) -> np.ndarray:
        d1, d2 = w.shape
        return (
            w.reshape(heads, d1 // heads // 2, 2, d2)
            .transpose(0, 2, 1, 3)
            .reshape(d1, d2)
        )

    out: Dict[str, np.ndarray] = {}
    for key, val in state.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        v = np.asarray(val)
        if k == "tok_embeddings.weight":
            out["model.embed_tokens.weight"] = v
        elif k == "norm.weight":
            out["model.norm.weight"] = v
        elif k == "output.weight":
            out["lm_head.weight"] = v
        elif k.startswith("layers."):
            _, i, rest = k.split(".", 2)
            hf = _META_LAYER_MAP.get(rest)
            if hf is None:
                continue
            if rest == "attention.wq.weight":
                v = permute(v, n_heads)
            elif rest == "attention.wk.weight":
                v = permute(v, n_kv_heads)
            out[f"model.layers.{i}.{hf}"] = v
    return out
