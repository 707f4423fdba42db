"""Torch-golden VALUE tests for relation heads v1/v2.

Mirrors the reference modules exactly — HF BertModel towers wrapped the
way BertWrapper does (kings_sgg/models/commons/bert_wrapper.py:26-47) +
the reference's Sequential(Linear, LayerNorm) fc blocks — with the
forward transcribed line-for-line from
relation_transformer_head.py:151-191 and
relation_transformer_head_v2.py:184-377.  The torch state_dicts (whose
key names match a real reference checkpoint) convert through
convert_relation_head_v1/v2 and the full forward outputs must agree.

Also pins the two static-shape equivalences our padded layout relies on:
  * key-only attention masking ⇒ padding invariance on valid entries;
  * HF decoder-mode BERT is CAUSAL (is_decoder=True via
    add_cross_attention, get_extended_attention_mask) — the pair tower
    quirk — and causal-over-padded ≡ causal-over-compact because padding
    preserves sub-major pair order.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tfs = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from openpsg_tpu.models.commons.text_encoder import BertStyleConfig
from openpsg_tpu.models.relation.head_v1 import HeadV1Config, RelationHeadV1
from openpsg_tpu.models.relation.head_v2 import HeadV2Config, RelationHeadV2
from openpsg_tpu.models.relation.weight_convert import (
    convert_relation_head_v1,
    convert_relation_head_v2,
)

D0, D, HEADS, LAYERS, INTERM, MAXLEN = 16, 32, 2, 2, 64, 64
R, T, N = 7, 24, 4

ENC_CFG = BertStyleConfig(
    hidden_size=D, num_layers=LAYERS, num_heads=HEADS, intermediate=INTERM,
    vocab_size=64, max_len=MAXLEN,
)


def bert_config(cross: bool) -> "tfs.BertConfig":
    return tfs.BertConfig(
        vocab_size=64, hidden_size=D, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTERM,
        max_position_embeddings=MAXLEN,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        is_decoder=cross, add_cross_attention=cross,
    )


class _Wrap(torch.nn.Module):
    """BertWrapper shim: holds the HF model at attr ``model`` so state_dict
    keys read ``<name>.model.embeddings...`` like the reference's."""

    def __init__(self, m):
        super().__init__()
        self.model = m


def _seq(i, o):
    return torch.nn.Sequential(torch.nn.Linear(i, o), torch.nn.LayerNorm(o))


def _state(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _sub_major_pairs(x):     # [1, N, D0] -> [1, N*N, 2*D0]
    n = x.shape[1]
    rows = [torch.cat([x[0, i], x[0, j]], -1) for i in range(n) for j in range(n)]
    return torch.stack(rows)[None]


# --------------------------------------------------------------------- v1
class TorchHeadV1(torch.nn.Module):
    """relation_transformer_head.py:82-191 (bilinear path, merge 'add')."""

    def __init__(self, cls_qk_size, pred_type):
        super().__init__()
        self.fc_input = _seq(D0, D)
        self.fc_output = _seq(D, D)
        self.model = _Wrap(tfs.BertModel(bert_config(False)))
        self.cls_q = torch.nn.Linear(D, R * cls_qk_size)
        self.cls_k = torch.nn.Linear(D, R * cls_qk_size)
        self.cls_qk_size = cls_qk_size
        self.pred_type = pred_type

    def forward(self, x, mask):
        x = self.fc_input(x)
        pos = torch.ones([1, x.shape[1]], dtype=torch.long)
        h = self.model.model(
            inputs_embeds=x, attention_mask=mask, position_ids=pos
        )["last_hidden_state"]
        h = self.fc_output(h)
        b, n, _ = h.shape
        q = self.cls_q(h).reshape(b, n, R, self.cls_qk_size).permute(0, 2, 1, 3)
        k = self.cls_k(h).reshape(b, n, R, self.cls_qk_size).permute(0, 2, 1, 3)
        if self.pred_type == "attention":
            return q @ k.transpose(2, 3) / self.cls_qk_size ** 0.5
        return torch.einsum("nrsc,nroc->nrso", q, k)


class TestHeadV1Golden:
    @pytest.mark.parametrize("pred_type", ["attention", "einsum"])
    def test_value_parity(self, pred_type):
        torch.manual_seed(0)
        tm = TorchHeadV1(cls_qk_size=8, pred_type=pred_type).eval()
        x = torch.randn(1, N, D0)
        mask = torch.ones(1, N)
        with torch.no_grad():
            want = tm(x, mask).numpy()

        cfg = HeadV1Config(
            encoder=ENC_CFG, input_feature_size=D0, output_feature_size=D,
            num_relation_classes=R, cls_qk_size=8, pred_type=pred_type,
        )
        params = {"params": convert_relation_head_v1(_state(tm), cfg)}
        got = RelationHeadV1(cfg).apply(
            params, jnp.asarray(x.numpy()), jnp.ones((1, N), bool)
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)

    def test_padding_invariance(self):
        torch.manual_seed(0)
        tm = TorchHeadV1(cls_qk_size=8, pred_type="attention").eval()
        cfg = HeadV1Config(
            encoder=ENC_CFG, input_feature_size=D0, output_feature_size=D,
            num_relation_classes=R, cls_qk_size=8,
        )
        params = {"params": convert_relation_head_v1(_state(tm), cfg)}
        head = RelationHeadV1(cfg)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, N, D0)).astype(np.float32)
        out_small = head.apply(params, jnp.asarray(x), jnp.ones((1, N), bool))
        xp = np.concatenate(
            [x, rng.normal(size=(1, 2, D0)).astype(np.float32)], 1
        )
        vm = np.asarray([[True] * N + [False] * 2])
        out_pad = head.apply(params, jnp.asarray(xp), jnp.asarray(vm))
        np.testing.assert_allclose(
            np.asarray(out_pad)[:, :, :N, :N], np.asarray(out_small),
            rtol=2e-4, atol=2e-5,
        )


# --------------------------------------------------------------------- v2
class TorchHeadV2(torch.nn.Module):
    """relation_transformer_head_v2.py:70-181 init / :184-377 forward,
    all five experts + moe."""

    def __init__(self, moe_weight_type):
        super().__init__()
        self.object_level_model = _Wrap(tfs.BertModel(bert_config(False)))
        self.sub_obj_pair_level_model = _Wrap(tfs.BertModel(bert_config(True)))
        self.fc_object_vision_only_input = _seq(D0, D)
        self.fc_object_vision_only_output = _seq(D, D)
        self.object_vision_only_sub_pred = torch.nn.Linear(D, D * R)
        self.object_vision_only_obj_pred = torch.nn.Linear(D, D * R)
        self.fc_pair_vision_only_input = _seq(2 * D0, D)
        self.fc_pair_vision_only_output = _seq(D, D)
        self.pair_vision_only_pred = torch.nn.Linear(D, R)
        self.fc_pair_text_vision_cross_input = _seq(T, D)
        self.fc_pair_vision_prompt_input = _seq(2 * D0, D)
        self.fc_pair_text_vision_cross_output = _seq(D, D)
        self.pair_text_vision_cross_pred = torch.nn.Linear(D, R)
        self.fc_pair_vision_text_cross_input = _seq(2 * D0, D)
        self.fc_pair_text_prompt_input = _seq(T, D)
        self.fc_pair_vision_text_cross_output = _seq(D, D)
        self.pair_vision_text_cross_pred = torch.nn.Linear(D, R)
        self.fc_triplet_vision_text_cross_input = _seq(2 * D0, D)
        self.fc_triplet_text_prompt_input = _seq(T, D)
        self.fc_triplet_vision_text_cross_output = _seq(D, D)
        self.triplet_vision_text_cross_pred = torch.nn.ModuleList(
            [torch.nn.Linear(D, 1) for _ in range(R)]
        )
        self.moe_input_pair_vision = _seq(2 * D0, D)
        self.moe_input_pair_text = _seq(T, D)
        self.moe_input_triplet_text = _seq(T, D)
        out_dim = 5 if moe_weight_type == "v1" else R * 5
        self.moe = torch.nn.Sequential(
            torch.nn.Linear(D, D), torch.nn.LayerNorm(D), torch.nn.ReLU(),
            torch.nn.Linear(D, D), torch.nn.LayerNorm(D), torch.nn.ReLU(),
            torch.nn.Linear(D, out_dim),
        )
        self.moe_weight_type = moe_weight_type

    def forward(self, obj, pair, pair_text, trip_text, pair_mask):
        b, n, _ = obj.shape
        preds = []
        pos0 = torch.zeros(obj.shape[:-1], dtype=torch.long)
        posP = torch.zeros(pair.shape[:-1], dtype=torch.long)
        ttP = torch.zeros_like(posP)

        x = self.fc_object_vision_only_input(obj)
        # NOTE: the reference passes NO attention_mask here (ref :204-207)
        x = self.object_level_model.model(
            inputs_embeds=x, position_ids=pos0
        )["last_hidden_state"]
        x = self.fc_object_vision_only_output(x)
        sub = self.object_vision_only_sub_pred(x).reshape(
            b, n, R, D).permute(0, 2, 1, 3)
        ob = self.object_vision_only_obj_pred(x).reshape(
            b, n, R, D).permute(0, 2, 1, 3)
        preds.append(torch.einsum("nrsc,nroc->nrso", sub, ob))

        p2 = self.fc_pair_vision_only_input(pair)
        h = self.sub_obj_pair_level_model.model(
            inputs_embeds=p2, attention_mask=pair_mask,
            position_ids=posP, token_type_ids=ttP,
        )["last_hidden_state"]
        h = self.fc_pair_vision_only_output(h)
        preds.append(
            self.pair_vision_only_pred(h).permute(0, 2, 1).reshape(-1, R, n, n)
        )

        t3 = self.fc_pair_text_vision_cross_input(pair_text)
        v3 = self.fc_pair_vision_prompt_input(pair)
        h = self.sub_obj_pair_level_model.model(
            inputs_embeds=t3, encoder_hidden_states=v3,
            attention_mask=pair_mask, position_ids=posP, token_type_ids=ttP,
        )["last_hidden_state"]
        h = self.fc_pair_text_vision_cross_output(h)
        preds.append(
            self.pair_text_vision_cross_pred(h).permute(0, 2, 1).reshape(-1, R, n, n)
        )

        v4 = self.fc_pair_vision_text_cross_input(pair)
        t4 = self.fc_pair_text_prompt_input(pair_text)
        h = self.sub_obj_pair_level_model.model(
            inputs_embeds=v4, encoder_hidden_states=t4,
            attention_mask=pair_mask, position_ids=posP, token_type_ids=ttP,
        )["last_hidden_state"]
        h = self.fc_pair_vision_text_cross_output(h)
        preds.append(
            self.pair_vision_text_cross_pred(h).permute(0, 2, 1).reshape(-1, R, n, n)
        )

        v5 = self.fc_triplet_vision_text_cross_input(pair)
        t5 = self.fc_triplet_text_prompt_input(trip_text).reshape(b, -1, R, D)
        outs = []
        for r in range(R):
            h = self.sub_obj_pair_level_model.model(
                inputs_embeds=v5, encoder_hidden_states=t5[:, :, r, :],
                encoder_attention_mask=pair_mask, attention_mask=pair_mask,
                position_ids=posP, token_type_ids=ttP,
            )["last_hidden_state"]
            h = self.fc_triplet_vision_text_cross_output(h)
            outs.append(
                self.triplet_vision_text_cross_pred[r](h).reshape(-1, 1, n, n)
            )
        preds.append(torch.cat(outs, 1))

        mv = self.moe_input_pair_vision(pair)
        mt = self.moe_input_pair_text(pair_text)
        mtr = self.moe_input_triplet_text(trip_text).reshape(b, -1, R, D).mean(2)
        moe_out = self.moe(mv + mt + mtr)
        if self.moe_weight_type == "v1":
            w = torch.softmax(moe_out, -1).permute(0, 2, 1).reshape(b, -1, n, n)
            moe_pred = sum(preds[i] * w[:, i : i + 1] for i in range(5))
        else:
            w = torch.softmax(
                moe_out.reshape(b, n * n, R, -1), -1
            ).permute(0, 3, 2, 1).reshape(b, -1, R, n, n)
            moe_pred = sum(preds[i] * w[:, i] for i in range(5))
        return preds + [moe_pred]


def _v2_cfg(moe_weight_type="v1"):
    return HeadV2Config(
        encoder=ENC_CFG, feature_size=D, num_relation_classes=R,
        text_embedding_size=T,
        experts=(
            "object_vision_only", "pair_vision_only", "pair_text2vision",
            "pair_vision2text", "triplet_text_w_vision",
        ),
        use_moe_gate=True, moe_weight_type=moe_weight_type,
    )


ORDER = (
    "object_vision_only", "pair_vision_only", "pair_text2vision",
    "pair_vision2text", "triplet_text_w_vision", "moe",
)


class TestHeadV2Golden:
    @pytest.mark.parametrize("moe_weight_type", ["v1", "v2"])
    def test_value_parity_all_experts(self, moe_weight_type):
        torch.manual_seed(0)
        tm = TorchHeadV2(moe_weight_type).eval()
        obj = torch.randn(1, N, D0)
        pair = _sub_major_pairs(obj)
        pair_text = torch.randn(1, N * N, T)
        trip_text = torch.randn(1, N * N * R, T)
        pair_mask = torch.ones(1, N * N)
        with torch.no_grad():
            want = [o.numpy() for o in tm(obj, pair, pair_text, trip_text, pair_mask)]

        cfg = _v2_cfg(moe_weight_type)
        params = {"params": convert_relation_head_v2(_state(tm), cfg)}
        got = RelationHeadV2(cfg).apply(
            params,
            jnp.asarray(obj.numpy()),
            jnp.ones((1, N), bool),
            pair_text_embeds=jnp.asarray(pair_text.numpy().reshape(1, N, N, T)),
            triplet_text_embeds=jnp.asarray(
                trip_text.numpy().reshape(1, N, N, R, T)
            ),
        )
        for i, k in enumerate(ORDER):
            np.testing.assert_allclose(
                np.asarray(got[k]), want[i], rtol=5e-4, atol=5e-5,
                err_msg=k,
            )

    def test_padding_invariance(self):
        """Padded static layout ≡ the reference's compact dynamic layout on
        valid entries — including the causal pair tower, whose sub-major
        pair order is preserved under padding."""
        torch.manual_seed(0)
        tm = TorchHeadV2("v1").eval()
        cfg = _v2_cfg("v1")
        params = {"params": convert_relation_head_v2(_state(tm), cfg)}
        head = RelationHeadV2(cfg)
        rng = np.random.default_rng(1)
        obj = rng.normal(size=(1, N, D0)).astype(np.float32)
        pt = rng.normal(size=(1, N, N, T)).astype(np.float32)
        tt = rng.normal(size=(1, N, N, R, T)).astype(np.float32)
        small = head.apply(
            params, jnp.asarray(obj), jnp.ones((1, N), bool),
            pair_text_embeds=jnp.asarray(pt),
            triplet_text_embeds=jnp.asarray(tt),
        )
        M = N + 2
        objp = rng.normal(size=(1, M, D0)).astype(np.float32)
        objp[:, :N] = obj
        ptp = rng.normal(size=(1, M, M, T)).astype(np.float32)
        ptp[:, :N, :N] = pt
        ttp = rng.normal(size=(1, M, M, R, T)).astype(np.float32)
        ttp[:, :N, :N] = tt
        vm = np.asarray([[True] * N + [False] * (M - N)])
        padded = head.apply(
            params, jnp.asarray(objp), jnp.asarray(vm),
            pair_text_embeds=jnp.asarray(ptp),
            triplet_text_embeds=jnp.asarray(ttp),
        )
        for k in ORDER:
            np.testing.assert_allclose(
                np.asarray(padded[k])[:, :, :N, :N], np.asarray(small[k]),
                rtol=5e-4, atol=5e-5, err_msg=k,
            )


# --------------------------------------------------------------------- v3
LLM_D, LLM_LAYERS, DOUT, FORMER = 32, 2, 16, 32


def _hf_llama():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    return LlamaForCausalLM(HFLlamaConfig(
        vocab_size=97, hidden_size=LLM_D, intermediate_size=64,
        num_hidden_layers=LLM_LAYERS, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, attention_dropout=0.0,
        tie_word_embeddings=False,
    )).eval()


def _v3_llm_cfg(causal=True):
    from openpsg_tpu.models.llm.llama import LlamaConfig

    return LlamaConfig(
        vocab_size=97, dim=LLM_D, n_layers=LLM_LAYERS, n_heads=4,
        n_kv_heads=2, ffn_hidden=64, max_seq_len=128, causal=causal,
        dtype=jnp.float32,
    )


class TorchHeadV3Closed(torch.nn.Module):
    """relation_transformer_head_v3.py:104-119 init / :180-193 forward
    (closed vocab, HF Llama trunk standing in for the reference's Meta-
    format trunk — equivalence pinned by TestLlamaHFGolden)."""

    def __init__(self, llama):
        super().__init__()
        self.fc_object_vision_only_input = _seq(D0, LLM_D)
        self.fc_object_vision_only_output = _seq(LLM_D, DOUT)
        self.object_vision_only_sub_pred = torch.nn.Linear(DOUT, DOUT * R)
        self.object_vision_only_obj_pred = torch.nn.Linear(DOUT, DOUT * R)
        self.llama = llama

    def forward(self, x):
        b, n, _ = x.shape
        x = self.fc_object_vision_only_input(x)
        h = self.llama.model(inputs_embeds=x).last_hidden_state
        h = self.fc_object_vision_only_output(h)
        sub = self.object_vision_only_sub_pred(h).reshape(
            b, n, R, DOUT).permute(0, 2, 1, 3)
        obj = self.object_vision_only_obj_pred(h).reshape(
            b, n, R, DOUT).permute(0, 2, 1, 3)
        return torch.einsum("nrsc,nroc->nrso", sub, obj)


class TorchHeadV3OV(torch.nn.Module):
    """:116-159 init / :194-262 forward (open vocab), with the one
    documented bug fix: :229-233 pools ``relation_embedding`` (the LLM's
    relation-segment output), not the shape-incompatible
    ``object_embedding`` the source names (see head_v3.py docstring)."""

    def __init__(self, llama, former_layers):
        super().__init__()
        from transformers import BertConfig as HFBertConfig
        from transformers.models.bert.modeling_bert import BertEncoder

        def former():
            cfg = HFBertConfig(
                hidden_size=FORMER, num_hidden_layers=former_layers,
                num_attention_heads=2, intermediate_size=64,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            )
            # a bare BertEncoder (outside BertModel) needs the attn
            # implementation pinned — from_config normally does this
            cfg._attn_implementation = "eager"
            return BertEncoder(cfg)

        self.o_in_former = former()
        self.o_out_former = former()
        self.r_out_former = former()
        self.fc_object_in_former = _seq(D0, FORMER)
        self.fc_object_former_to_llm = _seq(FORMER, LLM_D)
        self.fc_object_llm_to_former = _seq(LLM_D, FORMER)
        self.fc_object_out_former = _seq(FORMER, DOUT)
        self.fc_relation_llm_to_former = _seq(LLM_D, FORMER)
        self.relation_output_size = DOUT * 2 + 1
        self.fc_relation_out_former = _seq(FORMER, self.relation_output_size)
        self.fc_sub_pred = torch.nn.Linear(DOUT, DOUT)
        self.fc_obj_pred = torch.nn.Linear(DOUT, DOUT)
        self.llama = llama

    def forward(self, x, rel_ids, spans):
        b, n, _ = x.shape
        x = self.fc_object_in_former(x)
        x = self.o_in_former(x).last_hidden_state
        x = self.fc_object_former_to_llm(x)
        rel_emb = self.llama.model.embed_tokens(rel_ids)[None].expand(
            b, -1, -1)
        joint = torch.cat([x, rel_emb], 1)
        h = self.llama.model(inputs_embeds=joint).last_hidden_state
        obj_h, rel_seg = h[:, :n], h[:, n:]
        obj_h = self.fc_object_llm_to_former(obj_h)
        obj_h = self.o_out_former(obj_h).last_hidden_state
        obj_h = self.fc_object_out_former(obj_h)
        rel_m = torch.einsum("rl,bld->brd", spans, rel_seg)
        rel_m = self.fc_relation_llm_to_former(rel_m)
        rel_m = self.r_out_former(rel_m).last_hidden_state
        rel_m = self.fc_relation_out_former(rel_m)
        w, bias = rel_m[..., :-1], rel_m[..., -1]
        sub = self.fc_sub_pred(obj_h)
        obj = self.fc_obj_pred(obj_h)
        pair = torch.cat(
            [
                sub[:, :, None].expand(b, n, n, DOUT),
                obj[:, None, :].expand(b, n, n, DOUT),
            ],
            -1,
        )
        return (
            torch.einsum("bnmp,brp->brnm", pair, w)
            + bias[:, :, None, None]
        )


def _rel_layout():
    """R=7 predicates, 1-3 tokens each, '<|relation|>'-style separator-
    first spans (separator INCLUDED, relation_transformer_head_v3.py:
    94-97, 225-233)."""
    rng = np.random.default_rng(7)
    sep = 96
    ids, starts = [], []
    for r in range(R):
        starts.append(len(ids))
        ids.append(sep)
        ids.extend(rng.integers(1, 90, size=1 + r % 3).tolist())
    L = len(ids)
    span = np.zeros((R, L), np.float32)
    bounds = starts + [L]
    for r in range(R):
        a, b = bounds[r], bounds[r + 1]
        span[r, a:b] = 1.0 / (b - a)
    return np.asarray(ids, np.int64), span


class TestHeadV3Golden:
    def _convert(self, tm, cfg, ov):
        from openpsg_tpu.models.llm.weight_convert import convert_llama
        from openpsg_tpu.models.relation.weight_convert import (
            convert_relation_head_v3,
        )

        params = convert_relation_head_v3(_state(tm), cfg)
        llm = convert_llama(
            {k[len("llama."):]: v for k, v in _state(tm).items()
             if k.startswith("llama.")},
            cfg.llm, dtype=jnp.float32,
        )["params"]
        params["llama"] = llm if ov else llm["core"]
        return {"params": params}

    def test_closed_vocab_value_parity(self):
        from openpsg_tpu.models.relation.head_v3 import (
            HeadV3Config, RelationHeadV3,
        )

        torch.manual_seed(0)
        tm = TorchHeadV3Closed(_hf_llama()).eval()
        x = torch.randn(1, N, D0)
        with torch.no_grad():
            want = tm(x).numpy()

        cfg = HeadV3Config(
            llm=_v3_llm_cfg(causal=True), input_feature_size=D0,
            output_feature_size=DOUT, num_relation_classes=R,
        )
        params = self._convert(tm, cfg, ov=False)
        got = RelationHeadV3(cfg).apply(
            params, jnp.asarray(x.numpy()), jnp.ones((1, N), bool)
        )
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=2e-4, atol=2e-4
        )

    @pytest.mark.parametrize("former_layers", [1])
    def test_open_vocab_value_parity(self, former_layers):
        from openpsg_tpu.models.relation.head_v3 import (
            HeadV3Config, RelationHeadV3,
        )

        torch.manual_seed(0)
        tm = TorchHeadV3OV(_hf_llama(), former_layers).eval()
        ids, spans = _rel_layout()
        x = torch.randn(1, N, D0)
        with torch.no_grad():
            want = tm(
                x, torch.tensor(ids), torch.tensor(spans)
            ).numpy()

        cfg = HeadV3Config(
            llm=_v3_llm_cfg(causal=True), input_feature_size=D0,
            former_feature_size=FORMER, output_feature_size=DOUT,
            num_relation_classes=R, ov_relation=True,
            num_object_in_layers=former_layers,
            num_object_out_layers=former_layers,
            num_relation_out_layers=former_layers,
            former_heads=2, former_intermediate=64,
        )
        params = self._convert(tm, cfg, ov=True)
        got = RelationHeadV3(cfg).apply(
            params, jnp.asarray(x.numpy()), jnp.ones((1, N), bool),
            relation_token_ids=jnp.asarray(ids.astype(np.int32)),
            relation_spans=jnp.asarray(spans),
        )
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=5e-4, atol=5e-4
        )

    def test_ov_padding_invariance(self):
        """Padded static layout ≡ compact on valid entries — pins the
        restarted relation-segment RoPE positions (positions continue
        from the VALID object count, not the padded one)."""
        from openpsg_tpu.models.relation.head_v3 import (
            HeadV3Config, RelationHeadV3,
        )

        torch.manual_seed(0)
        tm = TorchHeadV3OV(_hf_llama(), 1).eval()
        ids, spans = _rel_layout()
        cfg = HeadV3Config(
            llm=_v3_llm_cfg(causal=True), input_feature_size=D0,
            former_feature_size=FORMER, output_feature_size=DOUT,
            num_relation_classes=R, ov_relation=True,
            num_object_in_layers=1, num_object_out_layers=1,
            num_relation_out_layers=1,
            former_heads=2, former_intermediate=64,
        )
        params = self._convert(tm, cfg, ov=True)
        head = RelationHeadV3(cfg)
        jids = jnp.asarray(ids.astype(np.int32))
        jspans = jnp.asarray(spans)
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, N, D0)).astype(np.float32)
        small = head.apply(
            params, jnp.asarray(x), jnp.ones((1, N), bool),
            relation_token_ids=jids, relation_spans=jspans,
        )
        xp = np.concatenate(
            [x, rng.normal(size=(1, 2, D0)).astype(np.float32)], 1
        )
        vm = np.asarray([[True] * N + [False] * 2])
        padded = head.apply(
            params, jnp.asarray(xp), jnp.asarray(vm),
            relation_token_ids=jids, relation_spans=jspans,
        )
        np.testing.assert_allclose(
            np.asarray(padded)[:, :, :N, :N], np.asarray(small),
            rtol=5e-4, atol=5e-4,
        )


# --------------------------------------------------------------------- v4
class TorchHeadV4(torch.nn.Module):
    """relation_transformer_head_v4.py:75-105 init / :143-220 forward
    (the trainable inference slice: PatchEmbed → Q-Former over all pairs
    → existence classifiers + language projection).  PatchEmbed is
    timm's (proj conv + flatten, norm=Identity, :75-76) transcribed —
    timm is absent in this env but the state-dict keys match."""

    QD, C, PS, QN, T = 32, 16, 4, 3, 6

    def __init__(self):
        super().__init__()
        from transformers import InstructBlipQFormerConfig
        from transformers.models.instructblip.modeling_instructblip import (
            InstructBlipQFormerModel,
        )

        class _PatchEmbed(torch.nn.Module):
            def __init__(self, c, e, p):
                super().__init__()
                self.proj = torch.nn.Conv2d(c, e, p, stride=p)

            def forward(self, x):
                return self.proj(x).flatten(2).transpose(1, 2)

        self.patch_embed = _PatchEmbed(self.C, self.C, self.PS)
        self.relation_qformer = InstructBlipQFormerModel(
            InstructBlipQFormerConfig(
                vocab_size=64, hidden_size=self.QD, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=64,
                encoder_hidden_size=self.C, cross_attention_frequency=1,
                max_position_embeddings=32,
                attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
            )
        )
        self.relation_query = torch.nn.Parameter(
            torch.randn(1, self.QN, self.QD))
        self.rel_cls_query = torch.nn.Parameter(
            torch.randn(1, 1, self.QD))
        self.binary_rel_cls_pred = torch.nn.Linear(self.QD, 1)
        self.multiclass_rel_cls_pred = torch.nn.Linear(self.QD, R)
        self.language_projection = torch.nn.Linear(self.QD, 24)

    def forward(self, feat, pair_masks, input_ids, input_mask):
        NP = pair_masks.shape[0]
        patches = self.patch_embed(feat)                   # [1, P, C]
        query = torch.cat(
            [
                self.rel_cls_query.expand(NP, -1, -1),
                self.relation_query.expand(NP, -1, -1),
            ],
            1,
        )
        attn = torch.cat(
            [torch.ones(NP, query.shape[1]), input_mask.float()], 1
        )
        out = self.relation_qformer(
            input_ids=input_ids,
            attention_mask=attn,
            query_embeds=query,
            encoder_hidden_states=patches.expand(NP, -1, -1),
            encoder_attention_mask=pair_masks.float(),
        ).last_hidden_state[:, : query.shape[1]]
        cls = out[:, 0]
        return (
            self.binary_rel_cls_pred(cls)[:, 0],
            self.multiclass_rel_cls_pred(cls),
            self.language_projection(out[:, 1:]),
        )


class TestHeadV4Golden:
    def test_value_parity(self):
        from openpsg_tpu.models.relation.head_v4 import (
            HeadV4Config, RelationHeadV4,
        )
        from openpsg_tpu.models.relation.qformer import QFormerConfig
        from openpsg_tpu.models.relation.weight_convert import (
            convert_relation_head_v4,
        )

        torch.manual_seed(0)
        tm = TorchHeadV4().eval()
        C, PS, QD, QN, T = tm.C, tm.PS, tm.QD, tm.QN, tm.T
        M = 3
        hp = wp = 4
        H4 = hp * PS

        rng = np.random.default_rng(0)
        feat = rng.normal(size=(H4, H4, C)).astype(np.float32)
        # blockwise-constant object masks: any downsampling scheme
        # (bilinear ours, nearest the reference's) agrees on them
        pm_small = rng.random((M, hp, wp)) > 0.4
        pm_small[:, 0, 0] = True                  # no empty masks
        obj_masks = np.kron(
            pm_small, np.ones((PS, PS), bool)
        )                                         # [M, H4, W4]
        NP = M * M
        flat = pm_small.reshape(M, hp * wp)
        pair_masks = np.stack(
            [flat[i] | flat[j] for i in range(M) for j in range(M)], 0
        )
        ids = rng.integers(1, 64, (NP, T)).astype(np.int64)
        tmask = np.ones((NP, T), bool)
        tmask[:, 4:] = False

        with torch.no_grad():
            want_b, want_m, want_v = tm(
                torch.tensor(feat).permute(2, 0, 1)[None],
                torch.tensor(pair_masks),
                torch.tensor(ids),
                torch.tensor(tmask),
            )

        cfg = HeadV4Config(
            qformer=QFormerConfig(
                hidden_size=QD, num_layers=2, num_heads=2, intermediate=64,
                encoder_hidden_size=C, num_relation_queries=QN,
                vocab_size=64, max_text_len=T,
            ),
            patch_size=PS, object_feature_size=C, num_relation_classes=R,
            max_object_num=M, max_objects_padded=M, llm_feature_size=24,
        )
        params = {"params": convert_relation_head_v4(_state(tm), cfg)}
        out = RelationHeadV4(cfg).apply(
            params,
            jnp.asarray(feat),
            jnp.asarray(obj_masks),
            jnp.ones((M,), bool),
            jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(tmask),
        )
        np.testing.assert_allclose(
            np.asarray(out["binary_logits"]), want_b.numpy(),
            rtol=2e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["multiclass_logits"]), want_m.numpy(),
            rtol=2e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["llm_visual_tokens"]), want_v.numpy(),
            rtol=2e-4, atol=2e-5,
        )


# ------------------------------------------------------- fusion (v1 prompt)
class TorchGraphTransformer(torch.nn.Module):
    """kings_sgg/models/commons/graph_transformer.py:6-22 (torch's own
    TransformerDecoder is the reference dependency — used directly)."""

    def __init__(self, d):
        super().__init__()
        layer = torch.nn.TransformerDecoderLayer(
            d_model=d, nhead=8, batch_first=True)
        self.edge2node_decoder = torch.nn.TransformerDecoder(layer, 3)
        self.node2edge_decoder = torch.nn.TransformerDecoder(layer, 3)

    def forward(self, node_embed, edge_embed):
        b = node_embed.shape[0]
        edge_embed = edge_embed.repeat(b, 1, 1)
        node_embed = self.edge2node_decoder(node_embed, edge_embed)
        edge_embed = self.node2edge_decoder(edge_embed, node_embed)
        return node_embed, edge_embed.mean(dim=0)


class _RefTorchMLP(torch.nn.Module):
    """interactive_fusion_module.py:71-80 — fc1 → LayerNorm('act') → fc2."""

    def __init__(self, i, h, o):
        super().__init__()
        self.fc1 = torch.nn.Linear(i, h)
        self.fc2 = torch.nn.Linear(h, o)
        self.act = torch.nn.LayerNorm(h)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class TorchFusion(torch.nn.Module):
    """interactive_fusion_module.py:8-68 transcribed."""

    def __init__(self, pred_type, do, de, dq, graph):
        super().__init__()
        self.pred_type = pred_type
        self.graph = graph
        if graph:
            self.fc_node = torch.nn.Linear(do, dq)
            self.fc_edge = torch.nn.Linear(de, dq)
            self.graph_transformer = TorchGraphTransformer(dq)
            self.cls_s = _RefTorchMLP(dq, dq * 2, dq)
            self.cls_o = _RefTorchMLP(dq, dq * 2, dq)
            self.cls_r = _RefTorchMLP(dq, dq * 2, dq)
        else:
            self.cls_s = torch.nn.Linear(do, dq)
            self.cls_o = torch.nn.Linear(do, dq)
            self.cls_r = torch.nn.Linear(de, dq)
        if pred_type == "attention":
            self.fc_q = _RefTorchMLP(dq, dq * 2, dq)
            self.fc_k = _RefTorchMLP(dq, dq * 2, dq)

    def forward(self, node_embed, edge_embed):
        if self.graph:
            node_embed = self.fc_node(node_embed)
            edge_embed = self.fc_edge(edge_embed)
            node_embed, edge_embed = self.graph_transformer(
                node_embed, edge_embed)
        sub = self.cls_s(node_embed)
        obj = self.cls_o(node_embed)
        rel = self.cls_r(edge_embed)
        if self.pred_type == "attention":
            so = torch.einsum("nsc,noc->nsoc", sub, obj)
            b, s, o, c = so.shape
            so = so.reshape(b, s * o, c)
            r = rel.unsqueeze(0).repeat(b, 1, 1)
            so = self.fc_q(so)
            r = self.fc_k(r)
            pred = so @ r.transpose(1, 2) / c ** 0.5
            return pred.reshape(b, s, o, -1).permute(0, 3, 1, 2)
        if self.pred_type == "einsum":
            return torch.einsum("nsc,noc,rc->nrso", sub, obj, rel)
        tmp = torch.einsum("nsc,noc->nsoc", sub, obj)
        pred = torch.einsum("nsoc,rc->nrso", tmp, rel)
        if self.pred_type == "einsum_v2":
            gate = torch.einsum("nsc,noc->nso", sub, obj).sigmoid()
            pred = pred * gate.unsqueeze(1)
        return pred


class TestFusionGolden:
    @pytest.mark.parametrize(
        "mode", ["attention", "einsum", "einsum_v1", "einsum_v2"])
    @pytest.mark.parametrize("graph", [False, True])
    def test_value_parity(self, mode, graph):
        from openpsg_tpu.models.commons.interactive_fusion import (
            InteractiveFusionModule,
        )
        from openpsg_tpu.models.commons.weight_convert import (
            convert_interactive_fusion,
        )

        DO, DE, DQ = 24, 12, 16
        torch.manual_seed(0)
        tm = TorchFusion(mode, DO, DE, DQ, graph).eval()
        nodes = torch.randn(1, N, DO)
        edges = torch.randn(R, DE)
        with torch.no_grad():
            want = tm(nodes, edges).numpy()

        params = convert_interactive_fusion(
            _state(tm), "", pred_type=mode, output_size=DQ
        )
        m = InteractiveFusionModule(
            pred_type=mode, output_size=DQ, use_graph_transformer=graph
        )
        got = m.apply(
            {"params": params},
            jnp.asarray(nodes.numpy()), jnp.asarray(edges.numpy()),
        )
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=5e-4, atol=5e-5
        )


# --------------------------------------------- learnable prompts (v1 path)
class TestLearnablePromptsGolden:
    def test_splice_matches_hf_semantics(self):
        """Per-row learnable prompts splice AFTER the embeddings module
        (past BERT's embedding LayerNorm, no position rows) between CLS
        and the text — bert_with_learnable_embeds.py:133-141.  Mirrored
        with HF BertModel components directly."""
        from openpsg_tpu.models.commons.weight_convert import convert_bert

        torch.manual_seed(0)
        hf = tfs.BertModel(bert_config(False)).eval()
        Rr, L, P = 3, 6, 2
        rng = np.random.default_rng(0)
        ids = rng.integers(1, 64, (Rr, L)).astype(np.int64)
        prompts = rng.normal(size=(Rr, P, D)).astype(np.float32)
        mask = np.ones((Rr, L), bool)
        mask[0, 4:] = False

        with torch.no_grad():
            emb = hf.embeddings(input_ids=torch.tensor(ids))
            spliced = torch.cat(
                [emb[:, :1], torch.tensor(prompts), emb[:, 1:]], 1
            )
            am = torch.cat(
                [
                    torch.tensor(mask[:, :1], dtype=torch.float32),
                    torch.ones(Rr, P),
                    torch.tensor(mask[:, 1:], dtype=torch.float32),
                ],
                1,
            )
            ext = hf.get_extended_attention_mask(am, spliced.shape[:2])
            seq = hf.encoder(spliced, attention_mask=ext).last_hidden_state
            want = hf.pooler(seq).numpy()

        from openpsg_tpu.models.commons.text_encoder import BertStyleEncoder

        params = {"params": convert_bert(
            {k: v.numpy() for k, v in hf.state_dict().items()}, ENC_CFG
        )}
        got = BertStyleEncoder(ENC_CFG).apply(
            params,
            token_ids=jnp.asarray(ids.astype(np.int32)),
            attention_mask=jnp.asarray(mask),
            learnable_embeds=jnp.asarray(prompts),
            pool=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=2e-4, atol=2e-5
        )
