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
