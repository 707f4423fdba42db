"""Mask2Former-family relation detectors (v1 / v2 / v3 model generations).

Reference orchestrators:
  * Mask2FormerRelation   (v1) — kings_sgg/models/detectors/mask2former_relation.py
  * Mask2FormerRelationV2 (v2) — .../mask2former_relation_v2.py (adds pair/
    triplet text features from offline KV stores)
  * OpenSeeDRelation      (v3) — .../openseed_relation.py (OpenSeeD
    segmenter + LLaMA-trunk head)

Shared machinery, re-designed as ONE jitted per-image program:
  segmenter → softmax-void panoptic fusion (global thing counter, mmdet
  style) → object selection → mask-pooled object tokens + class embedding
  (cat/add, reference _get_input :251-317) → dense relation head →
  inference triplet extraction (diag -9999; per-loss-type transform —
  softmax over relations / sigmoid / **exp** for v1; × subject × object
  scores; top-100 flattened rel-major, :466-508).

The v2 text matrices are looked up host-side once per image
(openpsg_tpu.data.text_kv) and enter the jit as dense arrays.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openpsg_tpu.core.registry import DETECTORS
from openpsg_tpu.data.vocab import (
    INSTANCE_OFFSET,
    NUM_THING_CLASSES,
    OBJECT_CLASSES,
    RELATION_CLASSES,
)
from openpsg_tpu.models.relation.head_v1 import HeadV1Config, RelationHeadV1
from openpsg_tpu.models.relation.head_v2 import HeadV2Config, RelationHeadV2
from openpsg_tpu.models.relation.head_v3 import (
    HeadV3Config,
    RelationHeadV3,
    build_relation_token_layout,
)
from openpsg_tpu.models.relation.tokenizer import build_prompt_tokenizer
from openpsg_tpu.models.segmenter.fusion import panoptic_fusion
from openpsg_tpu.models.segmenter.mask2former import (
    Mask2FormerConfig,
    Mask2FormerSegmenter,
)
from openpsg_tpu.models.segmenter.openseed import normalize_image
from openpsg_tpu.ops.mask_ops import mask_pool

@dataclasses.dataclass(frozen=True)
class M2FRelationConfig:
    segmenter: Mask2FormerConfig = Mask2FormerConfig()
    head_version: str = "v1"            # v1 | v2 | v3
    head_v1: HeadV1Config = HeadV1Config()
    head_v2: HeadV2Config = HeadV2Config()
    head_v3: HeadV3Config = HeadV3Config()
    max_objects: int = 30               # v1 pads/limits to 30 tokens
    max_objects_padded: int = 32
    merge_cls_type: str = "add"         # cat | add (reference _get_input)
    # optional v1 token embellishments (reference mask2former_relation.py
    # :111-199, 289-315; every shipping reference config disables them —
    # baseline_r50.py:162-163 — but the switches are part of the surface)
    embedding_add_cls: bool = True
    use_positional_encoding: bool = False   # mask-pooled SinePositionalEncoding
    use_background_feature: bool = False    # inverse-mask pooled feature added
    # chunked mask pooling: S tokens per object on the GT-train path
    # (reference `_mask_pooling(output_size=S)`; the detector hardcodes 1
    # at mask2former_relation.py:47 — >1 is the latent module surface)
    object_token_size: int = 1
    object_mask_thr: float = 0.8        # mmdet fusion defaults
    iou_thr: float = 0.8
    input_hw: Optional[Tuple[int, int]] = None

    @staticmethod
    def tiny_test(head_version: str = "v1") -> "M2FRelationConfig":
        return M2FRelationConfig(
            segmenter=Mask2FormerConfig.tiny_test(),
            head_version=head_version,
            head_v1=HeadV1Config.tiny_test(),
            head_v2=HeadV2Config.tiny_test(),
            head_v3=HeadV3Config.tiny_test(),
            max_objects=6, max_objects_padded=8, input_hw=(64, 64),
        )


@DETECTORS.register_module(name="Mask2FormerRelation")
@DETECTORS.register_module(name="Mask2FormerRelationV2")
@DETECTORS.register_module(name="OpenSeeDRelation")
class PSGMask2FormerRelation:
    """v1/v2/v3 pipeline: panoptic segmenter + dense relation scores."""

    def __init__(
        self,
        cfg: M2FRelationConfig,
        rng: jax.Array,
        class_names: Optional[List[str]] = None,
        relation_names: Optional[List[str]] = None,
        num_things: Optional[int] = None,
        text_kv=None,                     # openpsg_tpu.data.text_kv.TextKVStore
    ):
        self.cfg = cfg
        self.class_names = class_names or OBJECT_CLASSES
        self.relation_names = relation_names or RELATION_CLASSES
        self.num_things = num_things if num_things is not None else NUM_THING_CLASSES
        self.text_kv = text_kv

        if (cfg.use_positional_encoding or cfg.use_background_feature) and (
            cfg.embedding_add_cls and cfg.merge_cls_type == "cat"
        ):
            # the reference ADDS the D-wide PE/background vector to the
            # token after the cls merge — with 'cat' (2D-wide tokens) that
            # addition is a shape error in torch too
            # (mask2former_relation.py:297-315); fail loudly at build
            raise ValueError(
                "positional_encoding/use_background_feature require "
                "merge_cls_type='add' (or embedding_add_cls=False)"
            )
        if cfg.object_token_size > 1 and cfg.head_version != "v1":
            raise ValueError(
                "object_token_size > 1 is a v1 GT-train surface "
                "(reference hardcodes 1, mask2former_relation.py:47)"
            )

        # v2 text features: the reference looks up dbm KVs per predicted
        # pair INSIDE forward (mask2former_relation_v2.py:345-354, a host
        # round-trip per image).  TPU design: the full [num_classes²] pair
        # matrix is materialized ONCE at init (~17k lookups, ≈100 MB for
        # ada-002 width) and pairs gather from it by class label inside
        # the jit — no host crossings, open set unchanged (missing keys
        # are zero rows, the reference's fallback).
        self.pair_text_matrix = None
        if text_kv is not None and cfg.head_version == "v2" and (
            cfg.head_v2.use_moe_gate
            or {"pair_text2vision", "pair_vision2text"}
            & set(cfg.head_v2.experts)
        ):
            self.pair_text_matrix = jnp.asarray(
                text_kv.pair_matrix(self.class_names)
            )  # [K, K, T]

        # v2 triplet text: the dense [K, K, R, T] matrix is ~6 GB, so the
        # store is compacted to (lookup [K,K,R] int32, table [rows+1, T])
        # at init and the head gathers per-image rows by predicted/GT class
        # labels inside the jit (reference lookup loop:
        # mask2former_relation_v2.py:345-354, a 50k-pickle host loop per
        # image; missing keys → zero row).  The MoE gate consumes triplet
        # text even when the triplet expert is off (ref :345-355).
        self.triplet_lookup = None
        self.triplet_table = None
        if text_kv is not None and cfg.head_version == "v2" and (
            cfg.head_v2.use_moe_gate
            or "triplet_text_w_vision" in cfg.head_v2.experts
        ):
            lut, tab = text_kv.triplet_index(
                self.class_names, self.relation_names
            )
            self.triplet_lookup = jnp.asarray(lut)   # [K, K, R]
            self.triplet_table = jnp.asarray(tab)    # [rows+1, T]

        self.segmenter = Mask2FormerSegmenter(
            dataclasses.replace(cfg.segmenter, num_classes=len(self.class_names))
        )
        self.sem_token_ids = None
        self.sem_token_mask = None
        if cfg.head_version == "v1":
            if cfg.head_v1.use_relation_prompts:
                # predicate-prompt path: descriptions → tokens once at init;
                # the head's sem_encoder trains end-to-end (reference
                # relation_transformer_head.py:54, 193-205)
                from openpsg_tpu.data.predicate_descriptions import get_descriptions
                from openpsg_tpu.models.relation.tokenizer import WordTokenizer

                texts = get_descriptions(
                    cfg.head_v1.semantic_type, self.relation_names
                )
                sem_tok = WordTokenizer(texts)
                ids, msk = sem_tok.encode_batch(
                    texts, max_len=cfg.head_v1.encoder.max_len
                )
                self.sem_token_ids = jnp.asarray(ids)
                self.sem_token_mask = jnp.asarray(msk)
                enc = dataclasses.replace(
                    cfg.head_v1.encoder,
                    vocab_size=max(cfg.head_v1.encoder.vocab_size,
                                   sem_tok.vocab_size),
                )
                cfg = dataclasses.replace(
                    cfg, head_v1=dataclasses.replace(cfg.head_v1, encoder=enc)
                )
                self.cfg = cfg
            self.head = RelationHeadV1(cfg.head_v1)
        elif cfg.head_version == "v2":
            self.head = RelationHeadV2(cfg.head_v2)
        elif cfg.head_version == "v3":
            self.head = RelationHeadV3(cfg.head_v3)
            self.tokenizer = build_prompt_tokenizer()
            ids, spans = build_relation_token_layout(
                self.tokenizer, self.relation_names
            )
            self.rel_token_ids = jnp.asarray(ids)
            self.rel_spans = jnp.asarray(spans)
        else:
            raise ValueError(cfg.head_version)

        self.params = self._init_params(rng)

    # ------------------------------------------------------------------ init
    def load_segmenter_weights(self, path: str) -> None:
        """Load converted Mask2Former trunk weights (the reference's
        ``load_from`` of mmdet's published COCO-panoptic checkpoint,
        configs/psg/baseline_r50.py:3).

        Accepts the ``segmenter.msgpack`` written by
        tools/convert_mask2former.py, or a raw mmdet ``.pth`` converted
        on the fly."""
        import numpy as np

        if path.endswith((".pt", ".pth")):
            import torch

            from openpsg_tpu.models.segmenter.weight_convert import (
                convert_mask2former,
            )

            state = torch.load(path, map_location="cpu", weights_only=False)
            if isinstance(state, dict) and "state_dict" in state:
                state = state["state_dict"]
            state = {k: np.asarray(v) for k, v in state.items()}
            params = convert_mask2former(state, self.segmenter.cfg)
            tree = {"params": params}
            jax.tree_util.tree_map(   # structure check vs initialized tree
                lambda a, b: None, tree,
                jax.tree_util.tree_map(np.asarray, self.params["segmenter"]),
            )
        else:
            from flax import serialization

            with open(path, "rb") as f:
                tree = serialization.from_bytes(
                    self.params["segmenter"], f.read()
                )
        self.params["segmenter"] = jax.tree_util.tree_map(jnp.asarray, tree)

    def _model_hw(self) -> Tuple[int, int]:
        return tuple(self.cfg.input_hw) if self.cfg.input_hw else (1344, 1344)

    def _head_apply(self, head_params, tokens, valid, extra):
        c = self.cfg
        if c.head_version == "v1":
            return self.head.apply(
                head_params, tokens[None], valid[None],
                semantic_embeds=extra.get("semantic_embeds"),
                semantic_token_ids=self.sem_token_ids,
                semantic_token_mask=self.sem_token_mask,
            )[0]
        if c.head_version == "v2":
            out = self.head.apply(
                head_params, tokens[None], valid[None],
                pair_text_embeds=extra.get("pair_text"),
                triplet_text_embeds=extra.get("triplet_text"),
            )
            # reference inference: LAST enabled expert wins, moe overrides
            # (mask2former_relation_v2.py:789-800)
            return RelationHeadV2.primary(out)[0]
        return self.head.apply(
            head_params, tokens[None], valid[None],
            relation_token_ids=self.rel_token_ids,
            relation_spans=self.rel_spans,
        )[0]

    def _init_params(self, rng):
        c = self.cfg
        k_seg, k_head, k_cls = jax.random.split(rng, 3)
        H, W = self._model_hw()
        seg_params = jax.jit(self.segmenter.init)(
            k_seg, jnp.zeros((H, W, 3), jnp.float32)
        )

        M = c.max_objects_padded
        feat = self._token_dim()
        tokens0 = jnp.zeros((M, feat))
        valid0 = jnp.zeros((M,), bool)
        extra = self._zero_extra(M)
        head_params = jax.jit(
            lambda k: self._head_init(k, tokens0, valid0, extra)
        )(k_head)

        cls_embed = jax.random.normal(
            k_cls, (len(self.class_names), self.cfg.segmenter.mask_dim)
        ) * 0.02
        return {
            "segmenter": seg_params,
            "head": head_params,
            "object_cls_embed": cls_embed,
        }

    def _token_dim(self) -> int:
        d = self.cfg.segmenter.mask_dim
        return 2 * d if self.cfg.merge_cls_type == "cat" else d

    def _zero_extra(self, M):
        c = self.cfg
        extra = {}
        if c.head_version == "v2":
            h2 = c.head_v2
            T = h2.text_embedding_size
            # the MoE gate consumes pair + triplet text even when those
            # experts are off (relation_transformer_head_v2.py:342-355)
            if h2.use_moe_gate or (
                {"pair_text2vision", "pair_vision2text"} & set(h2.experts)
            ):
                extra["pair_text"] = jnp.zeros((1, M, M, T))
            if "triplet_text_w_vision" in h2.experts:
                # per-relation triplet text [1, M, M, R, T]
                extra["triplet_text"] = jnp.zeros(
                    (1, M, M, h2.num_relation_classes, T)
                )
            elif h2.use_moe_gate:
                extra["triplet_text"] = jnp.zeros((1, M, M, T))
        return extra

    def _head_init(self, k, tokens, valid, extra):
        c = self.cfg
        if c.head_version == "v1":
            return self.head.init(
                k, tokens[None], valid[None],
                semantic_embeds=extra.get("semantic_embeds"),
                semantic_token_ids=self.sem_token_ids,
                semantic_token_mask=self.sem_token_mask,
            )
        if c.head_version == "v2":
            return self.head.init(
                k, tokens[None], valid[None],
                pair_text_embeds=extra.get("pair_text"),
                triplet_text_embeds=extra.get("triplet_text"),
            )
        return self.head.init(
            k, tokens[None], valid[None],
            relation_token_ids=self.rel_token_ids,
            relation_spans=self.rel_spans,
        )

    # ------------------------------------------------------------- inference
    @functools.partial(jax.jit, static_argnums=0)
    def _infer_jit(self, params, image_u8, img_hw):
        c = self.cfg
        M = c.max_objects_padded
        image = normalize_image(image_u8)
        seg_out = self.segmenter.apply(params["segmenter"], image)

        H, W = image.shape[:2]
        masks = jax.image.resize(
            seg_out["masks"], (seg_out["masks"].shape[0], H, W), method="bilinear"
        )
        yy = jnp.arange(H)[:, None]
        xx = jnp.arange(W)[None, :]
        inside = (yy < img_hw[0]) & (xx < img_hw[1])

        fusion = panoptic_fusion(
            seg_out["cls_logits"], masks,
            cls_mode="softmax_void", object_mask_thr=c.object_mask_thr,
            iou_thr=c.iou_thr, instance_mode="global",
            num_things=self.num_things, region_mask=inside,
        )

        from openpsg_tpu.models.detectors.psg_v4 import select_objects

        sel, sel_oid, valid = select_objects(
            fusion.survive, fusion.object_ids, M, c.max_objects
        )
        labels = (sel_oid % INSTANCE_OFFSET).astype(jnp.int32)
        obj_scores = jnp.where(valid, jnp.take(fusion.query_scores, sel), 0.0)

        from openpsg_tpu.ops.mask_ops import downsample_nearest, masks_from_idmap

        mf = seg_out["mask_features"]                       # [H4, W4, D]
        H4, W4 = mf.shape[:2]
        pan4 = downsample_nearest(fusion.pan_seg, (H4, W4))
        obj_masks = masks_from_idmap(pan4, sel_oid) & valid[:, None, None]
        return self._relation_tail(
            params, mf, obj_masks, sel_oid, valid, labels, obj_scores,
            fusion.pan_seg,
        )

    @functools.partial(jax.jit, static_argnums=0)
    def _infer_gt_jit(
        self, params, image_u8, gt_masks, gt_oids, gt_valid,
    ):
        """GT-segmenter upper-bound ablation — the reference's commented-
        out harness lives exactly in this detector family
        (mask2former_relation.py:380-409): predicted panoptic replaced by
        GT masks; mask_features still come from the segmenter."""
        image = normalize_image(image_u8)
        seg_out = self.segmenter.apply(params["segmenter"], image)
        mf = seg_out["mask_features"]
        H4, W4 = mf.shape[:2]
        Mn = gt_masks.shape[0]
        masks4 = jax.image.resize(
            gt_masks.astype(jnp.int32), (Mn, H4, W4), method="nearest"
        ).astype(bool) & gt_valid[:, None, None]
        labels = (gt_oids % INSTANCE_OFFSET).astype(jnp.int32)
        idx = jnp.argmax(gt_masks & gt_valid[:, None, None], axis=0)
        any_mask = jnp.any(gt_masks & gt_valid[:, None, None], axis=0)
        pan_full = jnp.where(any_mask, jnp.take(gt_oids, idx), 133)
        return self._relation_tail(
            params, mf, masks4, jnp.where(gt_valid, gt_oids, 0), gt_valid,
            labels, gt_valid.astype(jnp.float32), pan_full,
        )

    def infer_gt(self, image_u8, gt_masks, gt_oids, gt_valid) -> Dict[str, Any]:
        dev = self._infer_gt_jit(
            self.params, jnp.asarray(image_u8),
            jnp.asarray(gt_masks, bool), jnp.asarray(gt_oids, jnp.int32),
            jnp.asarray(gt_valid, bool),
        )
        return self.postprocess(jax.device_get(dev))

    def _object_tokens(self, cls_table, mf, obj_masks, labels, chunked):
        """Object token assembly shared by inference (reference
        ``_get_input``, mask2former_relation.py:250-316) and the GT-train
        path (``_thing/_stuff_embedding``, :111-199): mask pooling on the
        stride-4 grid (+ optional S-chunked pooling on the train path),
        class-embedding merge, optional mask-pooled sine positional
        encoding and inverse-mask background feature.

        Returns [M·S, token_dim] (S = 1 unless ``chunked`` and
        ``object_token_size > 1``; token order is object-major, matching
        the reference's per-object concatenation at :225-227)."""
        from openpsg_tpu.ops.mask_ops import mask_pool_chunked

        c = self.cfg
        feat = mf.transpose(2, 0, 1)                         # [D, H4, W4]
        S = c.object_token_size if chunked else 1
        pooled = mask_pool_chunked(feat, obj_masks, S)       # [M, S, D]
        cls_emb = jnp.take(cls_table, labels, axis=0)[:, None, :]
        if not c.embedding_add_cls:
            tokens = pooled
        elif c.merge_cls_type == "cat":
            tokens = jnp.concatenate(
                [pooled, jnp.broadcast_to(cls_emb, pooled.shape)], axis=-1
            )
        else:
            tokens = pooled + cls_emb
        if c.use_positional_encoding:
            # reference: SinePositionalEncoding(num_feats=D/2,
            # normalize=True) of the UNPADDED stride-4 grid, mask-pooled
            # per object and ADDED after the cls merge (:141-148, 297-307)
            from openpsg_tpu.models.segmenter.deform_layers import (
                make_cumsum_points,
                sine_pos_embed,
            )

            H4, W4 = mf.shape[:2]
            pe = sine_pos_embed(
                jnp.asarray(make_cumsum_points([(H4, W4)])), mf.shape[-1]
            ).reshape(H4, W4, -1).astype(mf.dtype)
            tokens = tokens + mask_pool_chunked(
                pe.transpose(2, 0, 1), obj_masks, S
            )
        if c.use_background_feature:
            # inverse-mask pooled feature (:150-153, 308-314)
            inv = 1.0 - obj_masks.astype(mf.dtype)
            tokens = tokens + mask_pool_chunked(feat, inv, S)
        return tokens.reshape(obj_masks.shape[0] * S, -1)

    def _relation_tail(
        self, params, mf, obj_masks, sel_oid, valid, labels, obj_scores,
        pan_seg,
    ):
        c = self.cfg
        M = c.max_objects_padded
        # mask-pooled object tokens on the stride-4 grid + class embedding
        # (+ the optional sine-PE / background-feature embellishments);
        # inference always pools ONE token per object — the reference's
        # `_get_input` ignores object_token_size (mask2former_relation.py
        # :250-316, plain mean pool), only the GT-train path chunks
        tokens = self._object_tokens(
            params["object_cls_embed"], mf, obj_masks, labels, chunked=False
        )

        extra = self._zero_extra(M)
        if self.pair_text_matrix is not None:
            # gather precomputed pair-text embeddings by predicted classes
            extra["pair_text"] = self.pair_text_matrix[
                labels[:, None], labels[None, :]
            ][None]                                          # [1, M, M, T]
        if self.triplet_lookup is not None:
            # per-relation triplet text rows by predicted class pair
            idx = self.triplet_lookup[labels[:, None], labels[None, :]]
            extra["triplet_text"] = jnp.take(
                self.triplet_table, idx, axis=0
            )[None]                                       # [1, M, M, R, T]
        scores = self._head_apply(params["head"], tokens, valid, extra)
        R = scores.shape[0]

        # diag -9999 + pad masking
        eye = jnp.eye(M, dtype=bool)
        pair_ok = valid[:, None] & valid[None, :] & ~eye
        scores = jnp.where(pair_ok[None], scores, -9999.0)

        loss_type = self._loss_type()
        if loss_type == "v0_softmax":
            probs = jax.nn.softmax(scores, axis=0)[: R - 1]
            R_eff = R - 1
        elif loss_type == "v0_sigmoid":
            probs = jax.nn.sigmoid(scores)
            R_eff = R
        else:  # v1 family: exp, not sigmoid (reference :477-478)
            probs = jnp.exp(scores)
            R_eff = R
        del R_eff  # probs already sliced per loss type above
        probs = probs * obj_scores[None, :, None] * obj_scores[None, None, :]
        probs = jnp.where(pair_ok[None], probs, 0.0)

        flat = probs.reshape(-1)
        top_scores, top_idx = jax.lax.top_k(flat, 100)
        rel = top_idx // (M * M)
        rem = top_idx % (M * M)
        sub = rem // M
        obj = rem % M
        triplets = jnp.stack([sub, obj, rel], axis=1).astype(jnp.int32)

        return {
            "pan_seg": pan_seg,
            "object_ids": jnp.where(valid, sel_oid, -1),
            "object_valid": valid,
            "object_scores": obj_scores,
            "triplets": triplets,
            "triplet_scores": top_scores,
        }

    def _loss_type(self) -> str:
        if self.cfg.head_version == "v1":
            return self.cfg.head_v1.loss_type
        return "v1"

    def infer(self, image_u8: np.ndarray, img_hw) -> Dict[str, Any]:
        dev = self._infer_jit(
            self.params, jnp.asarray(image_u8), jnp.asarray(img_hw, jnp.int32)
        )
        return self.postprocess(jax.device_get(dev))

    def postprocess(self, dev) -> Dict[str, Any]:
        valid = dev["object_valid"]
        object_id_list = [int(x) for x in dev["object_ids"][valid]]
        rel, scores = [], []
        for (s, o, r), sc in zip(dev["triplets"], dev["triplet_scores"]):
            if sc <= 0:
                continue
            rel.append([int(s), int(o), int(r)])
            scores.append(float(sc))
        return {
            "pan_results": dev["pan_seg"],
            "rel_results": {"object_id_list": object_id_list, "relation": rel},
            "rel_scores": scores,
        }

    def _host_extra(self):
        """v2 text features for the current vocabulary (zeros without KV)."""
        M = self.cfg.max_objects_padded
        if self.cfg.head_version != "v2":
            return {}
        return {k: v for k, v in self._zero_extra(M).items()}

    # ------------------------------------------------------- batched/sharded
    def make_batch_infer(self, mesh=None):
        """Data-parallel batched inference (see PSGv4.make_batch_infer)."""
        impl = self._infer_jit.__wrapped__

        def one(params, image, hw):
            return impl(self, params, image, hw)

        batched = jax.vmap(one, in_axes=(None, 0, 0))
        if mesh is None:
            return jax.jit(batched)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.jit(
            batched,
            in_shardings=(
                NamedSharding(mesh, P()),
                NamedSharding(mesh, P("dp")),
                NamedSharding(mesh, P("dp")),
            ),
            out_shardings=NamedSharding(mesh, P("dp")),
        )

    def infer_batch(self, images: np.ndarray, img_hws: np.ndarray, mesh=None):
        if not hasattr(self, "_batch_fn_cache"):
            self._batch_fn_cache = {}
        key = (images.shape[0], mesh is not None)
        if key not in self._batch_fn_cache:
            self._batch_fn_cache[key] = self.make_batch_infer(mesh)
        dev = self._batch_fn_cache[key](
            self.params, jnp.asarray(images), jnp.asarray(img_hws, jnp.int32)
        )
        dev = jax.device_get(dev)
        out = []
        for i in range(images.shape[0]):
            out.append(
                self.postprocess(jax.tree_util.tree_map(lambda x: x[i], dev))
            )
        return out
