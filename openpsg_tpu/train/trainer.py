"""Training step for the v4 pipeline (pjit over a dp×tp mesh; the LLM
forward can also run GPipe-pipeline-parallel over dp×pp×tp via
``make_pipelined_train_step`` — tools/train.py selects it when
``tpu.mesh`` carries ``pp > 1``).

Reference recipe (configs/psg/baseline_v4_ov.py:150-165, README.md:14-22):
AdamW lr 1e-4 wd 0.05 eps 1e-8 betas (0.9, 0.999), grad-clip 0.01, linear
warmup 500 iters @ ratio 0.001, step LR ×0.1 at epochs [6, 10], 12 epochs,
8 devices × 1 image.  Frozen: segmenter + LLM (train_cfg.freeze_layers —
only the relation head's Q-Former/queries/patch-embed/projection train).

TPU design:
  * the whole step (frozen segmenter fwd → head fwd → LLM teacher forcing
    → grads → update) is ONE pjit program; batch axis sharded on ``dp``
    (XLA psum ≡ the reference's NCCL allreduce), LLM params sharded on
    ``tp`` (openpsg_tpu.parallel.sharding);
  * only trainable params enter ``jax.grad`` — no gradient buffers for the
    frozen 7B (the reference needs ``find_unused_parameters=True`` for
    this; here it falls out of the functional design);
  * GT-dependent sampling (Q-Former 32 pairs @ 3:1 neg:pos, ≤4 positive
    LLM pairs, reference :437-461 & :221-228) happens host-side in the
    data loader — it depends only on labels, and static-size index arrays
    with weights replace dynamic batch sizes;
  * faithful quirk: the reference reads LLM pair features from a buffer
    that is ZERO for pairs outside the Q-Former sample (:178-186, 294);
    we reproduce this by matching LLM pairs against the sampled set.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openpsg_tpu.models.relation.head_v4 import (
    assemble_pair_instructions,
    right_align,
)
from openpsg_tpu.train import losses
from openpsg_tpu.models.segmenter.openseed import normalize_image


class TrainBatch(NamedTuple):
    """Static-shape per-image training example (batched on axis 0)."""

    image: jnp.ndarray            # [B, H, W, 3] f32 RGB 0-255, padded
    object_masks: jnp.ndarray     # [B, M, H4, W4] bool — GT masks, stride 4
    object_labels: jnp.ndarray    # [B, M] i32 class ids
    object_valid: jnp.ndarray     # [B, M] bool
    relation_target: jnp.ndarray  # [B, M, M, R] f32 {0,1}
    qf_sel_idx: jnp.ndarray       # [B, S] i32 pair indices (pair-major i*M+j)
    qf_sel_weight: jnp.ndarray    # [B, S] f32 (0 = padding slot)
    llm_sel_idx: jnp.ndarray      # [B, T] i32
    llm_valid: jnp.ndarray        # [B, T] bool
    llm_label_ids: jnp.ndarray    # [B, T, L] i32 (' {rel} </s>' sequences)
    llm_label_mask: jnp.ndarray   # [B, T, L] bool


def make_lr_schedule(
    base_lr: float = 1e-4,
    warmup_iters: int = 500,
    warmup_ratio: float = 1e-3,
    step_epochs: Tuple[int, ...] = (6, 10),
    steps_per_epoch: int = 1000,
    gamma: float = 0.1,
):
    """mmcv 'step' policy with linear warmup (baseline_v4_ov.py:158-163)."""

    def schedule(count):
        warm = base_lr * (
            warmup_ratio + (1.0 - warmup_ratio) * jnp.minimum(count, warmup_iters) / warmup_iters
        )
        epoch = count // steps_per_epoch
        decay = gamma ** jnp.sum(
            jnp.asarray([epoch >= e for e in step_epochs], jnp.float32)
        )
        return jnp.where(count < warmup_iters, warm, base_lr) * decay

    return schedule


def paramwise_multipliers(params, custom_keys, norm_decay_mult=None):
    """mmcv ``paramwise_cfg`` semantics over a flax param tree (reference
    baseline_r50.py:277-291: backbone lr×0.1, query/level embeds
    decay_mult=0, norm_decay_mult=0).

    ``custom_keys``: {substring: {lr_mult, decay_mult}} — matched against
    the '/'-joined param path, LONGEST matching key wins (mmcv's
    sorted-by-length rule).  ``norm_decay_mult`` applies to LayerNorm/
    GroupNorm leaves (a path component containing 'norm'/'ln') when no
    custom key set a decay_mult.  → (lr_mult tree, decay_mult tree)."""

    def classify(path, leaf):
        parts = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        s = "/".join(parts)
        lr, dec, best = 1.0, None, -1
        for key, d in (custom_keys or {}).items():
            if key in s and len(key) > best:
                best = len(key)
                lr = float(d.get("lr_mult", 1.0))
                dec = d.get("decay_mult", None)
                dec = None if dec is None else float(dec)
        if dec is None:
            # a component is a norm if it contains 'norm' or is/ends with
            # an 'ln' token, with or without a layer index — this repo's
            # own modules use digit-suffixed names (self_ln0, cross_ln0,
            # ffn_q_ln{i}) that a bare token match would miss
            is_norm = any(
                ("norm" in p.lower())
                or re.fullmatch(r"(?:.*_)?ln\d*", p.lower()) is not None
                for p in parts[:-1]
            )
            if norm_decay_mult is not None and is_norm:
                dec = float(norm_decay_mult)
            else:
                dec = 1.0
        return lr, dec

    # one walk: classify() substring-scans every custom key per leaf, so
    # build (lr, dec) pairs in a single pass and split them after
    pair_tree = jax.tree_util.tree_map_with_path(classify, params)
    lr_tree = jax.tree_util.tree_map(
        lambda pair: pair[0], pair_tree,
        is_leaf=lambda x: isinstance(x, tuple),
    )
    dec_tree = jax.tree_util.tree_map(
        lambda pair: pair[1], pair_tree,
        is_leaf=lambda x: isinstance(x, tuple),
    )
    return lr_tree, dec_tree


def _add_decayed_weights_scaled(weight_decay, mult_tree):
    """add_decayed_weights with a per-leaf multiplier: u += wd·mult·p."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("weight decay requires params")
        return (
            jax.tree_util.tree_map(
                lambda u, p, m: u + weight_decay * m * p,
                updates, params, mult_tree,
            ),
            state,
        )

    return optax.GradientTransformation(init, update)


def _scale_updates_by(mult_tree):
    """Per-leaf update scaling (applies lr_mult AFTER adamw's global lr)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        return (
            jax.tree_util.tree_map(lambda u, m: u * m, updates, mult_tree),
            state,
        )

    return optax.GradientTransformation(init, update)


def make_optimizer(
    schedule,
    max_norm: float = 0.01,
    weight_decay: float = 0.05,
    lr_mult_tree=None,
    decay_mult_tree=None,
):
    """AdamW + global-norm clip (baseline_v4_ov.py:150-156).  Optional
    paramwise trees from :func:`paramwise_multipliers`: per-leaf lr
    multipliers and weight-decay multipliers (0 disables decay for that
    leaf — the embeds/norm no-decay rule)."""
    # adamw decomposed (scale_by_adam → add_decayed_weights → lr) so the
    # decay term can honor FRACTIONAL decay_mult values (mmcv paramwise
    # semantics, e.g. decay_mult=0.1 → wd 0.005): a boolean mask would
    # silently coerce them to full decay.  For mult ∈ {0, 1} this is
    # bit-identical to optax.adamw(mask=d>0).
    if decay_mult_tree is not None:
        decay = _add_decayed_weights_scaled(weight_decay, decay_mult_tree)
    else:
        decay = optax.add_decayed_weights(weight_decay)
    tx = [
        optax.clip_by_global_norm(max_norm),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        decay,
        optax.scale_by_learning_rate(schedule),
    ]
    if lr_mult_tree is not None:
        tx.append(_scale_updates_by(lr_mult_tree))
    return optax.chain(*tx)


@dataclasses.dataclass
class V4Trainer:
    """Builds the jittable train_step for a PSGv4 pipeline instance.

    ``trainable`` / ``frozen`` are top-level splits of ``pipeline.params``
    (see checkpoint.split_trainable) — the reference freezes
    ['openseed', 'relation_head.language_model'] (config :64-66), i.e.
    trainable = {'head'}; include 'llm' in trainable to fine-tune the
    language model too (required when training from scratch without a
    pretrained LLM checkpoint)."""

    pipeline: Any                 # PSGv4
    rel_cls_loss_weight: float = 50.0

    def __post_init__(self):
        # Gradients flow THROUGH the (usually frozen) LLM to reach the
        # Q-Former; remat the layer scan so the backward pass recomputes
        # each layer instead of saving per-layer residuals — without this
        # the saved dequantized int8 kernels alone (~0.4 GB × 32 layers at
        # 7B) OOM a 16 GB chip.  Same params tree: nn.remat is a lifted
        # transform that preserves variable structure.
        from openpsg_tpu.models.llm.llama import LlamaWithEmbeddings

        self._llm_train = LlamaWithEmbeddings(
            dataclasses.replace(self.pipeline.cfg.llm, remat=True)
        )

    def loss_single(self, trainable, frozen, batch_i: TrainBatch) -> Dict[str, jnp.ndarray]:
        """Losses for ONE image (no batch dim); vmapped by train_step."""
        params = {**frozen, **trainable}
        out, full_embeds, full_mask, positions = self._pre_llm(
            params, "segmenter" in trainable, batch_i
        )
        logits, _ = self._llm_train.apply(
            params["llm"],
            input_embeds=full_embeds,
            attention_mask=full_mask,
            positions=positions,
        )
        per_pair = self._llm_pair_ce(
            logits, batch_i.llm_label_ids, batch_i.llm_label_mask
        )
        lv = batch_i.llm_valid.astype(jnp.float32)
        out["rel_llm_loss"] = jnp.sum(per_pair * lv) / jnp.maximum(
            jnp.sum(lv), 1.0
        )
        return out

    def _pre_llm(self, params, segmenter_trainable: bool, batch_i: TrainBatch):
        """Everything up to (but not including) the LLM forward: segmenter
        + head + relation-classification losses, plus the assembled
        teacher-forcing sequences ([T, Rq+Lp+L] embeds/mask/positions).
        Split out so make_pipelined_train_step can hoist the LLM forward
        of ALL images out of the per-image vmap into ONE pipeline-parallel
        call."""
        p = self.pipeline
        c = p.cfg
        M = c.head.max_objects_padded
        R = c.head.num_relation_classes

        image = normalize_image(batch_i.image)
        seg_out = p.segmenter.apply(
            params["segmenter"], image, params["class_embeds"]
        )
        mask_features = seg_out["mask_features"]
        if not segmenter_trainable:
            mask_features = jax.lax.stop_gradient(mask_features)

        labels = batch_i.object_labels
        pair_idx = jnp.arange(M * M, dtype=jnp.int32)
        sub_lab = jnp.take(labels, pair_idx // M)
        obj_lab = jnp.take(labels, pair_idx % M)
        text_ids, text_mask = assemble_pair_instructions(
            p.qf_parts, sub_lab, obj_lab
        )

        head_out = p.head.apply(
            params["head"],
            mask_features,
            batch_i.object_masks,
            batch_i.object_valid,
            text_ids,
            text_mask,
            pair_select=batch_i.qf_sel_idx,
        )

        out: Dict[str, jnp.ndarray] = {}
        rel_flat = batch_i.relation_target.reshape(M * M, R)
        sel_target = jnp.take(rel_flat, batch_i.qf_sel_idx, axis=0)  # [S, R]
        w = batch_i.qf_sel_weight

        if "binary_logits" in head_out:
            binary_label = (jnp.sum(sel_target, -1) > 0).astype(jnp.float32)
            out["binary_rel_cls_loss"] = (
                losses.binary_existence_loss(
                    head_out["binary_logits"], binary_label, w
                )
                * self.rel_cls_loss_weight
            )
        if "multiclass_logits" in head_out:
            out["multiclass_rel_cls_loss"] = (
                losses.reweighted_mcce(
                    sel_target, head_out["multiclass_logits"], sample_weight=w
                )
                * self.rel_cls_loss_weight
            )

        # ---- LLM teacher forcing on selected (positive) pairs ----
        # pair features come from the qformer-sampled buffer: zero when the
        # LLM pair wasn't qformer-sampled (reference :178-186, 294)
        T = batch_i.llm_sel_idx.shape[0]
        match = (
            (batch_i.llm_sel_idx[:, None] == batch_i.qf_sel_idx[None, :])
            & (batch_i.qf_sel_weight[None, :] > 0)  # padding slots alias idx 0
        ).astype(head_out["llm_visual_tokens"].dtype)            # [T, S]
        # normalize: sampling-with-replacement can list a pair several times;
        # duplicates carry identical Q-Former features, so averaging == the
        # reference's buffer-overwrite semantics (a plain sum would double
        # the feature magnitude per duplicate)
        match = match / jnp.maximum(match.sum(-1, keepdims=True), 1.0)
        vis = jnp.einsum(
            "ts,srd->trd", match, head_out["llm_visual_tokens"]
        )                                                         # [T, Rq, D]

        p_ids, p_mask = assemble_pair_instructions(
            p.llm_parts,
            jnp.take(sub_lab, batch_i.llm_sel_idx),
            jnp.take(obj_lab, batch_i.llm_sel_idx),
        )
        # align the prompt's last real token to the prompt/label boundary
        # (same convention as inference; see right_align docstring)
        p_ids, p_mask = right_align(p_ids, p_mask)
        lab_ids = batch_i.llm_label_ids
        lab_mask = batch_i.llm_label_mask
        emb = p.llm.apply(
            params["llm"],
            jnp.concatenate([p_ids, lab_ids], axis=1),
            method=lambda m, i: m.embed(i),
        )
        full_embeds = jnp.concatenate([vis.astype(emb.dtype), emb], axis=1)
        Rq = vis.shape[1]
        full_mask = jnp.concatenate(
            [jnp.ones((T, Rq), bool), p_mask, lab_mask], axis=1
        )
        positions = jnp.maximum(
            jnp.cumsum(full_mask.astype(jnp.int32), axis=1) - 1, 0
        )
        return out, full_embeds, full_mask, positions

    @staticmethod
    def _llm_pair_ce(logits, lab_ids, lab_mask):
        """Per-pair mean CE over the label region of teacher-forced
        logits ([T, Rq+Lp+L, V] — or any leading batch of sequences)."""
        L = lab_ids.shape[-1]
        # Boundary-inclusive shift: logits at positions [-(L+1) .. -2]
        # predict label tokens [0 .. L-1].  The reference slices logits to
        # the label region THEN shifts (:332-341), which silently never
        # trains the first label token (the prompt→label boundary) — fine
        # with a pretrained LLM prior, fatal from scratch (decode emits
        # EOS immediately).  Intended-semantics fix per SURVEY.md §7.3.
        shift_logits = logits[..., -(L + 1):-1, :]
        shift_labels = lab_ids
        shift_mask = lab_mask.astype(jnp.float32)
        # per-pair mean CE, then mean over valid pairs (reference stacks
        # per-pair means, :338-341, 350-351)
        logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, shift_labels[..., None], -1)[..., 0]
        return jnp.sum(nll * shift_mask, -1) / jnp.maximum(
            jnp.sum(shift_mask, -1), 1.0
        )

    def make_train_step(self, optimizer):
        def train_step(trainable, opt_state, frozen, batch: TrainBatch):
            def loss_fn(tr):
                per_image = jax.vmap(
                    lambda b: self.loss_single(tr, frozen, b)
                )(batch)
                loss_dict = jax.tree_util.tree_map(jnp.mean, per_image)
                total = sum(loss_dict.values())
                return total, loss_dict

            (total, loss_dict), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(trainable)
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            loss_dict["loss"] = total
            loss_dict["grad_norm"] = optax.global_norm(grads)
            return trainable, opt_state, loss_dict

        return train_step

    def make_pipelined_train_step(self, optimizer, mesh, n_micro=None):
        """Train step whose LLM teacher-forcing forward runs
        pipeline-parallel (GPipe, parallel/pipeline.py) over a
        ("dp","pp"[,"tp"]) mesh from ``make_dp_pp_mesh``.

        The per-image vmap only covers ``_pre_llm`` (segmenter + head +
        relation-cls losses); the B·T teacher-forced pair sequences are
        flattened into ONE ``pipelined_llama_logits`` call — shard_map
        can't nest inside vmap, and one big no-cache forward is exactly
        the shape GPipe wants.  ``jax.grad`` through it is pipelined
        backprop, so this serves BOTH recipes: frozen LLM (grads flow
        through to the Q-Former) and trainable LLM (layer grads arrive
        pp(/tp)-sharded; optimizer moments inherit the layout).
        Numerically equal to make_train_step (test-pinned).

        ``n_micro`` defaults to the pp stage count when it divides B·T,
        else 1 (correct, all-bubble)."""
        from openpsg_tpu.parallel.pipeline import pipelined_llama_logits

        def train_step(trainable, opt_state, frozen, batch: TrainBatch):
            def loss_fn(tr):
                params = {**frozen, **tr}
                seg_tr = "segmenter" in tr

                outs, emb, msk, pos = jax.vmap(
                    lambda b: self._pre_llm(params, seg_tr, b)
                )(batch)
                B, T, Lf, D = emb.shape
                nm = n_micro
                if nm is None:
                    pp = mesh.shape["pp"]
                    nm = pp if (B * T) % pp == 0 else 1
                logits = pipelined_llama_logits(
                    self._llm_train,
                    params["llm"],
                    emb.reshape(B * T, Lf, D),
                    msk.reshape(B * T, Lf),
                    pos.reshape(B * T, Lf),
                    mesh,
                    n_micro=nm,
                    remat=True,
                )
                per_pair = self._llm_pair_ce(
                    logits.reshape(B, T, Lf, -1),
                    batch.llm_label_ids,
                    batch.llm_label_mask,
                )                                               # [B, T]
                lv = batch.llm_valid.astype(jnp.float32)
                rel_llm = jnp.sum(per_pair * lv, -1) / jnp.maximum(
                    jnp.sum(lv, -1), 1.0
                )                                               # [B]
                loss_dict = jax.tree_util.tree_map(jnp.mean, outs)
                loss_dict["rel_llm_loss"] = jnp.mean(rel_llm)
                total = sum(loss_dict.values())
                return total, loss_dict

            (total, loss_dict), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(trainable)
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            loss_dict["loss"] = total
            loss_dict["grad_norm"] = optax.global_norm(grads)
            return trainable, opt_state, loss_dict

        return train_step


# ------------------------------------------------------------- host sampling
def sample_training_pairs(
    rng: np.random.Generator,
    relation_target: np.ndarray,   # [M, M, R]
    pair_valid: np.ndarray,        # [M*M]
    sample_size: int = 32,
    neg_over_pos: int = 3,
    llm_pairs: int = 4,
):
    """Host-side port of qformer_sampler (:437-461) + LLM pair pick
    (:221-228), emitting static-size index/weight arrays."""
    M2 = pair_valid.shape[0]
    pos = np.nonzero((relation_target.sum(-1).reshape(-1) > 0) & pair_valid)[0]
    neg = np.nonzero((relation_target.sum(-1).reshape(-1) == 0) & pair_valid)[0]
    n_pos, n_neg = len(pos), len(neg)

    if n_pos < sample_size:
        take_pos = pos
        n_neg_take = min(sample_size - n_pos, max(n_pos, 1) * neg_over_pos)
        take_neg = (
            neg[rng.integers(0, n_neg, n_neg_take)] if n_neg else np.zeros(0, np.int64)
        )
    else:
        take_pos = pos[rng.integers(0, n_pos, sample_size // (neg_over_pos + 1))]
        n_neg_take = sample_size * neg_over_pos // (neg_over_pos + 1)
        take_neg = neg[rng.integers(0, n_neg, n_neg_take)] if n_neg else np.zeros(0, np.int64)
    sel = np.concatenate([take_pos, take_neg]).astype(np.int32)
    qf_idx = np.zeros(sample_size, np.int32)
    qf_w = np.zeros(sample_size, np.float32)
    n = min(len(sel), sample_size)
    qf_idx[:n] = sel[:n]
    qf_w[:n] = 1.0

    if n_pos > 0:
        chosen = rng.permutation(pos)[:llm_pairs]
    else:
        cand = np.nonzero(pair_valid)[0]
        chosen = rng.permutation(cand)[:llm_pairs] if len(cand) else np.zeros(0, np.int64)
    llm_idx = np.zeros(llm_pairs, np.int32)
    llm_valid = np.zeros(llm_pairs, bool)
    llm_idx[: len(chosen)] = chosen
    llm_valid[: len(chosen)] = True
    return qf_idx, qf_w, llm_idx, llm_valid


def build_llm_labels(
    tokenizer,
    relation_names,
    relation_target: np.ndarray,  # [M, M, R]
    llm_idx: np.ndarray,
    max_len: int,
):
    """' {rel} </s>' concatenated per positive relation of each selected
    pair (reference :267-276), tokenized right-padded."""
    M = relation_target.shape[0]
    texts = []
    for si in llm_idx:
        rels = np.nonzero(relation_target.reshape(M * M, -1)[int(si)])[0]
        texts.append(
            "".join(f" {relation_names[r]} </s>" for r in rels)
        )
    ids = np.zeros((len(llm_idx), max_len), np.int32)
    mask = np.zeros((len(llm_idx), max_len), bool)
    for i, t in enumerate(texts):
        e = []
        for piece in t.split("</s>"):
            piece = piece.strip()
            if piece:
                e.extend(tokenizer.encode(piece))
                e.append(tokenizer.eos_id)
        e = e[:max_len]
        ids[i, : len(e)] = e
        mask[i, : len(e)] = True
    return ids, mask


@dataclasses.dataclass
class M2FTrainer:
    """Training step for the Mask2Former-family pipelines (v1/v2/v3).

    Reference recipe: frozen backbone+panoptic head (baseline_r50.py:181),
    trainable relation head + object class embedding; GT masks mask-pool
    the object tokens (mask2former_relation.py:201-249) and the dense
    [B, R, N, N] scores train against the v1 loss family."""

    pipeline: Any                 # PSGMask2FormerRelation

    def loss_single(self, trainable, frozen, batch_i) -> Dict[str, jnp.ndarray]:
        import jax.numpy as jnp

        p = self.pipeline
        image = normalize_image(batch_i.image)
        seg_out = p.segmenter.apply(frozen["segmenter"], image)
        mf = jax.lax.stop_gradient(seg_out["mask_features"])

        # GT-mask token assembly incl. the optional embellishments (sine
        # PE, background feature, S-chunked pooling) — reference
        # `_thing/_stuff_embedding` (mask2former_relation.py:111-199)
        tokens = p._object_tokens(
            trainable["object_cls_embed"], mf, batch_i.object_masks,
            batch_i.object_labels, chunked=True,
        )
        S = p.cfg.object_token_size
        obj_valid = batch_i.object_valid
        rel_target = batch_i.relation_target
        if S > 1:
            # tokens are object-major [M·S]; the reference's rel_target
            # indices stay OBJECT indices (< n ≤ M, mask2former_relation.py
            # :229-247), i.e. literally the top-left [M, M] block of the
            # [M·S, M·S] pair grid — replicate that, zero-fill the rest
            M = obj_valid.shape[0]
            obj_valid = jnp.repeat(obj_valid, S)
            expanded = jnp.zeros(
                (M * S, M * S) + rel_target.shape[2:], rel_target.dtype
            )
            rel_target = expanded.at[:M, :M].set(rel_target)

        extra = p._host_extra()
        lab = batch_i.object_labels
        if getattr(p, "pair_text_matrix", None) is not None:
            extra["pair_text"] = p.pair_text_matrix[
                lab[:, None], lab[None, :]
            ][None]
        if getattr(p, "triplet_lookup", None) is not None:
            # real per-relation triplet text at TRAIN time too (the
            # reference gathers it inside forward_train,
            # mask2former_relation_v2.py:311-335)
            idx = p.triplet_lookup[lab[:, None], lab[None, :]]
            extra["triplet_text"] = jnp.take(
                p.triplet_table, idx, axis=0
            )[None]                                     # [1, M, M, R, T]
        target = rel_target.transpose(2, 0, 1)   # [R, M·S, M·S]
        pair = obj_valid[:, None] & obj_valid[None, :]

        def mcce(scores):  # v1 loss family on one [R, M, M] map
            masked = jnp.where(pair[None], scores, losses.NEG_INF)
            R = scores.shape[0]
            per = losses.multilabel_categorical_crossentropy(
                target.reshape(R, -1), masked.reshape(R, -1)
            )
            w = per / (jnp.max(per) + 1e-12)
            return jnp.mean(per * w) * 50.0, masked

        if p.cfg.head_version == "v1":
            scores = p._head_apply(
                trainable["head"], tokens, obj_valid, extra,
            )
            return p.head.loss(
                scores[None], target[None], obj_valid[None]
            )
        if p.cfg.head_version == "v2":
            # the reference computes ONE loss per enabled expert (+ moe),
            # all with the same multilabel CCE
            # (mask2former_relation_v2.py:639-668)
            from openpsg_tpu.models.relation.head_v2 import RelationHeadV2

            maps = p.head.apply(
                trainable["head"], tokens[None], obj_valid[None],
                pair_text_embeds=extra.get("pair_text"),
                triplet_text_embeds=extra.get("triplet_text"),
            )
            out = {}
            for name, m in maps.items():
                out[f"loss_relation_{name}"], _ = mcce(m[0])
            _, masked = mcce(RelationHeadV2.primary(maps)[0])
            out["relation.recall@20"] = losses.recall_at_k(
                masked[None], target[None], k=20
            )
            return out
        # v3 reuses the v1 'v1' loss family (reference heads re-implement
        # the same multilabel CCE)
        scores = p._head_apply(
            trainable["head"], tokens, obj_valid, extra,
        )
        loss, masked = mcce(scores)
        out = {"loss_relation": loss}
        out["relation.recall@20"] = losses.recall_at_k(
            masked[None], target[None], k=20
        )
        return out

    def make_train_step(self, optimizer):
        def train_step(trainable, opt_state, frozen, batch):
            def loss_fn(tr):
                per_image = jax.vmap(
                    lambda b: self.loss_single(tr, frozen, b)
                )(batch)
                loss_dict = jax.tree_util.tree_map(jnp.mean, per_image)
                total = sum(
                    v for k, v in loss_dict.items()
                    if k.startswith("loss_relation")
                )
                return total, loss_dict

            (total, loss_dict), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(trainable)
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            loss_dict["loss"] = total
            return trainable, opt_state, loss_dict

        return train_step


class M2FTrainBatch(NamedTuple):
    image: jnp.ndarray            # [B, H, W, 3]
    object_masks: jnp.ndarray     # [B, M, H4, W4] bool
    object_labels: jnp.ndarray    # [B, M] i32
    object_valid: jnp.ndarray     # [B, M] bool
    relation_target: jnp.ndarray  # [B, M, M, R]
