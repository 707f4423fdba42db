"""Part-checkpointing: save only trainable weights, rotate, auto-resume.

Reference: kings_sgg/utils/part_checkpoint_hook.py — per-epoch checkpoints
that EXCLUDE frozen-prefix weights (:96-116) so the 7B LLM + segmenter
never hit disk; keeps ``max_keep_ckpts`` (:67-93), maintains a ``latest``
pointer for ``--auto-resume`` (:43-45, 88-93); checkpoint meta embeds
version + classes (tools/train.py:231-236).

TPU equivalent: orbax ``CheckpointManager`` over ONLY the trainable
subtree + optimizer state + step; frozen weights come from their original
sources at load time (same contract as the reference's
``load_state_dict(strict=False)`` resume).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class PartCheckpointer:
    def __init__(self, directory: str, max_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_keep, create=True
            ),
        )

    def save(
        self,
        step: int,
        trainable_params: Any,
        opt_state: Any,
        meta: Optional[Dict[str, Any]] = None,
    ) -> None:
        args = ocp.args.Composite(
            params=ocp.args.StandardSave(trainable_params),
            opt_state=ocp.args.StandardSave(opt_state),
            meta=ocp.args.JsonSave(meta or {}),
        )
        self.manager.save(step, args=args)
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def step_for_epoch(self, epoch: int) -> Optional[int]:
        """Map a 1-indexed epoch to the orbax step it was saved under.

        tools/train.py keys checkpoints by global_step but records
        ``meta['epoch']`` — this restores the reference's
        ``epoch_N.pth`` addressing (``python tools/infer.py <tag> <epoch>``,
        reference tools/infer.py:264-269) without renaming on disk."""
        for step in sorted(self.manager.all_steps()):
            out = self.manager.restore(
                step, args=ocp.args.Composite(meta=ocp.args.JsonRestore())
            )
            if out["meta"].get("epoch") == epoch:
                return step
        return None

    def restore(
        self,
        step: Optional[int] = None,
        like_params: Any = None,
        like_opt_state: Any = None,
    ) -> Tuple[Any, Any, Dict[str, Any], int]:
        """→ (params, opt_state, meta, step). ``like_*`` provide the target
        structures (abstract trees) for typed restore."""
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restore_args = {}
        if like_params is not None:
            restore_args["params"] = ocp.args.StandardRestore(like_params)
        else:
            restore_args["params"] = ocp.args.StandardRestore()
        if like_opt_state is not None:
            restore_args["opt_state"] = ocp.args.StandardRestore(like_opt_state)
        else:
            restore_args["opt_state"] = ocp.args.StandardRestore()
        restore_args["meta"] = ocp.args.JsonRestore()
        out = self.manager.restore(step, args=ocp.args.Composite(**restore_args))
        return out["params"], out["opt_state"], out["meta"], step

    def close(self):
        self.manager.close()


def freeze_keys_from_config(cfg, params: Dict[str, Any], is_v4: bool):
    """Map the reference's ``train_cfg.freeze_layers`` names (prefix-match
    contract, openseed_relation_v2.py:71-79) onto our top-level param keys.

    Shared by tools/train.py (what to optimize/save) and tools/infer.py
    (which groups a part-checkpoint contains)."""
    model_cfg = cfg.model if hasattr(cfg, "model") else cfg.get("model", {})
    train_cfg = model_cfg.get("train_cfg") or {}
    freeze_names = set(train_cfg.get("freeze_layers", []))
    if not is_v4:
        # Mask2Former family: head + object class embedding train
        return set(params) - {"head", "object_cls_embed"}
    freeze_keys = {"segmenter", "text", "class_embeds"}
    if (
        any("language_model" in f or "llama" in f for f in freeze_names)
        or not freeze_names
    ):
        freeze_keys.add("llm")
    return freeze_keys


def restore_trainable_for_inference(
    model, cfg, ckpt_dir: str, epoch: Optional[int] = None, is_v4: bool = False
):
    """Restore a part-checkpoint's trainable groups into ``model.params``
    in place (the reference ``epoch_N.pth`` surface: checkpoints are keyed
    by global_step, the CLI takes an EPOCH — mapped via the saved meta).
    Shared by tools/infer.py and tools/serve.py.  → (step, meta)."""
    ckpt = PartCheckpointer(ckpt_dir)
    step = None
    if epoch is not None:
        step = ckpt.step_for_epoch(epoch)
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint for epoch {epoch} in {ckpt_dir}"
            )
    # part-checkpoints hold exactly the groups the config trains
    freeze = freeze_keys_from_config(cfg, model.params, is_v4)
    like = {k: v for k, v in model.params.items() if k not in freeze}
    params, _, meta, step = ckpt.restore(step=step, like_params=like)
    model.params.update(params)
    return step, meta


def split_trainable(params: Dict[str, Any], freeze_keys: Tuple[str, ...]):
    """Split a top-level params dict into (trainable, frozen) by key —
    the freeze_layers prefix-match contract (openseed_relation_v2.py:71-79)
    applied at our param-tree granularity."""
    trainable = {k: v for k, v in params.items() if k not in freeze_keys}
    frozen = {k: v for k, v in params.items() if k in freeze_keys}
    return trainable, frozen
