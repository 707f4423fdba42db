"""Env-gated day-1 checkout against the PUBLISHED OpenSeeD checkpoint.

VALIDATION.md's runbook, executable: on a machine that has the real
``model_state_dict_swint_51.2ap.pt`` (the reference downloads it per its
README and loads it at kings_sgg/models/detectors/
openseed_relation_v2.py:37-41), point the env vars below at the assets
and this module turns the manual steps into one command:

    OPENPSG_REAL_CKPT=/path/model_state_dict_swint_51.2ap.pt \
    [OPENPSG_CLIP_MERGES=/path/bpe_simple_vocab_16e6.txt.gz] \
    [OPENPSG_REF_BUNDLE=/path/dir_with_input.npy+pan_ref.npy+mf_ref.npy] \
        python -m pytest tests/test_real_checkpoint.py -q

Without ``OPENPSG_REAL_CKPT`` every test here skips cleanly (the weights
cannot exist in the build environment — no network).  The bundle dir is
VALIDATION.md step 2's saved reference outputs; without it only the
convert + smoke-forward half runs.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.environ.get("OPENPSG_REAL_CKPT", "")
BUNDLE = os.environ.get("OPENPSG_REF_BUNDLE", "")

pytestmark = pytest.mark.skipif(
    not (CKPT and os.path.exists(CKPT)),
    reason="set OPENPSG_REAL_CKPT to the published OpenSeeD .pt "
    "(VALIDATION.md step 1) to run the real-checkpoint checkout",
)


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    """VALIDATION.md step 1: run the REAL tool, strict key mapping."""
    out = tmp_path_factory.mktemp("openseed_tpu")
    cmd = [sys.executable, os.path.join(REPO, "tools", "convert_openseed.py"),
           CKPT, "--out", str(out)]
    merges = os.environ.get("OPENPSG_CLIP_MERGES")
    if merges:
        cmd += ["--merges", merges]
    # the converter is strict — an unmapped checkpoint key raises, so a
    # zero exit code IS the "no unexpected keys" acceptance check
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    assert res.returncode == 0, res.stderr[-4000:]
    assert (out / "segmenter.msgpack").exists()
    return out, res.stdout


def test_conversion_report_level_strides(converted):
    """Stride 8/16/32 input projections must be 1x1 convs from the Swin-T
    stage widths (192/384/768); a mismatch means ckpt_input_proj_strides
    is wrong for this checkpoint (VALIDATION.md step 1 triage)."""
    _, report = converted
    assert "level" in report and "stride" in report, report[-2000:]
    # the converter prints per-level input_proj shapes; spot-check that
    # every Swin stage width appears somewhere in the report
    for width in ("192", "384", "768"):
        assert width in report, f"stage width {width} missing:\n{report}"


@pytest.fixture(scope="module")
def pipeline(converted):
    out, _ = converted
    import jax

    from openpsg_tpu.models.detectors.psg_v4 import PSGv4, PSGv4Config
    from openpsg_tpu.models.segmenter.openseed import SegmenterConfig

    cfg = PSGv4Config(segmenter=SegmenterConfig())   # Swin-T geometry
    emb = out / "class_embeds.npy"
    pipe = PSGv4(
        cfg, jax.random.PRNGKey(0),
        precomputed_class_embeds=str(emb) if emb.exists() else None,
    )
    pipe.load_segmenter_weights(str(out / "segmenter.msgpack"))
    return pipe


def test_smoke_forward_finite(pipeline):
    """Converted weights produce finite, non-degenerate segmenter output
    on a synthetic image (catches dtype/layout corruption before any
    reference bundle exists)."""
    import jax.numpy as jnp

    from openpsg_tpu.models.segmenter.openseed import normalize_image

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (512, 512, 3)).astype(np.float32))
    seg = pipeline.segmenter.apply(
        pipeline.params["segmenter"], normalize_image(img),
        pipeline.params["class_embeds"],
    )
    mf = np.asarray(seg["mask_features"])
    assert np.isfinite(mf).all()
    assert mf.std() > 1e-3, "mask_features collapsed — layout/knob bug"
    logits = np.asarray(seg["cls_logits"])
    assert np.isfinite(logits).all()
    # trained checkpoints are confident somewhere: the max class prob over
    # 300 queries should clear chance (1/134) by a wide margin
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    assert probs.max() > 0.5, "no confident query — suspect conversion"


needs_bundle = pytest.mark.skipif(
    not (BUNDLE and os.path.exists(os.path.join(BUNDLE, "input.npy"))),
    reason="set OPENPSG_REF_BUNDLE to the dir holding input.npy / "
    "pan_ref.npy / mf_ref.npy saved per VALIDATION.md step 2",
)


@needs_bundle
def test_mask_features_cosine(pipeline):
    """VALIDATION.md step 3 acceptance: mask_features cosine > 0.99."""
    import jax.numpy as jnp

    from openpsg_tpu.models.segmenter.openseed import normalize_image

    img = np.load(os.path.join(BUNDLE, "input.npy"))
    if img.shape[0] == 3:                      # CHW → HWC
        img = img.transpose(1, 2, 0)
    seg = pipeline.segmenter.apply(
        pipeline.params["segmenter"],
        normalize_image(jnp.asarray(img.astype(np.float32))),
        pipeline.params["class_embeds"],
    )
    mf = np.asarray(seg["mask_features"], np.float32)
    mf_ref = np.load(os.path.join(BUNDLE, "mf_ref.npy")).astype(np.float32)
    if mf_ref.shape[0] == mf.shape[-1]:        # CHW → HWC
        mf_ref = mf_ref.transpose(1, 2, 0)
    assert mf.shape == mf_ref.shape, (mf.shape, mf_ref.shape)
    cos = float((mf * mf_ref).sum() /
                (np.linalg.norm(mf) * np.linalg.norm(mf_ref) + 1e-12))
    assert cos > 0.99, f"mask_features cosine {cos:.4f} ≤ 0.99"


@needs_bundle
def test_panoptic_agreement(pipeline):
    """VALIDATION.md step 3 acceptance: pixel category agreement > 0.97
    against the reference's panoptic id map on non-void pixels."""
    img = np.load(os.path.join(BUNDLE, "input.npy"))
    if img.shape[0] == 3:
        img = img.transpose(1, 2, 0)
    res = pipeline.infer(img.astype(np.float32), img.shape[:2])
    pan = np.asarray(res["pan_results"])
    pan_ref = np.load(os.path.join(BUNDLE, "pan_ref.npy"))
    assert pan.shape == pan_ref.shape, (pan.shape, pan_ref.shape)
    valid = pan_ref != 133                     # mmdet void
    agree = float((pan % 1000 == pan_ref % 1000)[valid].mean())
    assert agree > 0.97, f"pixel category agreement {agree:.4f} ≤ 0.97"
