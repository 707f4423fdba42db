"""ONE assembled full-segmenter torch-mirror golden (VERDICT r3 next #3).

The per-stage goldens (Swin vs HF, deformable encoder/decoder layers, the
PixelDecoder and QueryDecoder glue tests in test_weight_convert.py) pin
every stage separately; inter-stage glue — feature ordering between
modules, which backbone level feeds which input projection, level slicing
at the seams, the stride-64 extra level's source — was pinned only
transitively.  This test composes an independent torch mirror of the
ENTIRE OpenSeeD trunk (Swin backbone → deformable-encoder pixel decoder
with the stride-64 extra level → two-stage MaskDINO query decoder) at
tiny-but-real topology, converts the same synthetic checkpoint with
``convert_openseed``, and compares cls_logits / masks / boxes /
query_embed / mask_features of the whole ``OpenSeedSegmenter`` forward
end to end.

Reference contract being mirrored: the detector consumes
``outputs, mask_features = segmenter(image)``
(/root/reference/kings_sgg/models/detectors/openseed_relation_v2.py:107-139);
trunk semantics follow the public OpenSeeD/MaskDINO architecture the
published checkpoint was trained with.

Topology choices: window 4 with a 128×128 image keeps every stage grid a
multiple of the window (no pad-token paths — those are pinned by the HF
Swin golden); depth 1 per stage means no shifted blocks (same reason);
4 total levels exercises the stride-64 3×3/s2 extra input projection and
the (32, 16, 8, 64) checkpoint level permutation; 2 encoder and 2 decoder
layers exercise the scan stacking; 8 queries keep top-k selective.
"""

from __future__ import annotations

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.test_weight_convert import synthetic_openseed_state  # noqa: E402


def _ln(x, w, b, d):
    return F.layer_norm(x, (d,), w, b, eps=1e-5)


def _rel_pos_index(w: int) -> np.ndarray:
    coords = np.stack(
        np.meshgrid(np.arange(w), np.arange(w), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int64)


def _sine_cumsum_pos(h, w, C):
    """d2/mmdet cumsum sine positions, interleaved sin/cos (the convention
    pinned by the pixel-decoder glue golden)."""
    nm = torch.ones(1, h, w)
    ye = nm.cumsum(1) / (h + 1e-6) * (2 * np.pi)
    xe = nm.cumsum(2) / (w + 1e-6) * (2 * np.pi)
    half = C // 2
    dim_t = 10000.0 ** (
        2 * torch.div(torch.arange(half), 2, rounding_mode="floor") / half
    )
    px, py = xe[..., None] / dim_t, ye[..., None] / dim_t
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), -1).flatten(3)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), -1).flatten(3)
    return torch.cat((py, px), 3)[0].reshape(h * w, C)


class TestFullTrunkGolden:
    def _cfg(self):
        from openpsg_tpu.models.segmenter.openseed import SegmenterConfig

        return dc.replace(
            SegmenterConfig.tiny_test(),
            embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 2),
            window=4, dim=32, mask_dim=16, num_queries=8,
            enc_layers=2, dec_layers=2, total_levels=4, proj_dim=32,
        )

    def test_whole_converted_trunk_matches_torch_mirror(self):
        from openpsg_tpu.models.segmenter.openseed import OpenSeedSegmenter
        from openpsg_tpu.models.segmenter.weight_convert import convert_openseed

        cfg = self._cfg()
        C, nH, K, L = cfg.dim, 8, cfg.num_points, cfg.total_levels
        Q = cfg.num_queries
        rng = np.random.default_rng(33)
        state = synthetic_openseed_state(cfg, seed=33)

        # moderate scales: unit-normal deep compositions explode; keep
        # activations in a comparable range while still randomizing every
        # mapped tensor (zero biases / unit norms could hide drops)
        for k in list(state):
            if k.endswith(".bias") or (".norm" in k or "_norm" in k) and k.endswith(".weight"):
                state[k] = rng.normal(scale=0.2, size=state[k].shape).astype(np.float32)
        pr = "sem_seg_head.predictor."
        pd = "sem_seg_head.pixel_decoder."
        for l in range(cfg.enc_layers):
            state[pd + f"transformer.encoder.layers.{l}.self_attn.sampling_offsets.weight"] *= 0.05
        for l in range(cfg.dec_layers):
            state[pr + f"decoder.layers.{l}.cross_attn.sampling_offsets.weight"] *= 0.05
        for l in range(cfg.dec_layers + 1):
            state[pr + f"bbox_embed.{l}.layers.2.weight"] *= 0.1

        params, _ = convert_openseed(state, cfg)

        H = W = 128
        img = rng.normal(size=(H, W, 3)).astype(np.float32) * 0.5
        n_cls = 7
        ce = rng.normal(size=(n_cls, cfg.proj_dim)).astype(np.float32)
        ce /= np.linalg.norm(ce, axis=-1, keepdims=True)

        # ================= torch mirror =================
        t = lambda k: torch.tensor(state[k])

        # ---- Swin backbone (no shift: depth 1/stage; no pads: grids are
        # window multiples) ----
        x = F.conv2d(
            torch.tensor(img.transpose(2, 0, 1))[None],
            t("backbone.patch_embed.proj.weight"),
            t("backbone.patch_embed.proj.bias"), stride=4,
        )[0].permute(1, 2, 0)                                  # [32, 32, 8]
        d = cfg.embed_dim
        x = _ln(x, t("backbone.patch_embed.norm.weight"),
                t("backbone.patch_embed.norm.bias"), d)
        win = cfg.window
        idx = torch.tensor(_rel_pos_index(win).reshape(-1))
        feats_t = []
        for st in range(4):
            nh = cfg.num_heads[st]
            hd = d // nh
            p = f"backbone.layers.{st}.blocks.0."
            Hs, Ws, _ = x.shape
            short = x
            h = _ln(x, t(p + "norm1.weight"), t(p + "norm1.bias"), d)
            hw = (h.reshape(Hs // win, win, Ws // win, win, d)
                  .permute(0, 2, 1, 3, 4).reshape(-1, win * win, d))
            qkv = hw @ t(p + "attn.qkv.weight").T + t(p + "attn.qkv.bias")
            q, k_, v = qkv.reshape(-1, win * win, 3, nh, hd).unbind(2)
            q = q.permute(0, 2, 1, 3) * hd ** -0.5
            k_ = k_.permute(0, 2, 1, 3)
            v = v.permute(0, 2, 1, 3)
            attn = q @ k_.transpose(-1, -2)
            bias = (t(p + "attn.relative_position_bias_table")[idx]
                    .reshape(win * win, win * win, nh).permute(2, 0, 1))
            attn = torch.softmax(attn + bias[None], -1)
            o = (attn @ v).permute(0, 2, 1, 3).reshape(-1, win * win, d)
            o = o @ t(p + "attn.proj.weight").T + t(p + "attn.proj.bias")
            o = (o.reshape(Hs // win, Ws // win, win, win, d)
                 .permute(0, 2, 1, 3, 4).reshape(Hs, Ws, d))
            x = short + o
            h = _ln(x, t(p + "norm2.weight"), t(p + "norm2.bias"), d)
            h = F.gelu(h @ t(p + "mlp.fc1.weight").T + t(p + "mlp.fc1.bias"))
            x = x + h @ t(p + "mlp.fc2.weight").T + t(p + "mlp.fc2.bias")
            feats_t.append(_ln(x, t(f"backbone.norm{st}.weight"),
                               t(f"backbone.norm{st}.bias"), d))
            if st < 3:
                xm = x.reshape(Hs // 2, 2, Ws // 2, 2, d)
                xm = torch.cat(
                    [xm[:, 0, :, 0], xm[:, 1, :, 0], xm[:, 0, :, 1], xm[:, 1, :, 1]],
                    -1,
                )
                mp = f"backbone.layers.{st}.downsample."
                xm = _ln(xm, t(mp + "norm.weight"), t(mp + "norm.bias"), 4 * d)
                x = xm @ t(mp + "reduction.weight").T
                d *= 2
        c2, c3, c4, c5 = feats_t            # strides 4, 8, 16, 32

        # ---- pixel decoder (CHECKPOINT level order 32, 16, 8, 64) ----
        shapes_ck = [(4, 4), (8, 8), (16, 16), (2, 2)]
        src_of = {32: c5, 16: c4, 8: c3}
        toks, poss = [], []
        for j, stride in enumerate((32, 16, 8, 64)):
            if stride <= 32:
                xin = src_of[stride].permute(2, 0, 1)[None]
                xp = F.conv2d(xin, t(pd + f"input_proj.{j}.0.weight"),
                              t(pd + f"input_proj.{j}.0.bias"))
            else:  # stride-64 extra: 3x3/s2 pad 1 on raw res5
                xin = c5.permute(2, 0, 1)[None]
                xp = F.conv2d(xin, t(pd + f"input_proj.{j}.0.weight"),
                              t(pd + f"input_proj.{j}.0.bias"),
                              stride=2, padding=1)
            xp = F.group_norm(xp, 32, t(pd + f"input_proj.{j}.1.weight"),
                              t(pd + f"input_proj.{j}.1.bias"), eps=1e-5)
            h_, w_ = shapes_ck[j]
            assert xp.shape[-2:] == (h_, w_)
            toks.append(xp[0].reshape(C, h_ * w_).T)
            poss.append(_sine_cumsum_pos(h_, w_, C)
                        + t(pd + "transformer.level_embed")[j])
        src = torch.cat(toks, 0)
        pos = torch.cat(poss, 0)

        refs = []
        for (h_, w_) in shapes_ck:
            ys, xs = np.meshgrid((np.arange(h_) + 0.5) / h_,
                                 (np.arange(w_) + 0.5) / w_, indexing="ij")
            refs.append(np.stack([xs, ys], -1).reshape(-1, 2))
        ref = torch.tensor(np.concatenate(refs, 0).astype(np.float32))
        starts = np.cumsum([0] + [h_ * w_ for h_, w_ in shapes_ck])
        normalizer = torch.tensor([(w_, h_) for (h_, w_) in shapes_ck],
                                  dtype=torch.float32)

        def msda_enc(base, q, v_in):
            Lq = q.shape[0]
            hd = C // nH
            vv = v_in @ t(base + ".value_proj.weight").T + t(base + ".value_proj.bias")
            off = (q @ t(base + ".sampling_offsets.weight").T
                   + t(base + ".sampling_offsets.bias")).reshape(Lq, nH, L, K, 2)
            aw = (q @ t(base + ".attention_weights.weight").T
                  + t(base + ".attention_weights.bias")).reshape(Lq, nH, L * K)
            aw = torch.softmax(aw, -1).reshape(Lq, nH, L, K)
            loc = ref[:, None, None, None, :] + off / normalizer[None, None, :, None, :]
            out = torch.zeros(Lq, nH, hd)
            for lvl, (h_, w_) in enumerate(shapes_ck):
                vl = (vv[starts[lvl]:starts[lvl + 1]]
                      .reshape(h_, w_, nH, hd).permute(2, 3, 0, 1))
                g = (loc[:, :, lvl] * 2.0 - 1.0).permute(1, 0, 2, 3)
                sm = F.grid_sample(vl, g, mode="bilinear",
                                   padding_mode="zeros", align_corners=False)
                out += (sm * aw[:, :, lvl].permute(1, 0, 2)[:, None]).sum(-1).permute(2, 0, 1)
            return (out.reshape(Lq, C) @ t(base + ".output_proj.weight").T
                    + t(base + ".output_proj.bias"))

        xsrc = src
        for l in range(cfg.enc_layers):
            b = pd + f"transformer.encoder.layers.{l}"
            a = msda_enc(b + ".self_attn", xsrc + pos, xsrc)
            xsrc = _ln(xsrc + a, t(b + ".norm1.weight"), t(b + ".norm1.bias"), C)
            f1 = torch.relu(xsrc @ t(b + ".linear1.weight").T + t(b + ".linear1.bias"))
            f2 = f1 @ t(b + ".linear2.weight").T + t(b + ".linear2.bias")
            xsrc = _ln(xsrc + f2, t(b + ".norm2.weight"), t(b + ".norm2.bias"), C)

        # FPN to stride 4: stride-8 encoder block (ckpt index 2) up to res2
        h8, w8 = shapes_ck[2]
        enc8 = xsrc[starts[2]:starts[3]].reshape(h8, w8, C).permute(2, 0, 1)[None]
        lat = F.conv2d(c2.permute(2, 0, 1)[None], t(pd + "adapter_1.weight"))
        lat = F.group_norm(lat, 32, t(pd + "adapter_1.norm.weight"),
                           t(pd + "adapter_1.norm.bias"), eps=1e-5)
        up = F.interpolate(enc8, size=(32, 32), mode="bilinear",
                           align_corners=False)
        fused = F.conv2d(lat + up, t(pd + "layer_1.weight"), padding=1)
        fused = F.group_norm(fused, 32, t(pd + "layer_1.norm.weight"),
                             t(pd + "layer_1.norm.bias"), eps=1e-5)
        fused = torch.relu(fused)
        mf = F.conv2d(fused, t(pd + "mask_features.weight"),
                      t(pd + "mask_features.bias"))
        want_mf = mf[0].permute(1, 2, 0)                       # [32, 32, 16]

        # ---- two-stage query decoder (checkpoint level order) ----
        tt = lambda k: torch.tensor(state[pr + k])
        lin = lambda xx, k: xx @ tt(k + ".weight").T + tt(k + ".bias")
        lnp = lambda xx, k: _ln(xx, tt(k + ".weight"), tt(k + ".bias"), C)
        tce = torch.tensor(ce)
        cls_w = torch.tensor(state[pr + "class_embed"])
        logit_scale = float(state[pr + "lang_encoder.logit_scale"].reshape(()))

        def class_logits(xx):
            p_ = xx @ cls_w
            p_ = p_ / (p_.norm(dim=-1, keepdim=True) + 1e-6)
            return (p_ @ tce.T) * np.exp(logit_scale)

        props, valids = [], []
        for lvl, (h_, w_) in enumerate(shapes_ck):
            ys, xs = np.meshgrid((np.arange(h_) + 0.5) / h_,
                                 (np.arange(w_) + 0.5) / w_, indexing="ij")
            ctr = np.stack([xs, ys], -1).reshape(-1, 2)
            wh = np.full((h_ * w_, 2), 0.05 * 2.0 ** lvl)
            pp = np.concatenate([ctr, wh], -1)
            props.append(pp)
            valids.append(((pp > 0.01) & (pp < 0.99)).all(-1))
        props = torch.tensor(np.concatenate(props, 0).astype(np.float32))
        valid = torch.tensor(np.concatenate(valids, 0))
        # every proposal is interior at these grid sizes; the border
        # validity rule itself is pinned by TestQueryDecoderGlueGolden

        out_mem = torch.where(valid[:, None], xsrc, torch.tensor(0.0))
        enc_out = lnp(lin(out_mem, "enc_output"), "enc_output_norm")
        scores = class_logits(enc_out).max(-1).values
        top = torch.topk(scores, Q).indices

        n_dec = cfg.dec_layers
        delta = enc_out
        for i in (0, 1, 2):
            delta = lin(delta, f"bbox_embed.{n_dec}.layers.{i}")
            if i != 2:
                delta = torch.relu(delta)
        plog = torch.where(valid[:, None],
                           torch.log(props / (1.0 - props)),
                           torch.tensor(float("inf")))
        tq = enc_out[top]
        tb = torch.sigmoid(plog + delta)[top]

        def sine1d(v_, half):
            dim_t = 10000.0 ** (
                2.0 * (torch.arange(half, dtype=torch.float64) // 2) / half)
            ang = (v_.double() * 2.0 * np.pi) / dim_t
            out = torch.empty(v_.shape[0], half, dtype=torch.float64)
            out[:, 0::2] = torch.sin(ang[:, 0::2])
            out[:, 1::2] = torch.cos(ang[:, 1::2])
            return out

        half = C // 2
        hd = C // nH
        for l in range(cfg.dec_layers):
            bl = f"decoder.layers.{l}"
            sine = torch.cat(
                [sine1d(tb[:, i:i + 1], half) for i in (1, 0, 2, 3)], -1
            ).float()
            qpos = lin(torch.relu(lin(sine, "decoder.ref_point_head.layers.0")),
                       "decoder.ref_point_head.layers.1")
            inw = tt(bl + ".self_attn.in_proj_weight")
            inb = tt(bl + ".self_attn.in_proj_bias")
            qk = tq + qpos
            qh = (qk @ inw[:C].T + inb[:C]).reshape(Q, nH, hd)
            kh = (qk @ inw[C:2 * C].T + inb[C:2 * C]).reshape(Q, nH, hd)
            vh = (tq @ inw[2 * C:].T + inb[2 * C:]).reshape(Q, nH, hd)
            att = torch.softmax(
                torch.einsum("qhd,khd->hqk", qh, kh) / np.sqrt(hd), -1)
            sa = torch.einsum("hqk,khd->qhd", att, vh).reshape(Q, C)
            sa = lin(sa, bl + ".self_attn.out_proj")
            tq = lnp(tq + sa, bl + ".norm2")

            q2 = tq + qpos
            v_ = lin(xsrc, bl + ".cross_attn.value_proj")
            off = lin(q2, bl + ".cross_attn.sampling_offsets").reshape(
                Q, nH, L, K, 2)
            aw = lin(q2, bl + ".cross_attn.attention_weights").reshape(
                Q, nH, L * K)
            aw = torch.softmax(aw, -1).reshape(Q, nH, L, K)
            loc = (tb[:, None, None, None, :2]
                   + off / K * tb[:, None, None, None, 2:] * 0.5)
            ca = torch.zeros(Q, nH, hd)
            for lvl, (h_, w_) in enumerate(shapes_ck):
                vl = (v_[starts[lvl]:starts[lvl + 1]]
                      .reshape(h_, w_, nH, hd).permute(2, 3, 0, 1))
                g = (loc[:, :, lvl] * 2.0 - 1.0).permute(1, 0, 2, 3)
                sm = F.grid_sample(vl, g, mode="bilinear",
                                   padding_mode="zeros", align_corners=False)
                ca += (sm * aw[:, :, lvl].permute(1, 0, 2)[:, None]).sum(-1).permute(2, 0, 1)
            ca = lin(ca.reshape(Q, C), bl + ".cross_attn.output_proj")
            tq = lnp(tq + ca, bl + ".norm1")
            ff = lin(torch.relu(lin(tq, bl + ".linear1")), bl + ".linear2")
            tq = lnp(tq + ff, bl + ".norm3")
            bdelta = tq
            for i in (0, 1, 2):
                bdelta = lin(bdelta, f"bbox_embed.{l}.layers.{i}")
                if i != 2:
                    bdelta = torch.relu(bdelta)
            tb = torch.sigmoid(torch.log(tb / (1.0 - tb)) + bdelta)

        dec = lnp(tq, "decoder_norm")
        want_cls = class_logits(dec).numpy()
        z = dec
        for i in (0, 1, 2):
            z = lin(z, f"mask_embed.layers.{i}")
            if i != 2:
                z = torch.relu(z)
        # masks are computed against the stride-4 mask features
        want_masks = torch.einsum("qc,hwc->qhw", z, want_mf).numpy()
        want_boxes = tb.numpy()
        want_q = dec.numpy()

        # ================= ours: the WHOLE OpenSeedSegmenter =================
        seg = OpenSeedSegmenter(cfg)
        out = jax.jit(
            lambda p, im, c: seg.apply({"params": p}, im, c)
        )(params, jnp.asarray(img), jnp.asarray(ce))

        np.testing.assert_allclose(
            np.asarray(out["mask_features"]), want_mf.numpy(),
            rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out["query_embed"]), want_q, rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["cls_logits"]), want_cls, rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["boxes"]), want_boxes, rtol=2e-3, atol=2e-3
        )
        scale = max(1.0, float(np.abs(want_masks).max()))
        np.testing.assert_allclose(
            np.asarray(out["masks"]) / scale, want_masks / scale,
            rtol=2e-3, atol=2e-3,
        )


def torch_tiny_r50_mirror(state, img_hwc):
    """Independent torch mirror of the mmdet ResNet backbone at the
    tiny_r50 test geometry (depths 1/1/1/1, base 8): stem 7x7/s2 +
    eval-mode BN + 3x3/s2 maxpool, one bottleneck per stage with the
    stride on conv2 (mmdet pytorch-style) and a projection shortcut on
    every first block.  Returns 4 HWC numpy maps (strides 4/8/16/32)."""
    import torch
    import torch.nn.functional as F

    t = lambda k: torch.tensor(state["backbone." + k])

    def bn(x, base, eps=1e-5):
        return F.batch_norm(
            x, t(base + ".running_mean"), t(base + ".running_var"),
            t(base + ".weight"), t(base + ".bias"),
            training=False, eps=eps,
        )

    x = torch.tensor(np.asarray(img_hwc).transpose(2, 0, 1))[None]
    x = F.conv2d(x, t("conv1.weight"), stride=2, padding=3)
    x = torch.relu(bn(x, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)

    outs = []
    for st in range(4):
        p = f"layer{st + 1}.0."
        stride = 1 if st == 0 else 2
        res = F.conv2d(x, t(p + "downsample.0.weight"), stride=stride)
        res = bn(res, p + "downsample.1")
        h = torch.relu(bn(F.conv2d(x, t(p + "conv1.weight")), p + "bn1"))
        h = F.conv2d(h, t(p + "conv2.weight"), stride=stride, padding=1)
        h = torch.relu(bn(h, p + "bn2"))
        h = bn(F.conv2d(h, t(p + "conv3.weight")), p + "bn3")
        x = torch.relu(h + res)
        outs.append(x[0].permute(1, 2, 0).numpy())
    return outs


class TestMmdetFullTrunkGolden:
    """Assembled v1/v2/v3-family trunk golden: ONE converted
    ``Mask2FormerSegmenter`` forward (tiny R50 -> MSDeformAttn pixel
    decoder -> masked transformer decoder -> cls/masks/mask_features)
    against the composed torch mirrors.  Pins the seams the per-stage
    goldens (tests/test_weight_convert.py) cover only transitively:
    which backbone map feeds which input projection, the memory level
    layout handed to the decoder, and the R50 value path itself (stem
    pad/pool, frozen-BN folding, stride placement).  Reference contract:
    mmdet Mask2Former via /root/reference/kings_sgg/models/detectors/
    mask2former_relation.py:318-330 + configs/psg/baseline_r50.py:26-109."""

    def test_whole_converted_m2f_trunk_matches_torch_mirror(self):
        from test_weight_convert import (
            synthetic_mmdet_m2f_state,
            torch_m2f_masked_decoder_mirror,
            torch_m2f_pixel_decoder_mirror,
        )

        from openpsg_tpu.models.segmenter.mask2former import (
            Mask2FormerConfig,
            Mask2FormerSegmenter,
        )
        from openpsg_tpu.models.segmenter.weight_convert import (
            convert_mask2former,
        )

        state = synthetic_mmdet_m2f_state(enc=2, dec=3)
        cfg = Mask2FormerConfig(
            backbone="tiny_r50", dim=32, mask_dim=32, num_queries=10,
            enc_layers=2, dec_layers=3, ffn_hidden=64, num_classes=8,
        )
        params = convert_mask2former(state, cfg)

        rng = np.random.default_rng(7)
        img = rng.normal(size=(64, 64, 3)).astype(np.float32)

        # ---- composed torch mirrors ----
        feats = torch_tiny_r50_mirror(state, img)
        want_mem, want_mf = torch_m2f_pixel_decoder_mirror(
            state, feats, enc_layers=2, C=32
        )
        want_q, want_cls, want_masks = torch_m2f_masked_decoder_mirror(
            state, want_mem, want_mf, n_layers=3,
            shapes_int=[(8, 8), (4, 4), (2, 2)], C=32,
        )

        # ---- ours: the WHOLE segmenter, one jitted forward ----
        seg = Mask2FormerSegmenter(cfg)
        out = jax.jit(
            lambda p, im: seg.apply({"params": p}, im)
        )(params, jnp.asarray(img))

        np.testing.assert_allclose(
            np.asarray(out["mask_features"]), want_mf, rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["query_embed"]), want_q, rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["cls_logits"]), want_cls, rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["masks"]), want_masks, rtol=1e-3, atol=2e-3
        )
