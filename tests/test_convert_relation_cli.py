"""tools/convert_relation.py — reference .pth → orbax part-checkpoint.

Round-trips a synthetic reference checkpoint (torch state_dict with the
reference's key names, mmcv save format) through the CLI and asserts the
orbax part-checkpoint restores into the exact values
convert_relation_head_v1 produces, with the epoch meta preserved (the
``tools/infer.py --epoch`` addressing contract)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tfs = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

R = 7

CONFIG = """
model = dict(
    type='Mask2FormerRelation',
    relation_head=dict(
        type='RelationTransformerHead',
        num_transformer_layer=2,
        input_feature_size=16,
        relation_classes={relations!r},
    ),
)
relation_classes = {relations!r}
tpu = dict(segmenter_preset='tiny')
"""


def _torch_head():
    torch.manual_seed(0)

    class Head(torch.nn.Module):
        def __init__(self):
            super().__init__()
            bert = tfs.BertModel(tfs.BertConfig(
                vocab_size=64, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=64,
                max_position_embeddings=32,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            ))
            wrap = torch.nn.Module()
            wrap.model = bert
            self.model = wrap
            self.fc_input = torch.nn.Sequential(
                torch.nn.Linear(16, 32), torch.nn.LayerNorm(32))
            self.fc_output = torch.nn.Sequential(
                torch.nn.Linear(32, 32), torch.nn.LayerNorm(32))
            self.cls_q = torch.nn.Linear(32, R * 64)
            self.cls_k = torch.nn.Linear(32, R * 64)

    return Head()


class TestConvertRelationCLI:
    def test_v1_roundtrip(self, tmp_path):
        from openpsg_tpu.core.config import Config
        from openpsg_tpu.models.relation.weight_convert import (
            convert_relation_head_v1,
        )
        from openpsg_tpu.train.checkpoint import PartCheckpointer
        from tools.convert_relation import main

        head = _torch_head()
        state = {f"relation_head.{k}": v for k, v in head.state_dict().items()}
        state["object_cls_embed.weight"] = torch.randn(133, 16)
        pth = tmp_path / "epoch_3.pth"
        torch.save({"state_dict": state, "meta": {"epoch": 3}}, pth)

        relations = [f"rel{i}" for i in range(R)]
        cfg_file = tmp_path / "cfg.py"
        cfg_file.write_text(CONFIG.format(relations=relations))

        out_dir = tmp_path / "ckpts"
        main([str(pth), "--config", str(cfg_file),
              "--out", str(out_dir), "--verify"])

        ckpt = PartCheckpointer(str(out_dir))
        step = ckpt.step_for_epoch(3)
        assert step is not None
        params, _, meta, _ = ckpt.restore(step=step)
        ckpt.close()
        assert meta["epoch"] == 3

        # values must equal a direct conversion
        cfg = Config.fromfile(str(cfg_file), import_custom_modules=False)
        from openpsg_tpu.core.builder import m2f_relation_config

        mcfg = m2f_relation_config(cfg)
        np_state = {k: v.numpy() for k, v in state.items()}
        want = convert_relation_head_v1(
            {k[len("relation_head."):]: v for k, v in np_state.items()
             if k.startswith("relation_head.")},
            mcfg.head_v1,
        )
        got = params["head"]["params"]
        np.testing.assert_allclose(
            np.asarray(got["cls_q"]["kernel"]),
            want["cls_q"]["kernel"], atol=0,
        )
        np.testing.assert_allclose(
            np.asarray(
                got["encoder"]["layers"]["self_attn"]["query"]["kernel"]
            ),
            want["encoder"]["layers"]["self_attn"]["query"]["kernel"],
            atol=0,
        )
        np.testing.assert_allclose(
            np.asarray(params["object_cls_embed"]),
            np_state["object_cls_embed.weight"], atol=0,
        )

    def test_v3_roundtrip_with_meta_trunk(self, tmp_path):
        """v3 checkpoints carry the TRAINED Meta-layout llama trunk
        (freeze_layers omit it) — the CLI must bridge it into the head's
        ``llama`` scope, minus the lm_head our return_hidden trunk never
        instantiates."""
        import importlib.util
        import os

        ref_path = "/root/reference/kings_sgg/models/commons/llama.py"
        if not os.path.exists(ref_path):
            pytest.skip("reference tree not available")
        spec = importlib.util.spec_from_file_location("ref_llama3", ref_path)
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)

        from openpsg_tpu.train.checkpoint import PartCheckpointer
        from tools.convert_relation import main

        torch.manual_seed(1)
        args = ref.ModelArgs(
            dim=32, n_layers=2, n_heads=4, vocab_size=97,
            multiple_of=16, norm_eps=1e-5, max_seq_len=64,
        )
        if not hasattr(args, "shave_language_decoder_at"):
            args.shave_language_decoder_at = 0
        trunk = ref.LlamaTransformer(args)

        class HeadV3(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.llama_model = trunk
                self.fc_object_vision_only_input = torch.nn.Sequential(
                    torch.nn.Linear(16, 32), torch.nn.LayerNorm(32))
                self.fc_object_vision_only_output = torch.nn.Sequential(
                    torch.nn.Linear(32, 16), torch.nn.LayerNorm(16))
                self.object_vision_only_sub_pred = torch.nn.Linear(16, 16 * R)
                self.object_vision_only_obj_pred = torch.nn.Linear(16, 16 * R)

        head = HeadV3()
        state = {f"relation_head.{k}": v for k, v in head.state_dict().items()}
        state["object_cls_embed.weight"] = torch.randn(133, 16)
        pth = tmp_path / "epoch_5.pth"
        torch.save({"state_dict": state, "meta": {"epoch": 5}}, pth)

        relations = [f"rel{i}" for i in range(R)]
        cfg_file = tmp_path / "cfg.py"
        cfg_file.write_text(
            "model = dict(\n"
            "    type='Mask2FormerRelationV2',\n"
            "    relation_head=dict(\n"
            "        type='RelationTransformerHeadV3',\n"
            "        input_feature_size=16,\n"
            "        output_feature_size=16,\n"
            "        shave_language_decoder_at=2,\n"
            "        causal_mask=True,\n"
            f"        relation_classes={relations!r},\n"
            "    ),\n"
            ")\n"
            f"relation_classes = {relations!r}\n"
            "tpu = dict(segmenter_preset='tiny',\n"
            "           llm=dict(vocab_size=97, dim=32, n_heads=4,\n"
            "                    n_kv_heads=4, ffn_hidden=96,\n"
            "                    max_seq_len=64))\n"
        )

        out_dir = tmp_path / "ckpts"
        main([str(pth), "--config", str(cfg_file),
              "--out", str(out_dir), "--verify"])

        ckpt = PartCheckpointer(str(out_dir))
        params, _, meta, _ = ckpt.restore(step=ckpt.step_for_epoch(5))
        ckpt.close()
        hp = params["head"]["params"]
        assert "llama" in hp and "lm_head" not in hp["llama"]
        # trunk embedding rides along (Meta tok_embeddings)
        got_norm = np.asarray(hp["llama"]["final_norm"]["weight"])
        np.testing.assert_allclose(
            got_norm, trunk.state_dict()["norm.weight"].numpy(), atol=0
        )

    def test_imported_checkpoint_drives_infer(self, tmp_path):
        """Full user journey: reference .pth → tools/convert_relation.py →
        tools/infer.py --checkpoint on a synthetic dataset.  The typed
        orbax restore must accept the imported tree into the BUILT
        detector (geometry comes from the same config), and the tool
        must write a complete submission."""
        import os
        import sys

        from fixtures import make_fixture
        from tools.convert_relation import main as convert_main

        root = str(tmp_path / "fx")
        ann = make_fixture(root, n_images=2, hw=(64, 64))

        torch.manual_seed(0)

        class Head(torch.nn.Module):
            def __init__(self):
                super().__init__()
                bert = tfs.BertModel(tfs.BertConfig(
                    vocab_size=64, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=64,
                    max_position_embeddings=32,
                    hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0,
                ))
                wrap = torch.nn.Module()
                wrap.model = bert
                self.model = wrap
                self.fc_input = torch.nn.Sequential(
                    torch.nn.Linear(32, 32), torch.nn.LayerNorm(32))
                self.fc_output = torch.nn.Sequential(
                    torch.nn.Linear(32, 32), torch.nn.LayerNorm(32))
                self.cls_q = torch.nn.Linear(32, 56 * 64)
                self.cls_k = torch.nn.Linear(32, 56 * 64)

        state = {f"relation_head.{k}": v
                 for k, v in Head().state_dict().items()}
        state["object_cls_embed.weight"] = torch.randn(133, 32)
        pth = tmp_path / "epoch_2.pth"
        torch.save({"state_dict": state, "meta": {"epoch": 2}}, pth)

        cfg_file = tmp_path / "cfg.py"
        cfg_file.write_text(
            "model = dict(\n"
            "    type='Mask2FormerRelation',\n"
            "    relation_head=dict(\n"
            "        type='RelationTransformerHead',\n"
            "        input_feature_size=32,\n"
            "    ),\n"
            ")\n"
            f"data = dict(test=dict(ann_file={ann!r}, img_prefix={root!r}))\n"
            "tpu = dict(segmenter_preset='tiny')\n"
        )
        ckpt_dir = str(tmp_path / "ckpts")
        convert_main([str(pth), "--config", str(cfg_file),
                      "--out", ckpt_dir, "--verify"])

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools"))
        import infer as infer_tool

        out_dir = str(tmp_path / "out")
        argv_save = sys.argv
        sys.argv = [
            "infer.py", "--config", str(cfg_file), "--checkpoint", ckpt_dir,
            "--output-dir", out_dir,
            "--img-scale", "64", "64", "--seed", "0",
        ]
        try:
            infer_tool.main()
        finally:
            sys.argv = argv_save

        sub = os.path.join(out_dir, "submission", "relation.json")
        assert os.path.exists(sub)
        import json

        with open(sub) as f:
            records = json.load(f)
        assert len(records) == 1 and records[0]["relations"]
