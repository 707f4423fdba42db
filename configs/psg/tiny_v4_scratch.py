# From-scratch smoke config: tiny widths AND a trainable LLM.
# Without pretrained Llama weights the frozen-LLM recipe cannot produce
# text; this variant unfreezes it (freeze_layers omits the language model)
# so the whole v4 pipeline trains end-to-end self-contained.
_base_ = ['tiny_v4_ov.py']

model = dict(
    train_cfg=dict(_delete_=True, freeze_layers=['openseed']),
)
work_dir = './work_dirs/tiny_v4_scratch'
