_base_ = ['baseline_r50.py']
tpu = dict(_delete_=True, segmenter_preset='tiny', head_preset='tiny',
           llm_preset='tiny', bf16=False, mesh=dict(dp=8, tp=1))
