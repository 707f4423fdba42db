from openpsg_tpu.eval.pq import panoptic_quality  # noqa: F401
from openpsg_tpu.eval.sgg_metrics import sgg_recall  # noqa: F401
