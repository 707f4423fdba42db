from openpsg_tpu.models.segmenter.swin import SwinTransformer  # noqa: F401
from openpsg_tpu.models.segmenter.openseed import OpenSeedSegmenter, SegmenterConfig  # noqa: F401
from openpsg_tpu.models.segmenter.fusion import panoptic_fusion  # noqa: F401
