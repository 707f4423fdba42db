from openpsg_tpu.ops.deform_attn import ms_deform_attn  # noqa: F401
from openpsg_tpu.ops.mask_ops import (  # noqa: F401
    mask_pool,
    pair_or_masks,
    downsample_mask_bilinear,
    downsample_nearest,
)
