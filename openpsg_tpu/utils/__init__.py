from openpsg_tpu.utils.panoptic import rgb2id, id2rgb, random_colors  # noqa: F401
