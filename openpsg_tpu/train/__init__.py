from openpsg_tpu.train import losses  # noqa: F401
