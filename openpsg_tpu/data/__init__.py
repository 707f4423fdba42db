from openpsg_tpu.data import vocab  # noqa: F401
