from openpsg_tpu.models.detectors.psg_v4 import PSGv4, PSGv4Config  # noqa: F401
