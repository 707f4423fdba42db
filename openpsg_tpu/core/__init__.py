from openpsg_tpu.core.config import Config
from openpsg_tpu.core.registry import Registry, DETECTORS, HEADS, DATASETS, build_from_cfg

__all__ = ["Config", "Registry", "DETECTORS", "HEADS", "DATASETS", "build_from_cfg"]
