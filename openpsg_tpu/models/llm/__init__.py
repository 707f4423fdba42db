from openpsg_tpu.models.llm.llama import Llama, LlamaConfig, init_kv_cache  # noqa: F401
from openpsg_tpu.models.llm.decode import greedy_decode  # noqa: F401
