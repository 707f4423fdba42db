from openpsg_tpu.models.commons.text_encoder import (  # noqa: F401
    BertStyleEncoder,
    BertStyleConfig,
)
from openpsg_tpu.models.commons.graph_transformer import GraphTransformer  # noqa: F401
from openpsg_tpu.models.commons.interactive_fusion import InteractiveFusionModule  # noqa: F401
