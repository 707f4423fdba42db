from openpsg_tpu.models.relation.qformer import RelationQFormer, QFormerConfig  # noqa: F401
from openpsg_tpu.models.relation.tokenizer import WordTokenizer  # noqa: F401
