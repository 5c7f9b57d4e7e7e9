from .attention import MLP, BertFFN, MultiHeadCrossAttention
from .point_transformer import PtCrossAttnBlock, PtSelfAttnBlock
from .transformer_layer import (
    FFN,
    BaseTransformerLayer,
    MultiheadAttention,
    TransformerLayerSequence,
)
