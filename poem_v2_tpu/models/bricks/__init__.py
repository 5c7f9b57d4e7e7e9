from .attention import MLP, BertFFN, MultiHeadCrossAttention
from .point_transformer import PtCrossAttnBlock, PtSelfAttnBlock
