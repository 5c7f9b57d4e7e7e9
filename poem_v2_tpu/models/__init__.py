from .backbones.hrnet import HRNet
from .backbones.resnet import ResNet
from .decoder import PtEmbedDecoder
from .heads.ptemb_head import POEMGeneralizedHead, generate_bps_basis
from .poem import POEMNet, create_poem_model
