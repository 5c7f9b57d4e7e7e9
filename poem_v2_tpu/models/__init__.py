from .backbones.hrnet import HRNet
from .backbones.resnet import ResNet
from .cmr import CMRG, create_cmr_model
from .decoder import PtEmbedDecoder
from .decoder_v2 import PtEmbedTRv2
from .decoder_v3 import PtEmbedTRv3
from .heads.ptemb_head import POEMGeneralizedHead, generate_bps_basis
from .heads.v1_heads import (
    POEMPositionEmbeddedAggregationHead,
    POEMProjectiveSelfAggregationHead,
)
from .metro import METRONetwork, create_metro_model
from .mvp import MVP, MVPHead, create_mvp_model
from .petr import PETRHead, PETRMultiView, PETRTransformer, create_petr_model
from .poem import POEMNet, create_poem_model
from .pose2d import DarkPose, IntegralDeconvHead, IntegralPose, create_integral_pose
