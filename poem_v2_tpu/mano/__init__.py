from .layer import ManoLayer, ManoOutput
from .model import ManoModel, default_mano, load_mano_pkl, synthetic_mano
