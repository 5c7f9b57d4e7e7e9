from .config import Config, get_config
from .logger import get_logger, logger, master_only
from .misc import CONST, param_size
from .registry import (
    BACKBONE,
    DATASET,
    HEAD,
    LOSS,
    MODEL,
    TRANSFORM,
    TRANSFORMER,
    Registry,
    build_backbone,
    build_dataset,
    build_from_cfg,
    build_head,
    build_model,
    build_transform,
    build_transformer,
)
