"""Hierarchical configuration tree.

TPU-native re-design of the reference's yacs-based config system
(reference: lib/utils/config.py:8-106). Same capabilities — recursive
node construction from nested dicts, YAML round-trip, CLI override of
``BATCH_SIZE`` / ``PRETRAINED``, freezing after merge — implemented as a
small first-party class with no external deps beyond PyYAML.
"""

from __future__ import annotations

import copy
import io
from typing import Any, Dict, Optional

import yaml


class Config(dict):
    """A dict with attribute access, recursive conversion and freezing.

    Mirrors the behaviour of the reference ``CN`` node
    (lib/utils/config.py:14-43): nested dicts become ``Config`` nodes,
    lists of dicts become lists of ``Config`` nodes.
    """

    __slots__ = ("_frozen",)

    def __init__(self, init: Optional[Dict[str, Any]] = None):
        super().__init__()
        object.__setattr__(self, "_frozen", False)
        if init:
            for k, v in init.items():
                self[k] = _convert(v)

    # -- attribute access ------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __setitem__(self, key: str, value: Any) -> None:
        if self.frozen:
            raise AttributeError(f"Config is frozen; cannot set {key!r}")
        super().__setitem__(key, _convert(value))

    # -- freeze ------------------------------------------------------------
    @property
    def frozen(self) -> bool:
        return object.__getattribute__(self, "_frozen")

    def freeze(self, recursive: bool = True) -> "Config":
        object.__setattr__(self, "_frozen", True)
        if recursive:
            for v in self.values():
                if isinstance(v, Config):
                    v.freeze()
                elif isinstance(v, list):
                    for item in v:
                        if isinstance(item, Config):
                            item.freeze()
        return self

    def defrost(self) -> "Config":
        object.__setattr__(self, "_frozen", False)
        for v in self.values():
            if isinstance(v, Config):
                v.defrost()
            elif isinstance(v, list):
                for item in v:
                    if isinstance(item, Config):
                        item.defrost()
        return self

    # -- merge / io --------------------------------------------------------
    def merge(self, other: Dict[str, Any]) -> "Config":
        """Recursively merge ``other`` on top of this config."""
        for k, v in other.items():
            if k in self and isinstance(self[k], Config) and isinstance(v, dict):
                self[k].merge(v)
            else:
                self[k] = v
        return self

    def clone(self) -> "Config":
        node = Config(self.to_dict())
        return node

    def to_dict(self) -> Dict[str, Any]:
        return _deconvert(self)

    def dump(self, stream=None) -> str:
        """YAML round-trip (reference lib/utils/config.py:28-43)."""
        text = yaml.safe_dump(self.to_dict(), sort_keys=False)
        if stream is not None:
            stream.write(text)
        return text

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        with open(path, "r") as f:
            data = yaml.safe_load(f)
        return cls(data or {})

    @classmethod
    def from_string(cls, text: str) -> "Config":
        return cls(yaml.safe_load(io.StringIO(text)) or {})

    def __deepcopy__(self, memo):
        return Config(copy.deepcopy(self.to_dict(), memo))

    def __reduce__(self):
        return (Config, (self.to_dict(),))


def _convert(v: Any) -> Any:
    if isinstance(v, Config):
        return v
    if isinstance(v, dict):
        return Config(v)
    if isinstance(v, (list, tuple)):
        return [_convert(x) for x in v]
    return v


def _deconvert(v: Any) -> Any:
    if isinstance(v, Config):
        return {k: _deconvert(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_deconvert(x) for x in v]
    return v


# Defaults mirroring the reference TRAIN block (lib/utils/config.py:46-63).
DEFAULT_TRAIN = {
    "MANUAL_SEED": 1,
    "CONV_REPEATABLE": True,
    "BATCH_SIZE": 8,
    "EPOCH": 10,
    "OPTIMIZER": "adam",
    "LR": 1e-4,
    "SCHEDULER": "StepLR",
    "LR_DECAY_GAMMA": 0.1,
    "LR_DECAY_STEP": [7],
    "LOG_INTERVAL": 10,
    "FIND_UNUSED_PARAMETERS": False,
    "GRAD_CLIP_ENABLED": True,
    "GRAD_CLIP": {"TYPE": 2, "NORM": 1.0},
    "WEIGHT_DECAY": 0.0,
}


def get_config(
    config_file: str,
    arg: Optional[Any] = None,
    merge: bool = True,
) -> Config:
    """Load a YAML experiment config, optionally merging CLI overrides.

    Mirrors reference ``get_config`` (lib/utils/config.py:76-106):
    ``arg.batch_size`` overrides ``TRAIN.BATCH_SIZE``; ``arg.reload``
    overrides ``MODEL.PRETRAINED``. The returned config is frozen.
    """
    cfg = Config({"TRAIN": copy.deepcopy(DEFAULT_TRAIN)})
    file_cfg = Config.from_yaml(config_file)
    cfg.merge(file_cfg)

    if merge and arg is not None:
        batch_size = getattr(arg, "batch_size", None)
        if batch_size:
            cfg.TRAIN.BATCH_SIZE = batch_size
        reload_ckpt = getattr(arg, "reload", None)
        if reload_ckpt:
            if "MODEL" not in cfg:
                cfg.MODEL = {}
            cfg.MODEL.PRETRAINED = reload_ckpt
        val_batch_size = getattr(arg, "val_batch_size", None)
        if val_batch_size:
            cfg.TRAIN.VAL_BATCH_SIZE = val_batch_size

    cfg.freeze()
    return cfg
