"""Component registries.

TPU-native equivalent of the reference's mmcv-style registry
(reference: lib/utils/builder.py:9-336). ``build_from_cfg`` keeps the
same contract: look up ``cfg.TYPE`` in the registry, merge extra kwargs
(uppercased) into a cloned cfg, and instantiate ``cls(cfg)``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

from .config import Config


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._module_dict: Dict[str, Callable] = {}

    def __contains__(self, key: str) -> bool:
        return key in self._module_dict

    def __repr__(self) -> str:
        return f"Registry(name={self.name}, items={list(self._module_dict)})"

    def get(self, key: str) -> Callable:
        if key not in self._module_dict:
            raise KeyError(
                f"{key!r} is not registered in registry {self.name!r}; "
                f"available: {sorted(self._module_dict)}"
            )
        return self._module_dict[key]

    def keys(self):
        return self._module_dict.keys()

    def register_module(self, name: Optional[str] = None, module: Optional[Callable] = None):
        """Use as a decorator: ``@MODEL.register_module()``."""
        if module is not None:
            self._register(module, name)
            return module

        def _wrapper(cls):
            self._register(cls, name)
            return cls

        return _wrapper

    # alias
    register = register_module

    def _register(self, module: Callable, name: Optional[str]) -> None:
        key = name or module.__name__
        if key in self._module_dict and self._module_dict[key] is not module:
            raise KeyError(f"{key!r} already registered in {self.name!r}")
        self._module_dict[key] = module


def build_from_cfg(cfg: Config, registry: Registry, **kwargs: Any):
    """Instantiate ``registry.get(cfg.TYPE)(cfg, **extras)``.

    Extra kwargs are merged (uppercased) into a cloned, defrosted cfg —
    same semantics as reference lib/utils/builder.py:9-47.
    """
    if "TYPE" not in cfg:
        raise KeyError(f"cfg for registry {registry.name!r} has no TYPE field: {cfg}")
    cls = registry.get(cfg.TYPE)
    cfg = cfg.clone()
    data_preset = kwargs.pop("data_preset", None)
    for k, v in kwargs.items():
        cfg[k.upper()] = v
    if data_preset is not None:
        cfg["DATA_PRESET"] = data_preset
    return cls(cfg)


# Global registries (reference lib/utils/builder.py:307-320).
MODEL = Registry("model")
DATASET = Registry("dataset")
BACKBONE = Registry("backbone")
HEAD = Registry("head")
LOSS = Registry("loss")
TRANSFORMER = Registry("transformer")
ATTENTION = Registry("attention")
TRANSFORM = Registry("transform")
POSITIONAL_ENCODING = Registry("positional_encoding")
METRIC = Registry("metric")
CALLBACK = Registry("callback")
OPTIMIZER = Registry("optimizer")


def build_model(cfg: Config, **kwargs):
    return build_from_cfg(cfg, MODEL, **kwargs)


def build_backbone(cfg: Config, **kwargs):
    return build_from_cfg(cfg, BACKBONE, **kwargs)


def build_head(cfg: Config, **kwargs):
    return build_from_cfg(cfg, HEAD, **kwargs)


def build_dataset(cfg: Config, **kwargs):
    return build_from_cfg(cfg, DATASET, **kwargs)


def build_transformer(cfg: Config, **kwargs):
    return build_from_cfg(cfg, TRANSFORMER, **kwargs)


def build_transform(cfg: Config, **kwargs):
    return build_from_cfg(cfg, TRANSFORM, **kwargs)


def build_loss(cfg: Config, **kwargs):
    return build_from_cfg(cfg, LOSS, **kwargs)
