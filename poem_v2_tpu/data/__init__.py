from .collate import batch_iterator, collate_padded, pad_views
from .synthetic import SyntheticMultiviewDataset
from .transforms import SimpleTransform3DMultiView
from .wds import MixWebDataset, MultiviewWebDataset, expand_urls


def create_dataset(cfg, data_preset=None, is_train: bool = True, **kwargs):
    """Dataset factory (reference lib/datasets/__init__.py:14-35).

    MixWebDataset configs carry a DATASET_LIST of per-dataset blocks with
    MIX_RATIO; single-source configs build one MultiviewWebDataset.
    """
    if cfg.TYPE == "MixWebDataset":
        names = cfg.DATASET_LIST
        datasets, ratios = [], []
        for name in names:
            sub = cfg[name]
            datasets.append(
                MultiviewWebDataset(sub, data_preset=data_preset, is_train=is_train, **kwargs)
            )
            ratios.append(sub.MIX_RATIO)
        return MixWebDataset(datasets, ratios)
    if cfg.TYPE in ("MultiviewWebDataset", "WebDataset"):
        return MultiviewWebDataset(cfg, data_preset=data_preset, is_train=is_train, **kwargs)
    if cfg.TYPE == "Synthetic":
        return SyntheticMultiviewDataset(
            view_max=cfg.get("VIEW_MAX", 8), image_size=cfg.get("IMAGE_SIZE", 256)
        )
    raise ValueError(f"unknown dataset TYPE {cfg.TYPE!r}")
