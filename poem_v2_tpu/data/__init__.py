from .collate import batch_iterator, collate_padded, pad_views
from .synthetic import SyntheticMultiviewDataset
from .transforms import SimpleTransform3DMultiView
from .wds import MixWebDataset, MultiviewWebDataset, expand_urls


class SyntheticSampleStream:
    """Per-sample adapter over the synthetic generator so the standard
    ``batch_iterator``/``collate_padded`` path applies unchanged.

    ``fixed_set=True`` materialises the first ``epoch_size`` samples once
    and replays them every epoch — the overfit/convergence protocol
    (without it the generator streams fresh samples each epoch)."""

    def __init__(self, view_max=8, image_size=256, epoch_size=0, seed=0,
                 fixed_set=False, view_range=None, render=False):
        gen_kw = {}
        if view_range is not None:
            gen_kw["view_range"] = tuple(view_range)
        self._gen = SyntheticMultiviewDataset(
            batch_size=1, view_max=view_max, image_size=image_size, seed=seed,
            render=render, **gen_kw,
        )
        self.epoch_size = epoch_size
        self.fixed_set = fixed_set and epoch_size > 0
        self._cache = None

    def _draw(self):
        b = self._gen.sample_batch()
        n = int(b["view_mask"][0].sum())
        return {
            "image": b["image"][0, :n],
            "target_cam_intr": b["cam_intr"][0, :n],
            "target_cam_extr": b["cam_extr"][0, :n],
            "target_joints_2d": b["target_joints_2d"][0, :n],
            "master_joints_3d": b["master_joints_3d"][0],
            "master_verts_3d": b["master_verts_3d"][0],
            "mano_pose": b["mano_pose"][:1].repeat(n, 0),
            "mano_shape": b["mano_shape"][:1].repeat(n, 0),
        }

    def __iter__(self):
        import itertools

        if self.fixed_set:
            if self._cache is None:
                self._cache = [self._draw() for _ in range(self.epoch_size)]
            yield from self._cache
            return
        count = itertools.count() if not self.epoch_size else range(self.epoch_size)
        for _ in count:
            yield self._draw()



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
        return SyntheticSampleStream(
            view_max=cfg.get("VIEW_MAX", 8),
            image_size=cfg.get("IMAGE_SIZE", 256),
            epoch_size=cfg.get("EPOCH_SIZE", 0),
            seed=cfg.get("SEED", 0),
            fixed_set=cfg.get("FIXED_SET", False),
            view_range=cfg.get("VIEW_RANGE", None),
            render=cfg.get("RENDER", False),
        )
    # map-style SDK adapters (DexYCB/HO3D/OakInk/Interhand/Arctic/FreiHAND/
    # YT3D + multi-view variants) register themselves on import
    from . import adapters  # noqa: F401
    from ..utils.registry import DATASET

    if cfg.TYPE in DATASET:
        return DATASET.get(cfg.TYPE)(cfg)
    raise ValueError(f"unknown dataset TYPE {cfg.TYPE!r}")
