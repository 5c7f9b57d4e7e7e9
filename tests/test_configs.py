"""Release configs parse and build; eval_single protocol table sanity."""

import jax.numpy as jnp
import numpy as np
import pytest

from poem_v2_tpu.utils.config import Config, get_config


class TestReleaseConfigs:
    @pytest.mark.parametrize(
        "name,embed",
        [("small", 128), ("medium", 256), ("large", 512), ("huge", 1024), ("medium_MANO", 256)],
    )
    def test_parse_and_schema(self, name, embed):
        cfg = get_config(f"configs/release/train_{name}.yaml")
        assert cfg.MODEL.TYPE == "PtEmbedMultiviewStereoV2"
        assert cfg.MODEL.HEAD.EMBED_DIMS == embed
        assert cfg.MODEL.HEAD.N_SAMPLE == 4096
        assert cfg.MODEL.HEAD.TRANSFORMER.N_BLOCKS == 3
        assert cfg.DATA_PRESET.IMAGE_SIZE == [256, 256]
        assert len(cfg.DATASET.TRAIN.DATASET_LIST) == 6
        if name == "medium_MANO":
            assert cfg.MODEL.HEAD.TRANSFORMER.PARAMETRIC_OUTPUT is True
        if name == "huge":
            assert cfg.TRAIN.SCHEDULER == "CosineLR"
            assert cfg.TRAIN.EPOCH == 15

    def test_cfg_dump_roundtrip(self, tmp_path):
        cfg = get_config("configs/release/train_medium.yaml")
        p = tmp_path / "dump.yaml"
        with open(p, "w") as f:
            cfg.dump(f)
        cfg2 = Config.from_yaml(str(p))
        assert cfg2.MODEL.HEAD.EMBED_DIMS == 256
        assert cfg2.TRAIN.LR == cfg.TRAIN.LR

    def test_medium_model_builds(self):
        """HRNet-W40 medium model constructs + decoder wiring is sound
        (no param init — just module tree construction)."""
        from poem_v2_tpu.models.poem import create_poem_model

        cfg = get_config("configs/release/train_medium.yaml")
        model, aux = create_poem_model(cfg.MODEL, use_flash=False)
        assert model.backbone.width == 40
        assert model.head.nsample == 4096
        assert aux["bps_basis"].shape == (4096, 3)
        assert aux["template_mesh"].shape == (799, 3)
        # template is centered at OpenPose joint 9 (middle MCP)
        np.testing.assert_allclose(aux["template_mesh"][9], 0.0, atol=1e-5)


class TestEvalSingle:
    def test_protocol_table(self):
        from poem_v2_tpu.cli.eval_single import DATASET_META, MODEL_SIZES, build_eval_cfg

        # pinned counts from the reference protocol (eval_single.py:5-36)
        assert DATASET_META["DexYCB"]["epoch_size"] == 4950
        assert DATASET_META["HO3D"]["max_view"] == 5
        assert DATASET_META["Freihand"]["max_view"] == 1
        assert MODEL_SIZES["huge"] == 1024

        cfg = build_eval_cfg("DexYCB", "medium_MANO", "ckpt/path")
        assert cfg.MODEL.HEAD.TRANSFORMER.PARAMETRIC_OUTPUT is True
        assert cfg.MODEL.PRETRAINED == "ckpt/path"
        assert cfg.DATASET.TEST.EPOCH_SIZE == 4950
