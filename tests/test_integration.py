"""End-to-end integration: tar shard -> stream -> collate -> model -> metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from helpers import TINY_MODEL_CFG
from test_data import DATA_PRESET, ds_cfg, make_shard

from poem_v2_tpu.data import MultiviewWebDataset, batch_iterator
from poem_v2_tpu.models.poem import create_poem_model
from poem_v2_tpu.training.evaluator import AUCCallback, Evaluator

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier


def test_full_eval_pipeline(tmp_path):
    shard = make_shard(str(tmp_path / "Test_mv_test-000000.tar"), n_samples=4, img_size=64)
    ds = MultiviewWebDataset(
        ds_cfg(shard, random_n_views=True),
        data_preset=DATA_PRESET.clone().defrost().merge({"IMAGE_SIZE": [64, 64]}),
        is_train=False,
    )
    batches = list(batch_iterator(ds, batch_size=2, view_max=4))
    assert len(batches) == 2

    model, aux = create_poem_model(TINY_MODEL_CFG)
    b0 = batches[0]
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "noise": rng, "dropout": rng},
        jnp.asarray(b0["image"]),
        jnp.asarray(b0["view_mask"]),
        jnp.asarray(b0["cam_intr"]),
        jnp.asarray(b0["cam_extr"]),
        jnp.asarray(b0["master_joints_3d"]),
        train=False,
    )

    evaluator = Evaluator(model, aux, center_idx=0)
    cb = AUCCallback(exp_dir=str(tmp_path / "eval"))
    results = evaluator.run(variables["params"], batches, callback=cb)

    for key in ("joints_3d_mepe", "vertices_3d_mepe", "pa_mpjpe", "triangulate_joints_mepe"):
        assert key in results and np.isfinite(results[key]), results
    # untrained model: errors are large but bounded by the scene scale
    assert 0 < results["joints_3d_mepe"] < 5.0
    assert cb.pck_j.get_auc() >= 0.0


def test_train_step_on_wds_batch(tmp_path):
    from poem_v2_tpu.parallel.mesh import create_mesh
    from poem_v2_tpu.training.trainer import Trainer
    from poem_v2_tpu.utils.config import Config

    shard = make_shard(str(tmp_path / "Test_mv_train-000000.tar"), n_samples=8, img_size=64)
    ds = MultiviewWebDataset(
        ds_cfg(shard, random_n_views=True),
        data_preset=DATA_PRESET.clone().defrost().merge({"IMAGE_SIZE": [64, 64]}),
        is_train=True,
    )
    batch = next(iter(batch_iterator(ds, batch_size=8, view_max=4)))

    model, aux = create_poem_model(TINY_MODEL_CFG)
    mesh = create_mesh(data=8, devices=jax.devices("cpu")[:8])
    train_cfg = Config(
        {"MANUAL_SEED": 1, "OPTIMIZER": "adam", "LR": 1e-4, "SCHEDULER": "constant",
         "GRAD_CLIP_ENABLED": True, "GRAD_CLIP": {"TYPE": 2, "NORM": 1.0}, "EPOCH": 1}
    )
    trainer = Trainer(model, aux, train_cfg=train_cfg, loss_cfg=TINY_MODEL_CFG.LOSS,
                      mesh=mesh, steps_per_epoch=5)
    state = trainer.init_state({k: jnp.asarray(v) for k, v in batch.items()
                                if k in ("image", "view_mask", "cam_intr", "cam_extr",
                                         "master_joints_3d")})
    state, metrics = trainer.step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_sharded_eval_on_mesh(tmp_path):
    """Eval step sharded over the 8-device CPU mesh."""
    from poem_v2_tpu.parallel.mesh import create_mesh
    from helpers import tiny_batch

    model, aux = create_poem_model(TINY_MODEL_CFG)
    mesh = create_mesh(data=8, devices=jax.devices("cpu")[:8])
    batch = tiny_batch(batch_size=8, view_max=2, image_size=64, random_views=False)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "noise": rng, "dropout": rng},
        batch["image"], batch["view_mask"], batch["cam_intr"], batch["cam_extr"],
        batch["master_joints_3d"], train=False,
    )
    ev = Evaluator(model, aux, center_idx=0, mesh=mesh)
    np_batch = {k: np.asarray(v) for k, v in batch.items()}
    results = ev.run(variables["params"], [np_batch])
    assert np.isfinite(results["joints_3d_mepe"])
