"""Evaluation loop + callbacks.

Parity with the reference eval stack (scripts/eval.py:84-103 +
lib/utils/testing.py:16-195): a jitted eval step feeding MPJPE/MPVPE
(+root-relative), PA metrics, MPTPE (triangulated reference joints) and
optional PCK-AUC callbacks, then text/pickle artifact dumps. The eval
step is sharded over the data mesh axis — the reference evaluates on
rank 0 only (train_ddp.py:66-79); here every chip evaluates its shard.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import mano_to_openpose
from ..metrics import Joint3DPCK, MeanEPE, PAEval, Vert3DPCK
from ..utils.logger import logger


class IdleCallback:
    def __call__(self, preds, batch, step_idx, **kwargs):
        pass

    def on_finished(self):
        pass

    def reset(self):
        pass


class AUCCallback(IdleCallback):
    """PCK-AUC over joints and vertices (reference testing.py:31-72)."""

    def __init__(self, exp_dir: str = "", val_max: float = 0.02, steps: int = 20):
        self.exp_dir = exp_dir
        self.pck_j = Joint3DPCK(val_max=val_max, steps=steps)
        self.pck_v = Vert3DPCK(val_max=val_max, steps=steps)

    def __call__(self, preds, batch, step_idx, **kwargs):
        self.pck_j.feed(preds["pred_joints_3d_rel"], batch["master_joints_3d_rel"])
        self.pck_v.feed(preds["pred_verts_3d_rel"], batch["master_verts_3d_rel"])

    def on_finished(self):
        auc_j = self.pck_j.get_auc()
        auc_v = self.pck_v.get_auc()
        logger.info(f"AUC joints: {auc_j:.6f}, AUC verts: {auc_v:.6f}")
        if self.exp_dir:
            os.makedirs(self.exp_dir, exist_ok=True)
            with open(os.path.join(self.exp_dir, "res_auc_j.pkl"), "wb") as f:
                pickle.dump(self.pck_j.pck_curve(), f)
            with open(os.path.join(self.exp_dir, "res_auc_v.pkl"), "wb") as f:
                pickle.dump(self.pck_v.pck_curve(), f)
            with open(os.path.join(self.exp_dir, "auc.txt"), "a") as f:
                f.write(f"auc_j {auc_j:.6f} auc_v {auc_v:.6f}\n")

    def reset(self):
        self.pck_j.reset()
        self.pck_v.reset()


class PredictionSaverCallback(IdleCallback):
    """Dump raw predictions per step (reference testing.py:75-98)."""

    def __init__(self, exp_dir: str):
        self.exp_dir = exp_dir
        os.makedirs(exp_dir, exist_ok=True)

    def __call__(self, preds, batch, step_idx, **kwargs):
        path = os.path.join(self.exp_dir, f"preds_{step_idx:06d}.pkl")
        payload = {
            "pred_joints_3d": np.asarray(preds["pred_joints_3d"]),
            "pred_verts_3d": np.asarray(preds["pred_verts_3d"]),
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)


class Evaluator:
    """Runs the eval protocol of the reference ``testing_step``
    (lib/models/POEM.py:586-631)."""

    def __init__(self, model, aux: Dict[str, Any], center_idx: int = 0,
                 pred_joints_from_mesh: bool = True, mesh=None):
        self.model = model
        self.aux = aux
        self.center_idx = center_idx
        self.pred_joints_from_mesh = pred_joints_from_mesh
        self.j_regressor = aux["mano_layer"].j_regressor
        self.mesh = mesh

        self.MPJPE = MeanEPE("joints_3d")
        self.MPJPE_REF = MeanEPE("joints_3d_ref")
        self.MPVPE = MeanEPE("vertices_3d")
        self.MPJPE_REL = MeanEPE("joints_3d_rel")
        self.MPVPE_REL = MeanEPE("vertices_3d_rel")
        self.MPTPE = MeanEPE("triangulate_joints")
        self.PA = PAEval(mesh_score=True)

        if mesh is not None:
            # shard eval over the data axis (the reference evaluates on
            # rank 0 only — SURVEY §2.3 "eval parallelism: NONE")
            from ..parallel.mesh import batch_sharding, replicated

            bs = batch_sharding(mesh)
            self._eval_step = jax.jit(
                self._step_fn,
                in_shardings=(replicated(mesh), bs, bs, bs, bs, bs),
                out_shardings=replicated(mesh),
            )
        else:
            self._eval_step = jax.jit(self._step_fn)

    def _step_fn(self, params, image, view_mask, cam_intr, cam_extr, master_joints_3d):
        preds = self.model.apply(
            {"params": params}, image, view_mask, cam_intr, cam_extr, master_joints_3d,
            train=False,
        )
        return (
            preds["pred_joints_3d"],
            preds["pred_verts_3d"],
            preds["pred_ref_joints_3d"],
        )

    def reset(self):
        for m in (self.MPJPE, self.MPJPE_REF, self.MPVPE, self.MPJPE_REL,
                  self.MPVPE_REL, self.MPTPE, self.PA):
            m.reset()

    def run(
        self,
        params,
        batches: Iterable[Dict[str, np.ndarray]],
        callback: Optional[IdleCallback] = None,
        max_steps: int = 0,
    ) -> Dict[str, float]:
        callback = callback or IdleCallback()
        for step_idx, batch in enumerate(batches):
            if max_steps and step_idx >= max_steps:
                break
            pred_j, pred_v, pred_ref = self._eval_step(
                params,
                jnp.asarray(batch["image"]),
                jnp.asarray(batch["view_mask"]),
                jnp.asarray(batch["cam_intr"]),
                jnp.asarray(batch["cam_extr"]),
                jnp.asarray(batch["master_joints_3d"]),
            )
            gt_j = jnp.asarray(batch["master_joints_3d"])
            gt_v = jnp.asarray(batch["master_verts_3d"])

            if self.pred_joints_from_mesh:
                # reference POEM.py:598-603: joints re-derived from meshes
                gt_j_eval = mano_to_openpose(self.j_regressor, gt_v)
                pred_j_eval = mano_to_openpose(self.j_regressor, pred_v)
            else:
                gt_j_eval, pred_j_eval = gt_j, pred_j

            centre_p = pred_j_eval[:, self.center_idx][:, None]
            centre_g = gt_j_eval[:, self.center_idx][:, None]
            pred_j_rel = pred_j_eval - centre_p
            pred_v_rel = pred_v - centre_p
            gt_j_rel = gt_j_eval - centre_g
            gt_v_rel = gt_v - centre_g

            self.MPTPE.feed(np.asarray(pred_ref), np.asarray(gt_j))
            self.MPJPE.feed(np.asarray(pred_j_eval), np.asarray(gt_j_eval))
            self.MPJPE_REF.feed(np.asarray(pred_ref), np.asarray(gt_j_eval))
            self.MPVPE.feed(np.asarray(pred_v), np.asarray(gt_v))
            self.MPJPE_REL.feed(np.asarray(pred_j_rel), np.asarray(gt_j_rel))
            self.MPVPE_REL.feed(np.asarray(pred_v_rel), np.asarray(gt_v_rel))
            self.PA.feed(pred_j_eval, gt_j_eval, pred_v, gt_v)

            cb_batch = dict(batch)
            cb_batch["master_joints_3d_rel"] = np.asarray(gt_j_rel)
            cb_batch["master_verts_3d_rel"] = np.asarray(gt_v_rel)
            cb_preds = {
                "pred_joints_3d": pred_j_eval,
                "pred_verts_3d": pred_v,
                "pred_joints_3d_rel": np.asarray(pred_j_rel),
                "pred_verts_3d_rel": np.asarray(pred_v_rel),
            }
            callback(cb_preds, cb_batch, step_idx)

        callback.on_finished()
        results = {}
        for m in (self.MPJPE, self.MPJPE_REF, self.MPVPE, self.MPJPE_REL,
                  self.MPVPE_REL, self.MPTPE):
            results.update(m.get_measures())
        results.update(self.PA.get_measures())
        return results
