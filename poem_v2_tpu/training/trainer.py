"""SPMD training step + Trainer.

TPU-native equivalent of the reference's DDP epoch loop
(scripts/train_ddp.py:96-138): one jitted train step over a
``Mesh('data', 'model')``; batch sharded on the data axis, parameters
replicated, gradient mean emitted by XLA as an ICI psum. No process
groups, no barriers, no explicit all-reduce.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.losses import poem_loss
from ..parallel.mesh import create_mesh, shard_batch


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx, rng):
        return cls(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            opt_state=tx.init(params),
            rng=rng,
            tx=tx,
        )


def make_train_step(
    model,
    loss_fn: Callable,
) -> Callable:
    """Build the pure train step: (state, batch) -> (state, metrics)."""

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng, noise_rng, drop_rng = jax.random.split(state.rng, 3)

        def compute(params):
            preds = model.apply(
                {"params": params},
                batch["image"],
                batch["view_mask"],
                batch["cam_intr"],
                batch["cam_extr"],
                batch["master_joints_3d"],
                train=True,
                rngs={"noise": noise_rng, "dropout": drop_rng},
            )
            loss, loss_dict = loss_fn(preds, batch)
            return loss, (loss_dict, preds)

        (loss, (loss_dict, _)), grads = jax.value_and_grad(compute, has_aux=True)(state.params)
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(loss_dict)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            state.replace(
                step=state.step + 1, params=new_params, opt_state=new_opt_state, rng=rng
            ),
            metrics,
        )

    return train_step


class Trainer:
    """Owns the mesh, the jitted step, and the metric plumbing."""

    def __init__(
        self,
        model,
        aux: Dict[str, Any],
        train_cfg,
        loss_cfg,
        mesh=None,
        steps_per_epoch: int = 1000,
        seed: Optional[int] = None,
    ):
        from .optim import build_optimizer

        self.model = model
        self.aux = aux
        self.mesh = mesh if mesh is not None else create_mesh()
        self.tx = build_optimizer(train_cfg, steps_per_epoch)
        self.seed = seed if seed is not None else train_cfg.get("MANUAL_SEED", 1)

        j_reg = aux["mano_layer"].j_regressor

        def loss_fn(preds, batch):
            return poem_loss(
                preds,
                batch,
                j_regressor=j_reg,
                loss_cfg=loss_cfg,
                parametric=aux.get("parametric_output", False),
                transformer_center_idx=aux.get("transformer_center_idx", 9),
            )

        self.loss_fn = loss_fn
        step = make_train_step(model, loss_fn)
        # shardings are carried by the inputs: the batch via shard_batch,
        # the state via init_state (replicated params on a pure-DP mesh;
        # wide kernels TP-sharded on the model axis when it has size > 1)
        self._train_step = jax.jit(step, donate_argnums=(0,))

    def init_state(self, sample_batch: Dict[str, Any]) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        p_rng, n_rng, d_rng, s_rng = jax.random.split(rng, 4)
        variables = self.model.init(
            {"params": p_rng, "noise": n_rng, "dropout": d_rng},
            sample_batch["image"],
            sample_batch["view_mask"],
            sample_batch["cam_intr"],
            sample_batch["cam_extr"],
            sample_batch["master_joints_3d"],
            train=False,
        )
        state = TrainState.create(variables["params"], self.tx, s_rng)
        from ..parallel.mesh import infer_param_shardings

        shardings = infer_param_shardings(state, self.mesh)
        return jax.tree_util.tree_map(jax.device_put, state, shardings)

    def step(self, state: TrainState, batch: Dict[str, Any]):
        batch = shard_batch(self._to_device_batch(batch), self.mesh)
        return self._train_step(state, batch)

    def step_sharded(self, state: TrainState, dev_batch: Dict[str, Any]):
        """Step on a batch already sharded onto the mesh (see
        training/prefetch.py for the double-buffered feed)."""
        return self._train_step(state, dev_batch)

    def epoch_scan(self, state: TrainState, stacked_batches: Dict[str, Any]):
        """One dispatch for a whole epoch: ``lax.scan`` of the train step
        over batches stacked on a leading axis (S, B, ...).

        Mathematically identical to S sequential ``step_sharded`` calls:
        the scan body IS the step function and state.rng threads through
        the carry exactly as it does across dispatches (bitwise results
        may differ at float-rounding scale — XLA fuses the scan body
        differently from the standalone step). Exists because some
        transports charge seconds of overhead PER DISPATCH (the tunneled
        dev chip: ~2.3 s/step regardless of compute) — fixed-set
        convergence protocols with a device-cached feed collapse to one
        launch per epoch. Returns (state, metrics) with each metric
        stacked to (S,).
        """
        if not hasattr(self, "_epoch_scan"):
            step = make_train_step(self.model, self.loss_fn)

            def scan_fn(st, stacked):
                return jax.lax.scan(step, st, stacked)

            self._epoch_scan = jax.jit(scan_fn, donate_argnums=(0,))
        return self._epoch_scan(state, stacked_batches)

    @staticmethod
    def _to_device_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
        keep = (
            "image",
            "view_mask",
            "cam_intr",
            "cam_extr",
            "master_joints_3d",
            "master_verts_3d",
            "target_joints_2d",
            "mano_pose",
            "mano_shape",
        )
        return {k: jnp.asarray(batch[k]) for k in keep if k in batch}
