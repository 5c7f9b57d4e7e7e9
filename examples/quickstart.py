"""Quickstart: train a tiny POEM on synthetic data and evaluate it.

Runs anywhere (CPU ok): builds a small model, streams synthetic
multi-view batches, takes a few SPMD train steps, then runs the eval
protocol and prints the metric dict.

  python examples/quickstart.py --steps 10
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--cpu", action="store_true", help="pin to CPU devices")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    import jax.numpy as jnp

    from __graft_entry__ import _tiny_cfg
    from poem_v2_tpu.data import SyntheticMultiviewDataset
    from poem_v2_tpu.models.poem import create_poem_model
    from poem_v2_tpu.parallel.mesh import create_mesh
    from poem_v2_tpu.training.evaluator import Evaluator
    from poem_v2_tpu.training.trainer import Trainer

    cfg = _tiny_cfg(embed=64, nsample=256, image=64)
    model, aux = create_poem_model(cfg)
    mesh = create_mesh(data=1) if len(jax.devices()) == 1 else create_mesh()
    trainer = Trainer(model, aux, train_cfg=cfg.TRAIN, loss_cfg=cfg.LOSS, mesh=mesh,
                      steps_per_epoch=args.steps)

    ds = SyntheticMultiviewDataset(batch_size=args.batch, view_max=2, image_size=64,
                                   random_views=False, view_range=(2, 2))
    batch = ds.sample_batch()
    state = trainer.init_state({k: jnp.asarray(v) for k, v in batch.items()})

    for step in range(args.steps):
        state, metrics = trainer.step(state, ds.sample_batch())
        print(f"step {step}: loss={float(metrics['loss']):.4f}")

    evaluator = Evaluator(model, aux, center_idx=0)
    results = evaluator.run(state.params, [ds.sample_batch() for _ in range(3)])
    print("eval:", {k: round(v, 4) for k, v in results.items()})


if __name__ == "__main__":
    main()
