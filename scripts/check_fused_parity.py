"""Measure the fused-eval-kernel deviation on the full flagship forward.

Runs the HRNet flagship twice on the real TPU with IDENTICAL weights —
once with the fused Pallas eval kernels (dense cross-attention,
KNN/anchor vector attention, separable bilinear sampler) and once on
the pure-XLA paths (use_flash=False) — and reports the output delta.

Recorded 2026-08-17 (v5e, B4 x V8, random weights): joints max 1.85e-4 m
(0.185 mm), mean 4.6e-5 m — two orders below the 1 mm checkpoint-parity
gate (PARITY.md deviation #7).

  python scripts/check_fused_parity.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--views", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _tiny_cfg
    from poem_v2_tpu.data import SyntheticMultiviewDataset
    from poem_v2_tpu.models.poem import create_poem_model

    cfg = _tiny_cfg(embed=256, nsample=4096, backbone="HRNet")
    cfg.BACKBONE.NORM = "frozen_bn"
    cfg.BACKBONE.WIDTH = 40
    cfg.HEAD.IN_CHANNELS = 160
    cfg.HEAD.TRANSFORMER.N_BLOCKS = 3
    cfg.HEAD.TRANSFORMER.N_NEIGHBOR = 32
    cfg.HEAD.TRANSFORMER.N_NEIGHBOR_QUERY = 32
    cfg.HEAD.POSITIONAL_ENCODING.NUM_FEATS = 128

    ds = SyntheticMultiviewDataset(
        batch_size=args.batch, view_max=args.views, image_size=256, seed=0,
        random_views=False, view_range=(args.views, args.views),
    )
    batch = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}
    rng = jax.random.PRNGKey(0)

    params = None
    outs = {}
    for flag in (True, False):
        model, _aux = create_poem_model(cfg, dtype=jnp.bfloat16, use_flash=flag)
        if params is None:
            shapes = jax.eval_shape(lambda: model.init(
                {"params": rng, "noise": rng, "dropout": rng},
                batch["image"], batch["view_mask"], batch["cam_intr"],
                batch["cam_extr"], batch["master_joints_3d"], train=False))
            rs = np.random.RandomState(0)

            def fab(path, s):
                name = "/".join(str(q) for q in path)
                # frozen_bn statistics must stay valid (var > 0)
                if "var" in name or "scale" in name:
                    return jnp.ones(s.shape, s.dtype)
                if "mean" in name or "bias" in name:
                    return jnp.zeros(s.shape, s.dtype)
                return jnp.asarray(rs.normal(0, 0.02, s.shape).astype(s.dtype))

            params = jax.tree_util.tree_map_with_path(fab, shapes)["params"]

        @jax.jit
        def fwd(params, image, vm, K, T):
            out = model.apply({"params": params}, image, vm, K, T, None, train=False)
            return out["pred_joints_3d"], out["pred_verts_3d"]

        j, v = fwd(params, batch["image"], batch["view_mask"],
                   batch["cam_intr"], batch["cam_extr"])
        outs[flag] = (np.asarray(j, np.float32), np.asarray(v, np.float32))

    dj = np.abs(outs[True][0] - outs[False][0])
    dv = np.abs(outs[True][1] - outs[False][1])
    print(f"joints: max {dj.max():.3e} m  mean {dj.mean():.3e} m")
    print(f"verts:  max {dv.max():.3e} m  mean {dv.mean():.3e} m")
    assert np.isfinite(dj).all() and np.isfinite(dv).all()
    assert dj.max() < 1e-3, "fused kernels deviate beyond the 1 mm parity gate"
    print("OK: fused eval kernels inside the 1 mm parity gate")


if __name__ == "__main__":
    main()
