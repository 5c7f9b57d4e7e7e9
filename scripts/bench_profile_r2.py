"""Round-2 stage profile of the flagship forward (one stage per run).

The tunneled TPU dispatches eagerly with high latency, so ``model.init``
alone costs minutes; parameters are therefore fabricated host-side from
``jax.eval_shape`` (same trick as ``__graft_entry__.entry``) and each
invocation times exactly ONE jitted program:

  python scripts/bench_profile_r2.py --backbone HRNet --stage full
  python scripts/bench_profile_r2.py --backbone HRNet --stage backbone
  python scripts/bench_profile_r2.py --backbone HRNet --stage necks
  python scripts/bench_profile_r2.py --backbone HRNet --stage head
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--views", type=int, default=8)
    p.add_argument("--backbone", type=str, default="HRNet")
    p.add_argument("--dtype", type=str, default="bf16")
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--stage", type=str, default="full",
                   choices=["full", "backbone", "necks", "head", "headpre", "decoder", "uvdlt"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_cfg
    from poem_v2_tpu.data import SyntheticMultiviewDataset
    from poem_v2_tpu.models.poem import create_poem_model
    from poem_v2_tpu.utils.benchmarking import time_fn

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B, V = args.batch, args.views
    BN = B * V
    rng = jax.random.PRNGKey(0)

    cfg = _tiny_cfg(embed=256, nsample=4096, backbone=args.backbone)
    cfg.BACKBONE.NORM = "frozen_bn"
    if args.backbone == "HRNet":
        cfg.BACKBONE.WIDTH = 40
        cfg.HEAD.IN_CHANNELS = 160
    cfg.HEAD.TRANSFORMER.N_BLOCKS = 3
    cfg.HEAD.TRANSFORMER.N_NEIGHBOR = 32
    cfg.HEAD.TRANSFORMER.N_NEIGHBOR_QUERY = 32
    cfg.HEAD.POSITIONAL_ENCODING.NUM_FEATS = 128
    model, aux = create_poem_model(cfg, dtype=dtype)

    ds = SyntheticMultiviewDataset(
        batch_size=B, view_max=V, image_size=256, seed=0,
        random_views=False, view_range=(V, V),
    )
    batch = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}

    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": rng, "noise": rng, "dropout": rng},
            batch["image"], batch["view_mask"], batch["cam_intr"],
            batch["cam_extr"], batch["master_joints_3d"], train=False,
        )
    )
    rs = np.random.RandomState(0)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.asarray(rs.normal(0, 0.02, s.shape).astype(s.dtype)), shapes
    )
    params = variables["params"]

    def report(name, dt):
        print(f"{name:42s} {dt * 1e3:8.2f} ms  ({B / dt:7.1f} fps-equiv)", flush=True)

    if args.stage == "full":
        def full(params, image, view_mask, cam_intr, cam_extr):
            preds = model.apply(
                {"params": params}, image, view_mask, cam_intr, cam_extr, None, train=False
            )
            return preds["pred_joints_3d"], preds["pred_verts_3d"]

        dt = time_fn(jax.jit(full), params, batch["image"], batch["view_mask"],
                     batch["cam_intr"], batch["cam_extr"], iters=args.iters)
        report(f"FULL forward ({args.backbone} B{B}xV{V})", dt)

    elif args.stage == "backbone":
        img = batch["image"].reshape(BN, 256, 256, 3).astype(dtype)

        def bb_only(params, img):
            feats = model.backbone.apply({"params": params["backbone"]}, img)
            return feats["res_layer4"] if isinstance(feats, dict) else feats[-1]

        dt = time_fn(jax.jit(bb_only), params, img, iters=args.iters)
        report(f"backbone {args.backbone} x{BN}", dt)

    elif args.stage == "necks":
        img = batch["image"].reshape(BN, 256, 256, 3).astype(dtype)

        def bb_necks(params, img):
            feats = model.backbone.apply({"params": params["backbone"]}, img)
            pyramid = (
                [feats[k] for k in ("res_layer1", "res_layer2", "res_layer3", "res_layer4")]
                if isinstance(feats, dict) else list(feats)
            )
            mlvl = model.feat_neck.apply({"params": params["feat_neck"]}, pyramid)
            uv, _ = model.uv_neck.apply({"params": params["uv_neck"]}, pyramid)
            return mlvl, uv

        dt = time_fn(jax.jit(bb_necks), params, img, iters=args.iters)
        report("backbone + both necks", dt)

    elif args.stage == "head":
        mlvl = jax.random.normal(rng, (B, V, 32, 32, cfg.HEAD.IN_CHANNELS), dtype=dtype)

        def head_only(params, mlvl, vm, K, T, ref):
            return model.head.apply(
                {"params": params["head"]}, mlvl, vm, K, T, ref,
                inp_res=(256, 256), deterministic=True,
            )["all_coords_preds"]

        dt = time_fn(jax.jit(head_only), params, mlvl, batch["view_mask"],
                     batch["cam_intr"], batch["cam_extr"], batch["master_joints_3d"],
                     iters=args.iters)
        report("head (BPS sample+merge+decoder)", dt)

    elif args.stage == "headpre":
        # everything before the decoder: input_proj + sine PE + BPS
        # projection + bilinear gather + cross-view merge
        import flax.linen as fnn

        from poem_v2_tpu.geometry.camera import project_world_to_pixel
        from poem_v2_tpu.ops.sampling import grid_sample_points_matmul, pixel_to_grid
        from poem_v2_tpu.models.positional import sine_positional_encoding_3d

        head = model.head
        mlvl = jax.random.normal(rng, (B, V, 32, 32, cfg.HEAD.IN_CHANNELS), dtype=dtype)

        def head_pre(params, mlvl, vm, K, T, ref):
            hp = params["head"]
            x = jax.lax.conv_general_dilated(
                mlvl.reshape(B * V, 32, 32, cfg.HEAD.IN_CHANNELS).astype(dtype),
                hp["input_proj"]["kernel"].astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + hp["input_proj"]["bias"].astype(dtype)
            sin = sine_positional_encoding_3d(vm, 32, 32, num_feats=128)
            sin = jax.lax.conv_general_dilated(
                sin.reshape(B * V, 32, 32, -1).astype(dtype),
                hp["adapt_pos3d"]["kernel"].astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + hp["adapt_pos3d"]["bias"].astype(dtype)
            x = x + sin
            ref_center = ref[:, 9].astype(jnp.float32)
            bps = jnp.asarray(head.bps_basis, jnp.float32)
            bps_world = bps[None] + ref_center[:, None]
            proj = project_world_to_pixel(bps_world, T.astype(jnp.float32), K.astype(jnp.float32))
            grid = pixel_to_grid(proj, (256, 256))
            feats = grid_sample_points_matmul(x, grid.reshape(B * V, 4096, 2).astype(x.dtype))
            return feats

        dt = time_fn(jax.jit(head_pre), params, mlvl, batch["view_mask"],
                     batch["cam_intr"], batch["cam_extr"], batch["master_joints_3d"],
                     iters=args.iters)
        report("head pre (proj+PE+BPS gather)", dt)

    elif args.stage == "decoder":
        from poem_v2_tpu.models.decoder import PtEmbedDecoder

        dec = PtEmbedDecoder(
            n_blocks=3, hidden_size=256, num_heads=4,
            n_neighbor=32, n_neighbor_query=32, use_flash=True,
            approx_knn=True, use_fused_knn=True, dtype=dtype,
        )
        qx = jax.random.normal(rng, (B, 799, 3))
        qf = jax.random.normal(rng, (B, 799, 256), dtype=dtype)
        px = jax.random.normal(rng, (B, 4096, 3))
        pf = jax.random.normal(rng, (B, 4096, 256), dtype=dtype)
        qa = jnp.arange(32, dtype=jnp.int32)
        dvars = dec.init({"params": rng, "dropout": rng}, qx, qf, px, pf, qa, qa)
        dfn = jax.jit(lambda v, a, b, c, d: dec.apply(v, a, b, c, d, qa, qa)[0])
        dt = time_fn(dfn, dvars, qx, qf, px, pf, iters=args.iters)
        report("decoder 3 blocks (flash, approx knn)", dt)

    elif args.stage == "uvdlt":
        from poem_v2_tpu.geometry.camera import invert_rigid
        from poem_v2_tpu.geometry.heatmap import integral_heatmap2d, normalize_heatmap
        from poem_v2_tpu.geometry.triangulation import triangulate_dlt

        hm = jax.random.normal(rng, (BN, 21, 32, 32), dtype=jnp.float32)

        def hm_dlt(hm, K, T, vm):
            uv = integral_heatmap2d(normalize_heatmap(hm)) * 256.0
            uv = uv.reshape(B, V, 21, 2)
            return triangulate_dlt(
                uv, K.astype(jnp.float32), invert_rigid(T.astype(jnp.float32)), vm
            )

        dt = time_fn(jax.jit(hm_dlt), hm, batch["cam_intr"], batch["cam_extr"],
                     batch["view_mask"], iters=args.iters)
        report("heatmap integral + DLT", dt)


if __name__ == "__main__":
    main()
