"""Round-2 stage profile of the flagship forward (HRNet-W40 or ResNet34).

Times the FULL jitted forward and then each stage as its own jitted
program (backbone / necks / heatmap+DLT / head-with-decoder), so the
"unaccounted" gap between the sum of parts and the whole is visible.

  python scripts/bench_profile_r2.py --backbone HRNet
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, name=""):
    from poem_v2_tpu.utils.benchmarking import time_fn

    dt = time_fn(fn, *args, iters=iters)
    print(f"{name:42s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--views", type=int, default=8)
    p.add_argument("--backbone", type=str, default="HRNet")
    p.add_argument("--dtype", type=str, default="bf16")
    args = p.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B, V = args.batch, args.views
    BN = B * V
    rng = jax.random.PRNGKey(0)

    from __graft_entry__ import _tiny_cfg
    from poem_v2_tpu.data import SyntheticMultiviewDataset
    from poem_v2_tpu.models.poem import create_poem_model

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
    variables = model.init(
        {"params": rng, "noise": rng, "dropout": rng},
        batch["image"], batch["view_mask"], batch["cam_intr"],
        batch["cam_extr"], batch["master_joints_3d"], train=False,
    )
    params = variables["params"]

    # ---- full forward -------------------------------------------------------
    def full(params, image, view_mask, cam_intr, cam_extr):
        preds = model.apply(
            {"params": params}, image, view_mask, cam_intr, cam_extr, None, train=False
        )
        return preds["pred_joints_3d"], preds["pred_verts_3d"]

    dt_full = timeit(
        jax.jit(full), params, batch["image"], batch["view_mask"],
        batch["cam_intr"], batch["cam_extr"], name=f"FULL forward ({args.backbone}, B{B}xV{V})",
    )
    print(f"{'-> fps':42s} {B / dt_full:8.1f}")

    # ---- backbone alone -----------------------------------------------------
    img = batch["image"].reshape(BN, 256, 256, 3).astype(dtype)

    def bb_only(params, img):
        feats = model.backbone.apply({"params": params["backbone"]}, img)
        if isinstance(feats, dict):
            return feats["res_layer4"]
        return feats[-1]

    timeit(jax.jit(bb_only), params, img, name=f"backbone {args.backbone} x{BN}")

    # ---- backbone + necks ----------------------------------------------------
    def bb_necks(params, img):
        feats = model.backbone.apply({"params": params["backbone"]}, img)
        pyramid = (
            [feats[k] for k in ("res_layer1", "res_layer2", "res_layer3", "res_layer4")]
            if isinstance(feats, dict) else list(feats)
        )
        mlvl = model.feat_neck.apply({"params": params["feat_neck"]}, pyramid)
        uv, _ = model.uv_neck.apply({"params": params["uv_neck"]}, pyramid)
        return mlvl, uv

    timeit(jax.jit(bb_necks), params, img, name="backbone + both necks")

    # ---- head (everything after necks, incl. decoder) ------------------------
    mlvl = jax.random.normal(rng, (B, V, 32, 32, cfg.HEAD.IN_CHANNELS), dtype=dtype)
    ref = batch["master_joints_3d"]

    def head_only(params, mlvl, vm, K, T, ref):
        return model.head.apply(
            {"params": params["head"]}, mlvl, vm, K, T, ref,
            inp_res=(256, 256), deterministic=True,
        )["all_coords_preds"]

    timeit(
        jax.jit(head_only), params, mlvl, batch["view_mask"], batch["cam_intr"],
        batch["cam_extr"], ref, name="head (BPS sample+merge+decoder)",
    )

    # ---- heatmap -> integral -> DLT ------------------------------------------
    from poem_v2_tpu.geometry.heatmap import integral_heatmap2d, normalize_heatmap
    from poem_v2_tpu.geometry.triangulation import triangulate_dlt
    from poem_v2_tpu.geometry.camera import invert_rigid

    hm = jax.random.normal(rng, (BN, 21, 32, 32), dtype=jnp.float32)

    def hm_dlt(hm, K, T, vm):
        uv = integral_heatmap2d(normalize_heatmap(hm)) * 256.0
        uv = uv.reshape(B, V, 21, 2)
        return triangulate_dlt(uv, K.astype(jnp.float32), invert_rigid(T.astype(jnp.float32)), vm)

    timeit(
        jax.jit(hm_dlt), hm, batch["cam_intr"], batch["cam_extr"], batch["view_mask"],
        name="heatmap integral + DLT",
    )


if __name__ == "__main__":
    main()
