"""Op-level TPU profile of a jitted program: top HLO ops by self time.

Captures a jax.profiler trace of one of several canned programs (the
same stage programs as bench_profile_r2) and prints the top-N device ops
by total self time, parsed from the xplane protobuf via xprof's
raw_to_tool_data. This is the ground-truth tool for deciding which
kernel to optimize next — estimates from first principles have been
consistently wrong on the tunneled v5e.

  python scripts/profile_ops.py --prog attn_dense --top 25
"""

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_program(name: str, batch: int = 8):
    import jax
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)

    if name == "attn_dense":
        from poem_v2_tpu.ops.pallas_cross_attn import dense_cross_attention

        q = jax.random.normal(rng, (8, 799, 256), dtype=jnp.bfloat16)
        k = jax.random.normal(rng, (8, 4096, 256), dtype=jnp.bfloat16)
        v = jax.random.normal(rng, (8, 4096, 256), dtype=jnp.bfloat16)
        return lambda: dense_cross_attention(q, k, v, num_heads=4, sm_scale=0.125)

    if name == "attn_flash":
        from poem_v2_tpu.models.bricks.attention import _flash_cross_attention

        q = jax.random.normal(rng, (8, 799, 4, 64), dtype=jnp.bfloat16)
        k = jax.random.normal(rng, (8, 4096, 4, 64), dtype=jnp.bfloat16)
        v = jax.random.normal(rng, (8, 4096, 4, 64), dtype=jnp.bfloat16)
        f = jax.jit(lambda a, b, c: _flash_cross_attention(a, b, c, 0.125))
        return lambda: f(q, k, v)

    if name == "bilinear":
        from poem_v2_tpu.ops.pallas_bilinear import grid_sample_points_fused

        feat = jax.random.normal(rng, (64, 32, 32, 256), dtype=jnp.bfloat16)
        coords = jax.random.uniform(rng, (64, 4096, 2), minval=-1.2, maxval=1.2)
        return lambda: grid_sample_points_fused(feat, coords)

    if name == "bilinear_matmul":
        from poem_v2_tpu.ops.sampling import grid_sample_points_matmul

        feat = jax.random.normal(rng, (64, 32, 32, 256), dtype=jnp.bfloat16)
        coords = jax.random.uniform(rng, (64, 4096, 2), minval=-1.2, maxval=1.2)
        f = jax.jit(grid_sample_points_matmul)
        return lambda: f(feat, coords.astype(feat.dtype))

    if name == "backbone":
        from poem_v2_tpu.models.backbones.hrnet import HRNet

        bb = HRNet(width=40, norm="frozen_bn", dtype=jnp.bfloat16)
        img = jax.random.normal(rng, (64, 256, 256, 3), dtype=jnp.bfloat16)
        shapes = jax.eval_shape(lambda: bb.init(rng, img))
        rs = np.random.RandomState(0)
        v = jax.tree_util.tree_map(
            lambda s: jnp.asarray(rs.normal(0, 0.02, s.shape).astype(s.dtype)), shapes)
        f = jax.jit(lambda v, x: bb.apply(v, x)[-1])
        return lambda: f(v, img)

    if name == "decoder":
        from poem_v2_tpu.models.decoder import PtEmbedDecoder

        dec = PtEmbedDecoder(
            n_blocks=3, hidden_size=256, num_heads=4, n_neighbor=32,
            n_neighbor_query=32, use_flash=True, approx_knn=False,
            use_fused_knn=True, dtype=jnp.bfloat16,
        )
        qx = jax.random.normal(rng, (8, 799, 3))
        qf = jax.random.normal(rng, (8, 799, 256), dtype=jnp.bfloat16)
        px = jax.random.normal(rng, (8, 4096, 3))
        pf = jax.random.normal(rng, (8, 4096, 256), dtype=jnp.bfloat16)
        qa = jnp.arange(32, dtype=jnp.int32)
        axyz = jax.random.normal(rng, (32, 3))
        dv = dec.init({"params": rng, "dropout": rng}, qx, qf, px, pf, qa, qa, axyz)
        f = jax.jit(lambda v: dec.apply(v, qx, qf, px, pf, qa, qa, axyz)[0])
        return lambda: f(dv)

    if name == "full":
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
        model, aux = create_poem_model(cfg, dtype=jnp.bfloat16)
        ds = SyntheticMultiviewDataset(batch_size=batch, view_max=8, image_size=256,
                                       seed=0, random_views=False, view_range=(8, 8))
        data = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}
        shapes = jax.eval_shape(
            lambda: model.init({"params": rng, "noise": rng, "dropout": rng},
                               data["image"], data["view_mask"], data["cam_intr"],
                               data["cam_extr"], data["master_joints_3d"], train=False))
        rs = np.random.RandomState(0)
        variables = jax.tree_util.tree_map(
            lambda s: jnp.asarray(rs.normal(0, 0.02, s.shape).astype(s.dtype)), shapes)

        @jax.jit
        def f(params):
            preds = model.apply({"params": params}, data["image"], data["view_mask"],
                                data["cam_intr"], data["cam_extr"], None, train=False)
            return preds["pred_joints_3d"], preds["pred_verts_3d"]

        params = variables["params"]
        return lambda: f(params)

    if name == "train":
        # full train step (fwd + bwd + Adam + per-param clip) on the release
        # medium recipe — the same program scripts/bench_train.py times
        from poem_v2_tpu.data import SyntheticMultiviewDataset
        from poem_v2_tpu.models.poem import create_poem_model
        from poem_v2_tpu.parallel.mesh import create_mesh, shard_batch
        from poem_v2_tpu.training.trainer import Trainer
        from poem_v2_tpu.utils.config import Config

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        full_cfg = Config.from_yaml(os.path.join(here, "configs", "release",
                                                 "train_medium.yaml"))
        cfg = full_cfg.MODEL
        cfg.TRAIN = full_cfg.TRAIN
        cfg.DATA_PRESET = full_cfg.DATA_PRESET
        model, aux = create_poem_model(cfg, dtype=jnp.bfloat16, remat=True,
                                       use_flash_train=True)
        mesh = create_mesh()
        trainer = Trainer(model, aux, train_cfg=cfg.TRAIN, loss_cfg=cfg.LOSS,
                          mesh=mesh, steps_per_epoch=1000)
        ds = SyntheticMultiviewDataset(batch_size=batch, view_max=8,
                                       image_size=256, seed=0,
                                       random_views=False, view_range=(8, 8))
        b = ds.sample_batch()
        shapes = jax.eval_shape(trainer.init_state,
                                {k: jnp.asarray(v) for k, v in b.items()})
        rs = np.random.RandomState(0)

        def fab(sd):
            if str(sd.dtype).startswith(("float", "bfloat")):
                return jnp.asarray(rs.normal(0, 0.02, sd.shape).astype(sd.dtype))
            return jnp.zeros(sd.shape, sd.dtype)

        state_box = [jax.tree_util.tree_map(fab, shapes)]
        dev_batch = shard_batch(trainer._to_device_batch(b), mesh)

        def step():
            state_box[0], metrics = trainer._train_step(state_box[0], dev_batch)
            # 1-d so the harness's [:1] fetch tap works on it
            return jnp.reshape(metrics["loss"], (1,))

        return step

    raise ValueError(name)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prog", type=str, required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--json-out", type=str, default="")
    args = p.parse_args()

    import jax

    # persistent compile cache (train-step compiles take minutes through
    # the tunneled TPU; bench_train.py shares the same cache dir)
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    fn = build_program(args.prog, args.batch)
    # compile + warm
    jax.block_until_ready(fn())
    np.asarray(jax.tree_util.tree_leaves(fn())[0][:1])  # force fetch

    tmp = tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(tmp)
    out = None
    for _ in range(args.iters):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    jax.profiler.stop_trace()

    xplanes = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        print("NO TRACE CAPTURED", tmp)
        return
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    js = json.loads(data)
    # hlo_stats GViz JSON: cols + rows
    cols = [c["label"] for c in js["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in js["rows"]]

    def col(label):
        for i, c in enumerate(cols):
            if label.lower() in c.lower():
                return i
        return None

    i_time = col("total self time (us)") or col("self time")
    i_text = col("hlo op text")
    i_name = col("hlo op name") or col("op name")
    i_cat = col("hlo category") or col("category")
    i_bound = col("bound by")
    i_gfs = col("normalized gflop/s")
    rows.sort(key=lambda r: -(r[i_time] or 0))
    total = sum(r[i_time] or 0 for r in rows)
    print(f"total device self-time: {total/1e3:.3f} ms over {args.iters} iters "
          f"=> {total/1e3/args.iters:.3f} ms/iter")
    print(f"{'us/iter':>9s}  {'%':>5s}  {'GF/s':>7s}  {'bound':>6s}  op")
    for r in rows[: args.top]:
        t = (r[i_time] or 0) / args.iters
        frac = 100 * (r[i_time] or 0) / max(total, 1)
        name = str(r[i_text] if i_text is not None else r[i_name])[:160]
        gfs = r[i_gfs] if i_gfs is not None else 0
        bound = r[i_bound] if i_bound is not None else "?"
        print(f"{t:9.1f}  {frac:5.1f}  {gfs!s:>7s}  {bound!s:>6s}  {name}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"cols": cols, "rows": rows, "iters": args.iters}, f)
        print("rows dumped to", args.json_out)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
