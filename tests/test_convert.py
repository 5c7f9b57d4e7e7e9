"""Torch->JAX converter: mapping fills the flax tree with right shapes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from poem_v2_tpu.models.decoder import PtEmbedDecoder
from poem_v2_tpu.utils.torch_convert import convert_decoder_block

pytestmark = [pytest.mark.slow, pytest.mark.parity]  # torch-differential tier: pytest -m parity


def fabricate_torch_block(prefix: str, d: int = 64) -> dict:
    """State dict with the reference point_METRO_block naming/shapes."""
    g = torch.Generator().manual_seed(0)

    def w(*shape):
        return torch.randn(*shape, generator=g)

    s = {}
    s[prefix + "embedding.weight"] = w(d, d)
    s[prefix + "embedding.bias"] = w(d)
    for attn in ("encoder.attn", "encoder.cross_attn"):
        for part in ("query", "key", "value"):
            s[f"{prefix}{attn}.self.{part}.weight"] = w(d, d)
            s[f"{prefix}{attn}.self.{part}.bias"] = w(d)
        s[f"{prefix}{attn}.output.dense.weight"] = w(d, d)
        s[f"{prefix}{attn}.output.dense.bias"] = w(d)
        s[f"{prefix}{attn}.output.LayerNorm.weight"] = w(d)
        s[f"{prefix}{attn}.output.LayerNorm.bias"] = w(d)
    for sub in ("query_self_attn.", "query_cross_attn."):
        base = prefix + "encoder.vec_attn." + sub
        s[base + "fc1.weight"] = w(d, d)
        s[base + "fc1.bias"] = w(d)
        s[base + "fc2.weight"] = w(d, d)
        s[base + "fc2.bias"] = w(d)
        for wn in ("w_qs", "w_ks", "w_vs"):
            s[base + wn + ".weight"] = w(d, d)
        s[base + "fc_delta.0.weight"] = w(d, 3)
        s[base + "fc_delta.0.bias"] = w(d)
        s[base + "fc_delta.2.weight"] = w(d, d)
        s[base + "fc_delta.2.bias"] = w(d)
        s[base + "fc_gamma.0.weight"] = w(d, d)
        s[base + "fc_gamma.0.bias"] = w(d)
        s[base + "fc_gamma.2.weight"] = w(d, d)
        s[base + "fc_gamma.2.bias"] = w(d)
    va = prefix + "encoder.vec_attn."
    s[va + "reg_branch.0.weight"] = w(d, d)
    s[va + "reg_branch.0.bias"] = w(d)
    s[va + "reg_branch.2.weight"] = w(3, d)
    s[va + "reg_branch.2.bias"] = w(3)
    s[prefix + "encoder.intermediate.dense.weight"] = w(4 * d, d)
    s[prefix + "encoder.intermediate.dense.bias"] = w(4 * d)
    s[prefix + "encoder.output.dense.weight"] = w(d, 4 * d)
    s[prefix + "encoder.output.dense.bias"] = w(d)
    s[prefix + "encoder.output.LayerNorm.weight"] = w(d)
    s[prefix + "encoder.output.LayerNorm.bias"] = w(d)
    return s


def test_decoder_block_conversion_shapes():
    d = 64
    dec = PtEmbedDecoder(n_blocks=1, hidden_size=d, n_neighbor=4, n_neighbor_query=4)
    rng = jax.random.PRNGKey(0)
    qx = jnp.zeros((1, 16, 3))
    qf = jnp.zeros((1, 16, d))
    px = jnp.zeros((1, 32, 3))
    pf = jnp.zeros((1, 32, d))
    anchors = jnp.arange(4, dtype=jnp.int32)
    variables = dec.init({"params": rng, "dropout": rng}, qx, qf, px, pf, anchors, anchors)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    state = fabricate_torch_block("ptEmb_head.transformer.pt_metro_encoder.0.", d)
    used = convert_decoder_block(
        state, "ptEmb_head.transformer.pt_metro_encoder.0.", params, "block_0"
    )
    # every fabricated key must be consumed
    assert set(used) == set(state.keys()), set(state) - set(used)

    # spot-check a transpose: torch Linear (O, I) -> kernel (I, O)
    np.testing.assert_allclose(
        params["block_0"]["embedding"]["kernel"],
        state["ptEmb_head.transformer.pt_metro_encoder.0.embedding.weight"].numpy().T,
    )
    # converted params still run
    out = dec.apply({"params": params}, qx, qf, px, pf, anchors, anchors)
    assert np.isfinite(np.asarray(out[0])).all()


def fabricate_torchvision_resnet18(prefix="img_backbone."):
    g = torch.Generator().manual_seed(1)

    def w(*shape):
        return torch.randn(*shape, generator=g)

    _orig_w = w

    def wpos(*shape):
        return torch.rand(*shape, generator=g) + 0.5

    s = {prefix + "conv1.weight": w(64, 3, 7, 7)}
    for t in ("weight", "bias", "running_mean"):
        s[prefix + f"bn1.{t}"] = w(64)
    s[prefix + "bn1.running_var"] = wpos(64)
    widths = [64, 128, 256, 512]
    in_w = 64
    for li, n_blocks in enumerate((2, 2, 2, 2)):
        width = widths[li]
        for b in range(n_blocks):
            base = prefix + f"layer{li + 1}.{b}."
            first_in = in_w if b == 0 else width
            s[base + "conv1.weight"] = w(width, first_in, 3, 3)
            s[base + "conv2.weight"] = w(width, width, 3, 3)
            for bn in ("bn1", "bn2"):
                for t in ("weight", "bias", "running_mean"):
                    s[base + f"{bn}.{t}"] = w(width)
                s[base + f"{bn}.running_var"] = wpos(width)
            if b == 0 and li > 0:
                s[base + "downsample.0.weight"] = w(width, first_in, 1, 1)
                for t in ("weight", "bias", "running_mean"):
                    s[base + f"downsample.1.{t}"] = w(width)
                s[base + "downsample.1.running_var"] = wpos(width)
        in_w = width
    return s


def test_resnet_backbone_conversion():
    from poem_v2_tpu.models.backbones.resnet import ResNet
    from poem_v2_tpu.utils.torch_convert import convert_resnet_backbone

    model = ResNet(arch="resnet18", norm="frozen_bn")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    state = fabricate_torchvision_resnet18()
    used = convert_resnet_backbone({"backbone": None} and state, {"backbone": params},
                                   arch="resnet18")
    assert set(used) == set(state.keys()), set(state) - set(used)

    # converted stem conv kernel is the (kH, kW, I, O) transpose
    np.testing.assert_allclose(
        params["stem_conv"]["kernel"],
        state["img_backbone.conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )
    # frozen-bn stats landed
    np.testing.assert_allclose(
        params["stem_norm"]["var"], state["img_backbone.bn1.running_var"].numpy()
    )
    # converted params still run
    out = model.apply({"params": params}, jnp.zeros((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(out["res_layer4_mean"])).all()


def test_neck_conversion():
    from poem_v2_tpu.models.neck import ResNetFeatNeck, UVDecodeNeck
    from poem_v2_tpu.utils.torch_convert import convert_necks

    feats = [
        jnp.zeros((1, 16, 16, 64)), jnp.zeros((1, 8, 8, 128)),
        jnp.zeros((1, 4, 4, 256)), jnp.zeros((1, 2, 2, 512)),
    ]
    fn = ResNetFeatNeck(feat_size=(512, 256, 128, 64), norm="frozen_bn")
    un = UVDecodeNeck(feat_size=(512, 256, 128, 64), norm="frozen_bn")
    fp = jax.tree_util.tree_map(np.asarray, fn.init(jax.random.PRNGKey(0), feats)["params"])
    up = jax.tree_util.tree_map(np.asarray, un.init(jax.random.PRNGKey(1), feats)["params"])

    g = torch.Generator().manual_seed(2)

    def conv_block_state(prefix, cin, cout, k, with_bn=True):
        s = {
            f"{prefix}.conv.weight": torch.randn(cout, cin, k, k, generator=g),
            f"{prefix}.conv.bias": torch.randn(cout, generator=g),
        }
        if with_bn:
            s[f"{prefix}.norm.weight"] = torch.randn(cout, generator=g)
            s[f"{prefix}.norm.bias"] = torch.randn(cout, generator=g)
            s[f"{prefix}.norm.running_mean"] = torch.randn(cout, generator=g)
            s[f"{prefix}.norm.running_var"] = torch.rand(cout, generator=g) + 0.5
        return s

    # resnet18 neck shapes (reference POEM.py:59-86)
    state = {}
    state.update(conv_block_state("feat_delayer.0", 256 + 512, 256, 3))
    state.update(conv_block_state("feat_delayer.1", 128 + 256, 128, 3))
    state.update(conv_block_state("feat_delayer.2", 64 + 128, 64, 3))
    state.update(conv_block_state("feat_in", 64, 128, 1, with_bn=False))
    state.update(conv_block_state("uv_delayer.0", 256 + 512, 256, 3))
    state.update(conv_block_state("uv_delayer.1", 128 + 256, 128, 3))
    state.update(conv_block_state("uv_delayer.2", 64 + 128, 64, 3))
    state.update(conv_block_state("uv_out", 64, 21, 1, with_bn=False))
    state.update(conv_block_state("uv_in", 21, 128, 1))

    used = convert_necks(state, {"feat_neck": fp, "uv_neck": up})
    assert set(used) == set(state.keys()), set(state) - set(used)
    np.testing.assert_allclose(
        fp["ConvBlock_0"]["Conv_0"]["kernel"],
        state["feat_delayer.0.conv.weight"].numpy().transpose(2, 3, 1, 0),
    )


def test_hrnet_backbone_conversion():
    """Fabricate a torch HRNet trunk state dict (tiny spec) and check the
    converter fills the flax tree with correctly transposed weights."""
    from poem_v2_tpu.models.backbones.hrnet import HRNet
    from poem_v2_tpu.utils.torch_convert import convert_hrnet_backbone

    model = HRNet(width=8, norm="frozen_bn", stage_modules=(1, 1, 1), stage_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    g = torch.Generator().manual_seed(0)
    state = {}

    def add_conv(tkey, jpath):
        node = params
        for p in jpath:
            node = node[p]
        kh, kw, cin, cout = node["kernel"].shape
        state[f"img_backbone.{tkey}.weight"] = torch.randn(cout, cin, kh, kw, generator=g)

    def add_bn(tkey, jpath):
        node = params
        for p in jpath:
            node = node[p]
        c = node["scale"].shape[0]
        state[f"img_backbone.{tkey}.weight"] = torch.randn(c, generator=g)
        state[f"img_backbone.{tkey}.bias"] = torch.randn(c, generator=g)
        state[f"img_backbone.{tkey}.running_mean"] = torch.randn(c, generator=g)
        state[f"img_backbone.{tkey}.running_var"] = torch.rand(c, generator=g) + 0.5

    add_conv("conv1", ["stem1"]); add_bn("bn1", ["stem1_norm"])
    add_conv("conv2", ["stem2"]); add_bn("bn2", ["stem2_norm"])
    for b in range(4):
        for ci in range(3):
            add_conv(f"layer1.{b}.conv{ci+1}", [f"layer1_block{b}", f"Conv_{ci}"])
            add_bn(f"layer1.{b}.bn{ci+1}", [f"layer1_block{b}", f"FrozenBatchNorm_{ci}"])
        if f"Conv_3" in params[f"layer1_block{b}"]:
            add_conv(f"layer1.{b}.downsample.0", [f"layer1_block{b}", "Conv_3"])
            add_bn(f"layer1.{b}.downsample.1", [f"layer1_block{b}", "FrozenBatchNorm_3"])
    for tk, jn in [("transition1.0.0", "t1_b0"), ("transition1.1.0.0", "t1_b1"),
                   ("transition2.2.0.0", "t2_b2"), ("transition3.3.0.0", "t3_b3")]:
        add_conv(tk, [jn]); add_bn(tk[:-2] + ".1" if tk.count(".") == 3 else tk[:-2] + ".1",
                                   [jn + "_norm"])
    for s_idx in (2, 3, 4):
        for i in range(s_idx):
            t_blk = f"stage{s_idx}.0.branches.{i}.0"
            j_blk = [f"stage{s_idx}_m0", f"branch{i}_block0"]
            for ci in range(2):
                add_conv(f"{t_blk}.conv{ci+1}", j_blk + [f"Conv_{ci}"])
                add_bn(f"{t_blk}.bn{ci+1}", j_blk + [f"FrozenBatchNorm_{ci}"])
        for i in range(s_idx):
            for j in range(s_idx):
                if j > i:
                    add_conv(f"stage{s_idx}.0.fuse_layers.{i}.{j}.0",
                             [f"stage{s_idx}_m0", "fuse", f"up_{j}_to_{i}_conv"])
                    add_bn(f"stage{s_idx}.0.fuse_layers.{i}.{j}.1",
                           [f"stage{s_idx}_m0", "fuse", f"up_{j}_to_{i}_norm"])
                elif j < i:
                    for k in range(i - j):
                        add_conv(f"stage{s_idx}.0.fuse_layers.{i}.{j}.{k}.0",
                                 [f"stage{s_idx}_m0", "fuse", f"down_{j}_to_{i}_conv{k}"])
                        add_bn(f"stage{s_idx}.0.fuse_layers.{i}.{j}.{k}.1",
                               [f"stage{s_idx}_m0", "fuse", f"down_{j}_to_{i}_norm{k}"])

    used = convert_hrnet_backbone(state, {"backbone": params},
                                  stage_modules=(1, 1, 1), stage_blocks=1)
    assert set(used) == set(state), f"unconsumed: {set(state) - set(used)}"

    np.testing.assert_allclose(
        params["stem1"]["kernel"],
        state["img_backbone.conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        params["stage4_m0"]["fuse"]["up_2_to_0_conv"]["kernel"],
        state["img_backbone.stage4.0.fuse_layers.0.2.0.weight"].numpy().transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        params["stage3_m0"]["fuse"]["down_0_to_2_norm1"]["var"],
        state["img_backbone.stage3.0.fuse_layers.2.0.1.1.running_var"].numpy(),
    )

    # converted params still run
    out = HRNet(width=8, norm="frozen_bn", stage_modules=(1, 1, 1), stage_blocks=1).apply(
        {"params": params}, jnp.zeros((1, 64, 64, 3))
    )
    assert len(out) == 4 and all(np.isfinite(np.asarray(o)).all() for o in out)


def test_prepare_hrnet_roundtrip(tmp_path):
    """Fabricated ImageNet-style HRNet .pth -> prepare script -> orbax
    backbone checkpoint -> warm-start merge."""
    import sys
    sys.path.insert(0, "scripts")
    from poem_v2_tpu.models.backbones.hrnet import HRNet
    from prepare_hrnet import main as prepare_main

    # fabricate the torch state dict from the flax shapes (tiny spec isn't
    # supported by the script's fixed (1,4,3)x4 stages, so use width=8 full)
    model = HRNet(width=8, norm="frozen_bn")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    g = torch.Generator().manual_seed(1)
    state = {}

    def add_conv(tkey, node):
        kh, kw, cin, cout = node["kernel"].shape
        state[f"{tkey}.weight"] = torch.randn(cout, cin, kh, kw, generator=g)

    def add_bn(tkey, node):
        c = node["scale"].shape[0]
        state[f"{tkey}.weight"] = torch.randn(c, generator=g)
        state[f"{tkey}.bias"] = torch.randn(c, generator=g)
        state[f"{tkey}.running_mean"] = torch.randn(c, generator=g)
        state[f"{tkey}.running_var"] = torch.rand(c, generator=g) + 0.5

    add_conv("conv1", params["stem1"]); add_bn("bn1", params["stem1_norm"])
    add_conv("conv2", params["stem2"]); add_bn("bn2", params["stem2_norm"])
    for b in range(4):
        blk = params[f"layer1_block{b}"]
        for ci in range(3):
            add_conv(f"layer1.{b}.conv{ci+1}", blk[f"Conv_{ci}"])
            add_bn(f"layer1.{b}.bn{ci+1}", blk[f"FrozenBatchNorm_{ci}"])
        if "Conv_3" in blk:
            add_conv(f"layer1.{b}.downsample.0", blk["Conv_3"])
            add_bn(f"layer1.{b}.downsample.1", blk["FrozenBatchNorm_3"])
    for tk, jn in [("transition1.0", "t1_b0"), ("transition1.1.0", "t1_b1"),
                   ("transition2.2.0", "t2_b2"), ("transition3.3.0", "t3_b3")]:
        add_conv(tk + ".0", params[jn]); add_bn(tk + ".1", params[jn + "_norm"])
    for s_idx, n_mod in zip((2, 3, 4), (1, 4, 3)):
        for m in range(n_mod):
            mod = params[f"stage{s_idx}_m{m}"]
            for i in range(s_idx):
                for b in range(4):
                    blk = mod[f"branch{i}_block{b}"]
                    for ci in range(2):
                        add_conv(f"stage{s_idx}.{m}.branches.{i}.{b}.conv{ci+1}", blk[f"Conv_{ci}"])
                        add_bn(f"stage{s_idx}.{m}.branches.{i}.{b}.bn{ci+1}", blk[f"FrozenBatchNorm_{ci}"])
            fuse = mod["fuse"]
            for i in range(s_idx):
                for j in range(s_idx):
                    if j > i:
                        add_conv(f"stage{s_idx}.{m}.fuse_layers.{i}.{j}.0", fuse[f"up_{j}_to_{i}_conv"])
                        add_bn(f"stage{s_idx}.{m}.fuse_layers.{i}.{j}.1", fuse[f"up_{j}_to_{i}_norm"])
                    elif j < i:
                        for k in range(i - j):
                            add_conv(f"stage{s_idx}.{m}.fuse_layers.{i}.{j}.{k}.0", fuse[f"down_{j}_to_{i}_conv{k}"])
                            add_bn(f"stage{s_idx}.{m}.fuse_layers.{i}.{j}.{k}.1", fuse[f"down_{j}_to_{i}_norm{k}"])

    pth = tmp_path / "hrnet_w8.pth"
    torch.save(state, str(pth))
    out = tmp_path / "hrnet_w8_flax"
    prepare_main(["--torch-ckpt", str(pth), "--width", "8", "--out", str(out)])

    import orbax.checkpoint as ocp
    restored = ocp.StandardCheckpointer().restore(
        str(out), {"backbone": params})
    np.testing.assert_allclose(
        restored["backbone"]["stem1"]["kernel"],
        state["conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )


def test_neck_conversion_hrnet_variant():
    """The same name mapping must fill the HRNet-shaped necks."""
    from poem_v2_tpu.models.neck import HRNetFeatNeck, UVDecodeNeck
    from poem_v2_tpu.utils.torch_convert import convert_necks

    feat_size = (8, 16, 32, 64)
    feats = [jnp.zeros((1, 64 // 2**i, 64 // 2**i, c)) for i, c in enumerate(feat_size)]
    fn = HRNetFeatNeck(feat_size=feat_size, norm="frozen_bn")
    uv = UVDecodeNeck(feat_size=feat_size, hrnet=True, norm="frozen_bn")
    fparams = jax.tree_util.tree_map(np.asarray, fn.init(jax.random.PRNGKey(0), feats)["params"])
    uparams = jax.tree_util.tree_map(np.asarray, uv.init(jax.random.PRNGKey(0), feats)["params"])

    g = torch.Generator().manual_seed(0)
    state = {}

    def add_block(tkey, node):
        kh, kw, cin, cout = node["Conv_0"]["kernel"].shape
        state[f"{tkey}.conv.weight"] = torch.randn(cout, cin, kh, kw, generator=g)
        state[f"{tkey}.conv.bias"] = torch.randn(cout, generator=g)
        if "FrozenBatchNorm_0" in node:
            c = node["FrozenBatchNorm_0"]["scale"].shape[0]
            state[f"{tkey}.norm.weight"] = torch.randn(c, generator=g)
            state[f"{tkey}.norm.bias"] = torch.randn(c, generator=g)
            state[f"{tkey}.norm.running_mean"] = torch.randn(c, generator=g)
            state[f"{tkey}.norm.running_var"] = torch.rand(c, generator=g) + 0.5

    for i in range(3):
        add_block(f"feat_delayer.{i}", fparams[f"ConvBlock_{i}"])
        add_block(f"uv_delayer.{i}", uparams[f"ConvBlock_{i}"])
    add_block("feat_in", fparams["feat_in"])
    add_block("uv_out", uparams["uv_out"])
    add_block("uv_in", uparams["uv_in"])

    used = convert_necks(state, {"feat_neck": fparams, "uv_neck": uparams})
    assert set(used) == set(state)
    np.testing.assert_allclose(
        fparams["ConvBlock_0"]["Conv_0"]["kernel"],
        state["feat_delayer.0.conv.weight"].numpy().transpose(2, 3, 1, 0),
    )


def test_full_checkpoint_conversion_end_to_end():
    """convert_poem_checkpoint on a COMPLETE fabricated state dict
    (resnet18 backbone + both necks + head + 2 decoder blocks): every
    key consumed, converted model runs finite."""
    from helpers import TINY_MODEL_CFG, tiny_batch
    from poem_v2_tpu.models.poem import create_poem_model
    from poem_v2_tpu.utils.config import Config
    from poem_v2_tpu.utils.torch_convert import convert_poem_checkpoint

    cfg = Config(TINY_MODEL_CFG.to_dict())
    cfg.BACKBONE.NORM = "frozen_bn"
    model, aux = create_poem_model(cfg)
    batch = tiny_batch(batch_size=1, view_max=2, image_size=64, random_views=False)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "noise": rng, "dropout": rng},
                           batch["image"], batch["view_mask"], batch["cam_intr"],
                           batch["cam_extr"], batch["master_joints_3d"], train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    g = torch.Generator().manual_seed(3)
    state = {}
    state.update(fabricate_torchvision_resnet18())

    def cb(prefix, node):
        kh, kw, cin, cout = node["Conv_0"]["kernel"].shape
        state[f"{prefix}.conv.weight"] = torch.randn(cout, cin, kh, kw, generator=g)
        state[f"{prefix}.conv.bias"] = torch.randn(cout, generator=g)
        if "FrozenBatchNorm_0" in node:
            for t in ("weight", "bias", "running_mean"):
                state[f"{prefix}.norm.{t}"] = torch.randn(cout, generator=g)
            state[f"{prefix}.norm.running_var"] = torch.rand(cout, generator=g) + 0.5

    for i in range(3):
        cb(f"feat_delayer.{i}", params["feat_neck"][f"ConvBlock_{i}"])
        cb(f"uv_delayer.{i}", params["uv_neck"][f"ConvBlock_{i}"])
    cb("feat_in", params["feat_neck"]["feat_in"])
    cb("uv_out", params["uv_neck"]["uv_out"])
    cb("uv_in", params["uv_neck"]["uv_in"])

    head = params["head"]
    for tkey, jnode in [("input_proj", head["input_proj"]),
                        ("adapt_pos3d", head["adapt_pos3d"])]:
        kh, kw, cin, cout = jnode["kernel"].shape
        state[f"ptEmb_head.{tkey}.weight"] = torch.randn(cout, cin, kh, kw, generator=g)
        state[f"ptEmb_head.{tkey}.bias"] = torch.randn(cout, generator=g)
    for i, net in enumerate(["merge_net_0", "merge_net_1"]):
        for j, dense in enumerate(["Dense_0", "Dense_1"]):
            ci, co = head["merge_feature"][net][dense]["kernel"].shape
            state[f"ptEmb_head.merge_net_feature.{i}.{2*j}.weight"] = torch.randn(co, ci, generator=g)
            state[f"ptEmb_head.merge_net_feature.{i}.{2*j}.bias"] = torch.randn(co, generator=g)
    nq, dq = head["query_feat_embedding"].shape
    state["ptEmb_head.query_feat_embedding.weight"] = torch.randn(nq, dq, generator=g)
    n_blocks = len([b for b in head["transformer"] if b.startswith("block_")])
    for i in range(n_blocks):
        state.update(fabricate_torch_block(
            f"ptEmb_head.transformer.pt_metro_encoder.{i}.", dq))

    new_params, leftover = convert_poem_checkpoint(state, params, arch="resnet18")
    assert leftover == [], f"unconsumed keys: {leftover[:8]}"

    preds = model.apply({"params": new_params},
                        batch["image"], batch["view_mask"], batch["cam_intr"],
                        batch["cam_extr"], batch["master_joints_3d"], train=False)
    assert np.isfinite(np.asarray(preds["pred_verts_3d"])).all()
    # spot-check a converted leaf actually landed
    np.testing.assert_allclose(
        new_params["head"]["query_feat_embedding"],
        state["ptEmb_head.query_feat_embedding.weight"].numpy(),
    )


def test_convert_checkpoint_cli(tmp_path):
    """scripts/convert_checkpoint.py on a fabricated tiny ckpt; output
    loads back through Recorder.load_params (the --reload path)."""
    import sys
    import yaml
    sys.path.insert(0, "scripts")
    from convert_checkpoint import main as convert_main

    from helpers import TINY_MODEL_CFG
    from poem_v2_tpu.models.poem import create_poem_model
    from poem_v2_tpu.utils.config import Config
    from poem_v2_tpu.utils.recorder import Recorder

    cfg_d = {"MODEL": TINY_MODEL_CFG.to_dict(),
             "DATA_PRESET": {"CENTER_IDX": 0, "NUM_JOINTS": 21,
                             "NUM_VERTS": 778, "IMAGE_SIZE": [64, 64]}}
    cfg_d["MODEL"]["BACKBONE"]["NORM"] = "frozen_bn"
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_d, f)

    # fabricate a matching torch state dict from the flax shapes
    cfg = Config(cfg_d)
    model, _ = create_poem_model(cfg.MODEL)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "noise": rng, "dropout": rng},
        jnp.zeros((1, 2, 64, 64, 3)), jnp.ones((1, 2), bool),
        jnp.tile(jnp.eye(3)[None, None] * 100, (1, 2, 1, 1)),
        jnp.tile(jnp.eye(4)[None, None], (1, 2, 1, 1)),
        jnp.zeros((1, 21, 3)), train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    state = dict(fabricate_torchvision_resnet18())
    g = torch.Generator().manual_seed(5)

    def cb(prefix, node):
        kh, kw, cin, cout = node["Conv_0"]["kernel"].shape
        state[f"{prefix}.conv.weight"] = torch.randn(cout, cin, kh, kw, generator=g)
        state[f"{prefix}.conv.bias"] = torch.randn(cout, generator=g)
        if "FrozenBatchNorm_0" in node:
            for t in ("weight", "bias", "running_mean"):
                state[f"{prefix}.norm.{t}"] = torch.randn(cout, generator=g)
            state[f"{prefix}.norm.running_var"] = torch.rand(cout, generator=g) + 0.5

    for i in range(3):
        cb(f"feat_delayer.{i}", params["feat_neck"][f"ConvBlock_{i}"])
        cb(f"uv_delayer.{i}", params["uv_neck"][f"ConvBlock_{i}"])
    cb("feat_in", params["feat_neck"]["feat_in"])
    cb("uv_out", params["uv_neck"]["uv_out"])
    cb("uv_in", params["uv_neck"]["uv_in"])
    pth = tmp_path / "tiny.pth.tar"
    torch.save({"state_dict": state}, str(pth))

    out = tmp_path / "tiny_flax"
    convert_main(["-c", str(cfg_path), "--torch-ckpt", str(pth), "--out", str(out)])

    restored = Recorder.load_params(str(out), params)
    np.testing.assert_allclose(
        np.asarray(restored["backbone"]["stem_conv"]["kernel"]),
        state["img_backbone.conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )
