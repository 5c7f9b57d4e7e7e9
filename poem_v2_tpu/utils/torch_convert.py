"""Torch-checkpoint -> JAX parameter converter.

Maps the reference's released ``.pth.tar`` state dicts
(PtEmbedMultiviewStereoV2; lib/utils/io_utils.py save format) onto this
framework's flax parameter tree, for metric-parity evaluation against
the published checkpoints.

Conventions converted:
* Conv2d weight (O, I, kH, kW) -> flax (kH, kW, I, O)
* Linear weight (O, I) -> flax kernel (I, O)
* BatchNorm (weight, bias, running_mean, running_var) -> FrozenBatchNorm
  (scale, bias, mean, var) — evaluate with NORM=frozen_bn
* LayerNorm weight/bias -> flax scale/bias
* nn.Embedding weight -> embedding table

The mapping below covers the flagship POEM model; unmatched keys are
returned for inspection rather than silently dropped.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _t2n(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_conv(w) -> np.ndarray:
    return _t2n(w).transpose(2, 3, 1, 0)


def convert_linear(w) -> np.ndarray:
    return _t2n(w).T


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    state = payload.get("state_dict", payload)
    # strip DDP "module." prefixes (reference io_utils.py:56-150)
    return {k[len("module."):] if k.startswith("module.") else k: v for k, v in state.items()}


def set_in_tree(tree: Dict, path: List[str], value: np.ndarray, strict_shape=True):
    node = tree
    for p in path[:-1]:
        if p not in node:
            raise KeyError(f"missing branch {'/'.join(path)} at {p}")
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        raise KeyError(f"missing leaf {'/'.join(path)}")
    if strict_shape and tuple(node[leaf].shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: "
            f"{tuple(node[leaf].shape)} vs {tuple(value.shape)}"
        )
    node[leaf] = value.astype(np.float32)


def convert_decoder_block(state: Dict, prefix: str, params: Dict, block: str) -> List[str]:
    """Map one reference point_METRO_block onto PointMetroBlock params.

    prefix: e.g. 'ptEmb_head.transformer.pt_metro_encoder.0.'
    block: e.g. 'block_0' under .../transformer/.
    """
    used = []
    b = params[block]

    def put(torch_key, path, conv=convert_linear, bias_key=None):
        if torch_key in state:
            set_in_tree(params, [block] + path + ["kernel"], conv(state[torch_key]))
            used.append(torch_key)
        bk = bias_key or torch_key.replace("weight", "bias")
        if bk in state:
            set_in_tree(params, [block] + path + ["bias"], _t2n(state[bk]))
            used.append(bk)

    put(prefix + "embedding.weight", ["embedding"])

    # two stacked BertAttention blocks: attn / cross_attn
    for t_name, j_name in (("encoder.attn", "attn"), ("encoder.cross_attn", "cross_attn")):
        base = f"{prefix}{t_name}.self."
        put(base + "query.weight", [j_name, "query"])
        put(base + "key.weight", [j_name, "key"])
        put(base + "value.weight", [j_name, "value"])
        out_base = f"{prefix}{t_name}.output."
        put(out_base + "dense.weight", [j_name, "out"])
        ln_w = out_base + "LayerNorm.weight"
        if ln_w in state:
            set_in_tree(params, [block, j_name, "ln", "scale"], _t2n(state[ln_w]))
            set_in_tree(params, [block, j_name, "ln", "bias"], _t2n(state[out_base + "LayerNorm.bias"]))
            used += [ln_w, out_base + "LayerNorm.bias"]

    # pointer layer (vec_attn): self / cross vector attention + reg branch
    va = prefix + "encoder.vec_attn."
    for t_sub, j_sub in (("query_self_attn.", "query_self_attn"), ("query_cross_attn.", "query_cross_attn")):
        base = va + t_sub
        put(base + "fc1.weight", ["vec_attn", j_sub, "fc1"])
        put(base + "fc2.weight", ["vec_attn", j_sub, "fc2"])
        put(base + "w_qs.weight", ["vec_attn", j_sub, "w_qs"])
        put(base + "w_ks.weight", ["vec_attn", j_sub, "w_ks"])
        put(base + "w_vs.weight", ["vec_attn", j_sub, "w_vs"])
        for mlp in ("fc_delta", "fc_gamma"):
            for layer, suffix in (("0", "1"), ("2", "2")):
                wkey = base + f"{mlp}.{layer}.weight"
                if wkey in state:
                    set_in_tree(params, [block, "vec_attn", j_sub, f"{mlp}_w{suffix}"],
                                convert_linear(state[wkey]))
                    set_in_tree(params, [block, "vec_attn", j_sub, f"{mlp}_b{suffix}"],
                                _t2n(state[wkey.replace("weight", "bias")]))
                    used.extend([wkey, wkey.replace("weight", "bias")])
    put(va + "reg_branch.0.weight", ["vec_attn", "reg_branch", "Dense_0"])
    put(va + "reg_branch.2.weight", ["vec_attn", "reg_branch", "Dense_1"])

    # FFN: intermediate/output + output LayerNorm
    put(prefix + "encoder.intermediate.dense.weight", ["ffn", "intermediate"])
    put(prefix + "encoder.output.dense.weight", ["ffn", "output"])
    ln = prefix + "encoder.output.LayerNorm.weight"
    if ln in state:
        set_in_tree(params, [block, "ffn", "ln", "scale"], _t2n(state[ln]))
        set_in_tree(params, [block, "ffn", "ln", "bias"], _t2n(state[prefix + "encoder.output.LayerNorm.bias"]))
        used += [ln, prefix + "encoder.output.LayerNorm.bias"]

    # parametric output heads (final block only)
    put(prefix + "mano_linear.weight", ["mano_linear"])
    put(prefix + "flat_verts.weight", ["flat_verts"])
    return used


def convert_head(state: Dict, params: Dict) -> List[str]:
    """Map the POEM_Generalized_Head weights (input_proj, adapt_pos3d,
    merge nets, query embedding, decoder blocks)."""
    used = []
    head = params["head"]

    def put_conv(torch_key, path):
        if torch_key in state:
            set_in_tree(head, path + ["kernel"], convert_conv(state[torch_key]))
            set_in_tree(head, path + ["bias"], _t2n(state[torch_key.replace("weight", "bias")]))
            used.extend([torch_key, torch_key.replace("weight", "bias")])

    put_conv("ptEmb_head.input_proj.weight", ["input_proj"])
    put_conv("ptEmb_head.adapt_pos3d.weight", ["adapt_pos3d"])

    for i, net in enumerate(["merge_net_0", "merge_net_1"]):
        for j, dense in enumerate(["Dense_0", "Dense_1"]):
            k = f"ptEmb_head.merge_net_feature.{i}.{2 * j}.weight"
            if k in state:
                set_in_tree(head, ["merge_feature", net, dense, "kernel"], convert_linear(state[k]))
                set_in_tree(head, ["merge_feature", net, dense, "bias"], _t2n(state[k.replace("weight", "bias")]))
                used.extend([k, k.replace("weight", "bias")])

    k = "ptEmb_head.query_feat_embedding.weight"
    if k in state:
        set_in_tree(head, ["query_feat_embedding"], _t2n(state[k]))
        used.append(k)

    n_blocks = len([b for b in head.get("transformer", {}) if b.startswith("block_")])
    for i in range(n_blocks):
        used += convert_decoder_block(
            state, f"ptEmb_head.transformer.pt_metro_encoder.{i}.", head["transformer"], f"block_{i}"
        )
    return used


def convert_poem_checkpoint(
    state: Dict, params: Dict, arch: str = "resnet34"
) -> Tuple[Dict, List[str]]:
    """Convert a full PtEmbedMultiviewStereoV2 state dict.

    Maps backbone (NORM=frozen_bn build required), both necks, and the
    head/decoder. Returns (params, leftover torch keys) — leftovers are
    reported, never silently dropped. Exact-checkpoint parity evals
    additionally need the reference's bps.npy / anchor npy assets.
    """
    params = dict(params)
    used = set(convert_head(state, params))
    if arch.startswith("resnet") and "backbone" in params:
        used |= set(convert_resnet_backbone(state, params, arch=arch))
    elif arch == "HRNet" and "backbone" in params:
        used |= set(convert_hrnet_backbone(state, params))
    if "feat_neck" in params and "uv_neck" in params:
        used |= set(convert_necks(state, params))
    leftover = [k for k in state if k not in used]
    return params, leftover


def convert_frozen_bn(state: Dict, torch_prefix: str, params: Dict, path: List[str]) -> List[str]:
    """BatchNorm2d (weight/bias/running_mean/running_var) -> FrozenBatchNorm."""
    used = []
    mapping = {
        "weight": "scale", "bias": "bias",
        "running_mean": "mean", "running_var": "var",
    }
    for tk, jk in mapping.items():
        key = f"{torch_prefix}.{tk}"
        if key in state:
            set_in_tree(params, path + [jk], _t2n(state[key]))
            used.append(key)
    return used


def convert_resnet_backbone(
    state: Dict, params: Dict, prefix: str = "img_backbone.", arch: str = "resnet34"
) -> List[str]:
    """Map a torchvision-layout ResNet state dict onto the flax backbone.

    Requires the model built with NORM=frozen_bn so BatchNorm statistics
    land in FrozenBatchNorm parameters. Layer layout per BasicBlock:
    Conv_0/FrozenBatchNorm_0 (conv1/bn1), Conv_1/FrozenBatchNorm_1
    (conv2/bn2), Conv_2/FrozenBatchNorm_2 (downsample); Bottleneck adds
    conv3/bn3 before the downsample pair.
    """
    used: List[str] = []
    bb = params["backbone"]

    def put_conv(torch_key, path):
        if torch_key in state:
            set_in_tree(bb, path + ["kernel"], convert_conv(state[torch_key]))
            used.append(torch_key)

    put_conv(prefix + "conv1.weight", ["stem_conv"])
    used.extend(convert_frozen_bn(state, prefix + "bn1", bb, ["stem_norm"]))

    layers = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3), "resnet50": (3, 4, 6, 3)}[arch]
    bottleneck = arch == "resnet50"
    n_convs = 3 if bottleneck else 2
    for li, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            t_base = f"{prefix}layer{li + 1}.{b}."
            j_block = f"layer{li + 1}_block{b}"
            for ci in range(n_convs):
                put_conv(t_base + f"conv{ci + 1}.weight", [j_block, f"Conv_{ci}"])
                used.extend(
                    convert_frozen_bn(state, t_base + f"bn{ci + 1}", bb,
                                      [j_block, f"FrozenBatchNorm_{ci}"])
                )
            ds = t_base + "downsample.0.weight"
            if ds in state:
                put_conv(ds, [j_block, f"Conv_{n_convs}"])
                used.extend(
                    convert_frozen_bn(state, t_base + "downsample.1", bb,
                                      [j_block, f"FrozenBatchNorm_{n_convs}"])
                )
    return used


def convert_conv_block(state: Dict, torch_prefix: str, params: Dict, path: List[str]) -> List[str]:
    """Reference ConvBlock (conv + optional bn, bricks/conv.py:4-44) ->
    flax ConvBlock (Conv_0 + FrozenBatchNorm_0)."""
    used = []
    k = f"{torch_prefix}.conv.weight"
    if k in state:
        set_in_tree(params, path + ["Conv_0", "kernel"], convert_conv(state[k]))
        used.append(k)
        bk = f"{torch_prefix}.conv.bias"
        if bk in state:
            set_in_tree(params, path + ["Conv_0", "bias"], _t2n(state[bk]))
            used.append(bk)
    used.extend(convert_frozen_bn(state, f"{torch_prefix}.norm", params,
                                  path + ["FrozenBatchNorm_0"]))
    if f"{torch_prefix}.norm.num_batches_tracked" in state:
        used.append(f"{torch_prefix}.norm.num_batches_tracked")
    return used


def convert_necks(state: Dict, params: Dict) -> List[str]:
    """Map feat_delayer/feat_in and uv_delayer/uv_out/uv_in onto the flax
    neck trees. The reference uses the same attribute names for both the
    ResNet and HRNet variants (POEM.py:59-112 vs 87-112) — only shapes
    differ, and the mapping is shape-agnostic."""
    used: List[str] = []
    feat = params["feat_neck"]
    uv = params["uv_neck"]
    for i in range(3):
        used += convert_conv_block(state, f"feat_delayer.{i}", feat, [f"ConvBlock_{i}"])
        used += convert_conv_block(state, f"uv_delayer.{i}", uv, [f"ConvBlock_{i}"])
    used += convert_conv_block(state, "feat_in", feat, ["feat_in"])
    used += convert_conv_block(state, "uv_out", uv, ["uv_out"])
    used += convert_conv_block(state, "uv_in", uv, ["uv_in"])
    return used


def convert_hrnet_backbone(
    state: Dict,
    params: Dict,
    prefix: str = "img_backbone.",
    stage_modules: Tuple[int, int, int] = (1, 4, 3),
    stage_blocks: int = 4,
) -> List[str]:
    """Map the reference HRNet trunk onto the flax backbone.

    Reference layout (lib/models/backbones/hrnet.py:240-340): conv1/bn1,
    conv2/bn2 stem; layer1 4x Bottleneck; transition{1,2,3} Sequential
    conv+bn (nested once for new downsampled branches); stage{2,3,4}
    HighResolutionModules with branches.{i}.{b} BasicBlocks and
    fuse_layers.{i}.{j} (1x1 conv+bn upsample for j > i, stride-2 3x3
    conv+bn chains for j < i). The ImageNet classification head
    (incre/downsamp/final/classifier) is not part of the POEM forward
    and is left to the caller's leftover report.

    Requires the flax model built with NORM=frozen_bn.
    """
    used: List[str] = []
    bb = params["backbone"]

    def put_conv(torch_key, path):
        if torch_key in state:
            set_in_tree(bb, path + ["kernel"], convert_conv(state[torch_key]))
            used.append(torch_key)

    def put_bn(torch_prefix, path):
        used.extend(convert_frozen_bn(state, torch_prefix, bb, path))

    put_conv(prefix + "conv1.weight", ["stem1"])
    put_bn(prefix + "bn1", ["stem1_norm"])
    put_conv(prefix + "conv2.weight", ["stem2"])
    put_bn(prefix + "bn2", ["stem2_norm"])

    # stage 1: Bottlenecks (conv1..3 + optional downsample)
    for b in range(4):
        t_base = f"{prefix}layer1.{b}."
        j_block = f"layer1_block{b}"
        for ci in range(3):
            put_conv(t_base + f"conv{ci + 1}.weight", [j_block, f"Conv_{ci}"])
            put_bn(t_base + f"bn{ci + 1}", [j_block, f"FrozenBatchNorm_{ci}"])
        if t_base + "downsample.0.weight" in state:
            put_conv(t_base + "downsample.0.weight", [j_block, "Conv_3"])
            put_bn(t_base + "downsample.1", [j_block, "FrozenBatchNorm_3"])

    # transitions: same-resolution entries are Sequential(conv, bn, relu);
    # new-branch entries are nested Sequential(Sequential(conv, bn, relu))
    for t_key, j_name in [
        ("transition1.0.0", "t1_b0"), ("transition1.0.1", "t1_b0_norm"),
        ("transition1.1.0.0", "t1_b1"), ("transition1.1.0.1", "t1_b1_norm"),
        ("transition2.2.0.0", "t2_b2"), ("transition2.2.0.1", "t2_b2_norm"),
        ("transition3.3.0.0", "t3_b3"), ("transition3.3.0.1", "t3_b3_norm"),
    ]:
        if j_name.endswith("_norm"):
            put_bn(prefix + t_key, [j_name])
        else:
            put_conv(prefix + t_key + ".weight", [j_name])

    # stages 2..4
    for s_idx, n_modules in zip((2, 3, 4), stage_modules):
        n_branches = s_idx
        for m in range(n_modules):
            t_mod = f"{prefix}stage{s_idx}.{m}."
            j_mod = f"stage{s_idx}_m{m}"
            for i in range(n_branches):
                for b in range(stage_blocks):
                    t_blk = f"{t_mod}branches.{i}.{b}."
                    j_blk = [j_mod, f"branch{i}_block{b}"]
                    for ci in range(2):  # BasicBlock
                        put_conv(t_blk + f"conv{ci + 1}.weight", j_blk + [f"Conv_{ci}"])
                        put_bn(t_blk + f"bn{ci + 1}", j_blk + [f"FrozenBatchNorm_{ci}"])
            for i in range(n_branches):
                for j in range(n_branches):
                    if j > i:
                        t_f = f"{t_mod}fuse_layers.{i}.{j}."
                        put_conv(t_f + "0.weight", [j_mod, "fuse", f"up_{j}_to_{i}_conv"])
                        put_bn(t_f + "1", [j_mod, "fuse", f"up_{j}_to_{i}_norm"])
                    elif j < i:
                        for k in range(i - j):
                            t_f = f"{t_mod}fuse_layers.{i}.{j}.{k}."
                            put_conv(t_f + "0.weight",
                                     [j_mod, "fuse", f"down_{j}_to_{i}_conv{k}"])
                            put_bn(t_f + "1", [j_mod, "fuse", f"down_{j}_to_{i}_norm{k}"])
    return used


def convert_petr_head(state: Dict, params: Dict, prefix: str = "") -> List[str]:
    """Map a reference ``PETRHead`` state dict onto our flax PETRHead.

    Reference modules (lib/models/heads/petr_head.py:58-93 +
    lib/models/layers/petr_transformer.py:117-165):

    * ``input_proj`` / ``adapt_pos3d.{0,2}`` / ``position_encoder.{0,2}``
      1x1 convs,
    * ``reference_points`` embedding + ``query_embedding.{0,2}`` linears,
    * ONE shared ``reg_branches`` Sequential (the reference repeats the
      same object per level; only index 0 is read),
    * decoder layers ``transformer.decoder.layers.{i}`` — torch
      ``nn.MultiheadAttention`` packed in_proj split into q/k/v, mmcv FFN
      ``layers.0.0``/``layers.1`` linears, three LayerNorms — plus the
      sequence-level ``post_norm`` applied to every intermediate.

    ``params`` is the head's own param subtree (mutated in place);
    ``prefix`` prepends e.g. ``"ptEmb_head."`` when the head sits inside
    a full-model state dict. Returns the consumed torch keys.
    """
    used: List[str] = []

    def put(torch_key, path, conv=convert_linear):
        bias_key = torch_key.replace("weight", "bias")
        set_in_tree(params, path + ["kernel"], conv(state[prefix + torch_key]))
        set_in_tree(params, path + ["bias"], _t2n(state[prefix + bias_key]))
        used.extend([prefix + torch_key, prefix + bias_key])

    def put_ln(torch_prefix, path):
        set_in_tree(params, path + ["scale"], _t2n(state[prefix + torch_prefix + ".weight"]))
        set_in_tree(params, path + ["bias"], _t2n(state[prefix + torch_prefix + ".bias"]))
        used.extend([prefix + torch_prefix + ".weight", prefix + torch_prefix + ".bias"])

    put("input_proj.weight", ["input_proj"], convert_conv)
    put("adapt_pos3d.0.weight", ["adapt_pos3d_1"], convert_conv)
    put("adapt_pos3d.2.weight", ["adapt_pos3d_2"], convert_conv)
    put("position_encoder.0.weight", ["position_encoder", "pe_conv1"], convert_conv)
    put("position_encoder.2.weight", ["position_encoder", "pe_conv2"], convert_conv)

    set_in_tree(params, ["reference_points"], _t2n(state[prefix + "reference_points.weight"]))
    used.append(prefix + "reference_points.weight")
    put("query_embedding.0.weight", ["query_embedding_1"])
    put("query_embedding.2.weight", ["query_embedding_2"])

    # shared reg branch: Sequential [Linear, ReLU]*num_reg_fcs + Linear(3)
    # (+ Sigmoid) — linears sit at even indices
    n_fc = 0
    while f"{prefix}reg_branches.0.{2 * n_fc}.weight" in state:
        n_fc += 1
    for i in range(n_fc - 1):
        put(f"reg_branches.0.{2 * i}.weight", [f"reg_fc{i}"])
    put(f"reg_branches.0.{2 * (n_fc - 1)}.weight", ["reg_out"])
    # the repeated ModuleList entries alias the same tensors — mark all
    # levels' keys consumed
    lvl = 1
    while f"{prefix}reg_branches.{lvl}.0.weight" in state:
        for i in range(n_fc):
            used.extend([
                f"{prefix}reg_branches.{lvl}.{2 * i}.weight",
                f"{prefix}reg_branches.{lvl}.{2 * i}.bias",
            ])
        lvl += 1

    tr = params["transformer"]
    n_layers = len([k for k in tr if k.startswith("layer_")])
    for i in range(n_layers):
        t = f"transformer.decoder.layers.{i}."
        layer = tr[f"layer_{i}"]
        for ai, attn in ((0, "attn_0"), (1, "attn_1")):
            w = _t2n(state[f"{prefix}{t}attentions.{ai}.attn.in_proj_weight"])
            b = _t2n(state[f"{prefix}{t}attentions.{ai}.attn.in_proj_bias"])
            E = w.shape[1]
            for j, proj in enumerate(["q_proj", "k_proj", "v_proj"]):
                set_in_tree(layer, [attn, proj, "kernel"], w[j * E:(j + 1) * E].T)
                set_in_tree(layer, [attn, proj, "bias"], b[j * E:(j + 1) * E])
            set_in_tree(layer, [attn, "out_proj", "kernel"],
                        convert_linear(state[f"{prefix}{t}attentions.{ai}.attn.out_proj.weight"]))
            set_in_tree(layer, [attn, "out_proj", "bias"],
                        _t2n(state[f"{prefix}{t}attentions.{ai}.attn.out_proj.bias"]))
            used.extend([
                f"{prefix}{t}attentions.{ai}.attn.{k}"
                for k in ("in_proj_weight", "in_proj_bias",
                          "out_proj.weight", "out_proj.bias")
            ])
        set_in_tree(layer, ["ffn_0", "fc1", "kernel"],
                    convert_linear(state[f"{prefix}{t}ffns.0.layers.0.0.weight"]))
        set_in_tree(layer, ["ffn_0", "fc1", "bias"], _t2n(state[f"{prefix}{t}ffns.0.layers.0.0.bias"]))
        set_in_tree(layer, ["ffn_0", "fc2", "kernel"],
                    convert_linear(state[f"{prefix}{t}ffns.0.layers.1.weight"]))
        set_in_tree(layer, ["ffn_0", "fc2", "bias"], _t2n(state[f"{prefix}{t}ffns.0.layers.1.bias"]))
        used.extend([
            f"{prefix}{t}ffns.0.layers.0.0.weight", f"{prefix}{t}ffns.0.layers.0.0.bias",
            f"{prefix}{t}ffns.0.layers.1.weight", f"{prefix}{t}ffns.0.layers.1.bias",
        ])
        for ni in range(3):
            set_in_tree(layer, [f"norm_{ni}", "scale"],
                        _t2n(state[f"{prefix}{t}norms.{ni}.weight"]))
            set_in_tree(layer, [f"norm_{ni}", "bias"],
                        _t2n(state[f"{prefix}{t}norms.{ni}.bias"]))
            used.extend([f"{prefix}{t}norms.{ni}.weight", f"{prefix}{t}norms.{ni}.bias"])
    if "post_norm" in tr:
        put_ln("transformer.decoder.post_norm", ["transformer", "post_norm"])
    return used


def convert_metro_network(state: Dict, params: Dict, prefix: str = "") -> List[str]:
    """Map a reference ``METRO_Hand_Network`` state dict onto METRONetwork.

    Reference modules (lib/external/metro/base_model.py:37-267):

    * ``trans_encoder.{i}`` — three ``METROBlock``s, each a
      ``METRO_Encoder`` (``bert.img_embedding`` input projection, separate
      learned ``bert.position_embeddings``, an HF ``BertEncoder`` stack)
      plus ``cls_head``/``residual`` output reduction. The
      ``bert.embeddings.*`` and ``bert.pooler.*`` submodules are
      constructed but DEAD in forward (base_model.py:69-135 never calls
      them) — they are intentionally not consumed.
    * ``upsampling`` 195->778 vertex upsampler, ``cam_param_fc{,2,3}``
      weak-perspective camera head (base_model.py:199-203).

    ``params`` is the METRONetwork param tree (mutated in place). Returns
    the consumed torch keys.
    """
    used: List[str] = []

    def put(torch_key, path, conv=convert_linear):
        bias_key = torch_key.replace("weight", "bias")
        set_in_tree(params, path + ["kernel"], conv(state[prefix + torch_key]))
        if prefix + bias_key in state:
            set_in_tree(params, path + ["bias"], _t2n(state[prefix + bias_key]))
            used.append(prefix + bias_key)
        used.append(prefix + torch_key)

    def put_ln(torch_prefix, path):
        set_in_tree(params, path + ["scale"], _t2n(state[prefix + torch_prefix + ".weight"]))
        set_in_tree(params, path + ["bias"], _t2n(state[prefix + torch_prefix + ".bias"]))
        used.extend([prefix + torch_prefix + ".weight", prefix + torch_prefix + ".bias"])

    n_blocks = len([b for b in params if b.startswith("block_")])
    for i in range(n_blocks):
        t = f"trans_encoder.{i}."
        blk = f"block_{i}"
        put(t + "bert.img_embedding.weight", [blk, "img_embedding"])
        set_in_tree(params, [blk, "position_embeddings"],
                    _t2n(state[prefix + t + "bert.position_embeddings.weight"]))
        used.append(prefix + t + "bert.position_embeddings.weight")
        n_layers = len([k for k in params[blk] if k.endswith("_attn")])
        for l in range(n_layers):
            hf = t + f"bert.encoder.layer.{l}."
            attn = [blk, f"layer{l}_attn"]
            put(hf + "attention.self.query.weight", attn + ["query"])
            put(hf + "attention.self.key.weight", attn + ["key"])
            put(hf + "attention.self.value.weight", attn + ["value"])
            put(hf + "attention.output.dense.weight", attn + ["out"])
            put_ln(hf + "attention.output.LayerNorm", attn + ["ln"])
            ffn = [blk, f"layer{l}_ffn"]
            put(hf + "intermediate.dense.weight", ffn + ["intermediate"])
            put(hf + "output.dense.weight", ffn + ["output"])
            put_ln(hf + "output.LayerNorm", ffn + ["ln"])
        put(t + "cls_head.weight", [blk, "cls_head"])
        put(t + "residual.weight", [blk, "residual"])

    put("upsampling.weight", ["upsampling"])
    put("cam_param_fc.weight", ["cam_param_fc"])
    put("cam_param_fc2.weight", ["cam_param_fc2"])
    put("cam_param_fc3.weight", ["cam_param_fc3"])
    return used


def convert_cmr_network(state: Dict, params: Dict, arch: str = "resnet18") -> List[str]:
    """Map a reference ``CMR_G`` state dict onto the flax :class:`CMRG`.

    Reference modules (lib/external/cmr/model.py:77-302, net.py:6-196):

    * ``backbone`` — EncodeUV wrapping a reference ResNet's stem +
      residual stages (model.py:25-46); stem/stage naming is the same
      torchvision layout :func:`convert_resnet_backbone` already handles.
    * ``backbone_mesh`` — EncodeMesh: ``reduce.{0,1,2}`` ConvBlocks, the
      second trunk's stages, and the global ``fc`` (model.py:48-74).
    * ``uv_delayer{,2}.{0..3}`` + ``uv_head{,2}`` — the two skip-connected
      UV decoders (model.py:152-186).
    * ``attention`` — latent SelfAttention q/k/v Linears + gamma
      (net.py:163-196).
    * ``de_layers.0`` Linear and ``de_layers.{1..4}`` ParallelDeblocks
      (four SpiralConv Linears each), ``heads.{0..3}`` per-level
      3-channel SpiralConvs (model.py:196-210).

    Build the flax model with ``norm='frozen_bn'`` so BatchNorm running
    statistics land in FrozenBatchNorm parameters. Returns consumed keys.
    """
    used: List[str] = []

    def put(torch_key, path, conv=convert_linear):
        set_in_tree(params, path + ["kernel"], conv(state[torch_key]))
        used.append(torch_key)
        bias_key = torch_key.replace("weight", "bias")
        if bias_key in state:
            set_in_tree(params, path + ["bias"], _t2n(state[bias_key]))
            used.append(bias_key)

    used += convert_resnet_backbone(
        state, {"backbone": params["encode_uv"]}, prefix="backbone.", arch=arch
    )
    # EncodeMesh: stem keys don't exist under backbone_mesh., only stages
    used += convert_resnet_backbone(
        state, {"backbone": params["encode_mesh"]}, prefix="backbone_mesh.", arch=arch
    )
    for i in range(3):
        used += convert_conv_block(
            state, f"backbone_mesh.reduce.{i}", params["encode_mesh"], [f"reduce_{i}"]
        )
    put("backbone_mesh.fc.weight", ["encode_mesh", "fc"])

    for dec, delayer, head in (
        ("uv_decoder", "uv_delayer", "uv_head"),
        ("uv_decoder2", "uv_delayer2", "uv_head2"),
    ):
        for i in range(4):
            used += convert_conv_block(state, f"{delayer}.{i}", params[dec], [f"ConvBlock_{i}"])
        used += convert_conv_block(state, head, params[dec], ["head"])

    if "attention.gamma" in state:
        for lin in ("query_conv", "key_conv", "value_conv"):
            put(f"attention.{lin}.weight", ["attention", lin])
        params["attention"]["gamma"] = _t2n(state["attention.gamma"]).astype(np.float32)
        used.append("attention.gamma")

    put("de_layers.0.weight", ["de_linear"])
    n_levels = len([k for k in params if k.startswith("deblock_")])
    for i in range(1, n_levels + 1):
        for conv in ("conv1", "conv_d3", "conv_2d3", "conv"):
            put(f"de_layers.{i}.{conv}.layer.weight", [f"deblock_{i}", conv, "Dense_0"])
        put(f"heads.{i - 1}.layer.weight", [f"heads_{i - 1}", "Dense_0"])
    return used


def convert_mvp_head(state: Dict, params: Dict, prefix: str = "") -> List[str]:
    """Map a reference ``MVPHead`` state dict onto our flax MVPHead.

    Reference modules (lib/models/heads/mvp_head.py:100-148 +
    lib/models/layers/mvp_decoder.py:97-497):

    * three ``feat_delayer`` ConvBlocks (conv + BatchNorm -> flax
      ConvBlock with FrozenBatchNorm; build the head with
      ``delayer_norm='frozen_bn'`` when converting),
    * ``reference_feats`` / ``reference_points`` linears and the
      ``tgt_pose_embedding`` embedding table,
    * per decoder layer: torch ``nn.MultiheadAttention`` packed in_proj
      split into q/k/v, the ProjAttn linears, four LayerNorms, the FFN
      and MANO linears,
    * head-owned per-layer ``reg_branches`` Sequentials.

    ``input_proj``, ``layer_global_feat`` and ``query_embedding`` are
    dead parameters — defined by the reference __init__ but never called
    in forward (mvp_head.py:117,134-142) — consumed without mapping.
    Returns the consumed torch keys.
    """
    used: List[str] = []

    def put(torch_key, path, conv=convert_linear):
        bias_key = torch_key.replace("weight", "bias")
        set_in_tree(params, path + ["kernel"], conv(state[prefix + torch_key]))
        set_in_tree(params, path + ["bias"], _t2n(state[prefix + bias_key]))
        used.extend([prefix + torch_key, prefix + bias_key])

    def put_ln(torch_prefix, path):
        set_in_tree(params, path + ["scale"], _t2n(state[prefix + torch_prefix + ".weight"]))
        set_in_tree(params, path + ["bias"], _t2n(state[prefix + torch_prefix + ".bias"]))
        used.extend([prefix + torch_prefix + ".weight", prefix + torch_prefix + ".bias"])

    for i in range(3):
        used.extend(convert_conv_block(
            state, f"{prefix}feat_delayer.{i}", params, [f"feat_delayer_{i}"]))

    put("reference_feats.weight", ["reference_feats"])
    put("reference_points.weight", ["reference_points"])
    set_in_tree(params, ["tgt_pose_embedding"],
                _t2n(state[prefix + "tgt_pose_embedding.weight"]))
    used.append(prefix + "tgt_pose_embedding.weight")

    # dead reference params (never used in mvp_head.forward)
    for dead in ("input_proj.weight", "input_proj.bias",
                 "layer_global_feat.weight", "layer_global_feat.bias",
                 "query_embedding.0.weight", "query_embedding.0.bias",
                 "query_embedding.2.weight", "query_embedding.2.bias"):
        if prefix + dead in state:
            used.append(prefix + dead)

    n_layers = len([k for k in params if k.startswith("layer_")])
    for i in range(n_layers):
        t = f"decoder.layers.{i}."
        layer = params[f"layer_{i}"]
        w = _t2n(state[f"{prefix}{t}self_attn.in_proj_weight"])
        b = _t2n(state[f"{prefix}{t}self_attn.in_proj_bias"])
        E = w.shape[1]
        for j, proj in enumerate(["q_proj", "k_proj", "v_proj"]):
            set_in_tree(layer, ["self_attn", proj, "kernel"], w[j * E:(j + 1) * E].T)
            set_in_tree(layer, ["self_attn", proj, "bias"], b[j * E:(j + 1) * E])
        set_in_tree(layer, ["self_attn", "out_proj", "kernel"],
                    convert_linear(state[f"{prefix}{t}self_attn.out_proj.weight"]))
        set_in_tree(layer, ["self_attn", "out_proj", "bias"],
                    _t2n(state[f"{prefix}{t}self_attn.out_proj.bias"]))
        used.extend([f"{prefix}{t}self_attn.{k}" for k in (
            "in_proj_weight", "in_proj_bias", "out_proj.weight", "out_proj.bias")])

        for name in ("sampling_offsets", "attention_weights", "rayconv", "output_proj"):
            set_in_tree(layer, ["proj_attn", name, "kernel"],
                        convert_linear(state[f"{prefix}{t}proj_attn.{name}.weight"]))
            set_in_tree(layer, ["proj_attn", name, "bias"],
                        _t2n(state[f"{prefix}{t}proj_attn.{name}.bias"]))
            used.extend([f"{prefix}{t}proj_attn.{name}.weight",
                         f"{prefix}{t}proj_attn.{name}.bias"])

        for ln in ("norm1", "norm2", "norm3", "norm4"):
            set_in_tree(layer, [ln, "scale"], _t2n(state[f"{prefix}{t}{ln}.weight"]))
            set_in_tree(layer, [ln, "bias"], _t2n(state[f"{prefix}{t}{ln}.bias"]))
            used.extend([f"{prefix}{t}{ln}.weight", f"{prefix}{t}{ln}.bias"])

        for name in ("linear1", "linear2", "linear_mano_1", "linear_mano_2"):
            set_in_tree(layer, [name, "kernel"],
                        convert_linear(state[f"{prefix}{t}{name}.weight"]))
            set_in_tree(layer, [name, "bias"], _t2n(state[f"{prefix}{t}{name}.bias"]))
            used.extend([f"{prefix}{t}{name}.weight", f"{prefix}{t}{name}.bias"])

        put(f"reg_branches.{i}.0.weight", [f"reg_branch_{i}_fc"])
        put(f"reg_branches.{i}.2.weight", [f"reg_branch_{i}_out"])
    return used
