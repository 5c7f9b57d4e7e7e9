"""Convert HRNet ImageNet-pretrained torch weights to a flax checkpoint.

Equivalent of the reference's prepare/download_hrnet.sh + its implicit
torch loading (the reference loads hrnetv2_w{40,64}_imagenet_pretrained
.pth straight into its torch HRNet): download the .pth yourself (same
URLs as the reference script), then

    python scripts/prepare_hrnet.py \
        --torch-ckpt checkpoints/hrnetv2_w40_imagenet_pretrained.pth \
        --width 40 --out checkpoints/hrnet_w40_flax

and point the train config at it:

    MODEL:
      PRETRAINED_BACKBONE: checkpoints/hrnet_w40_flax
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--torch-ckpt", type=str, required=True)
    p.add_argument("--width", type=int, default=40)
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import torch

    from poem_v2_tpu.models.backbones.hrnet import HRNet
    from poem_v2_tpu.utils.torch_convert import convert_hrnet_backbone

    state = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    state = {k.removeprefix("module."): v for k, v in state.items()}

    model = HRNet(width=args.width, norm="frozen_bn")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])

    used = convert_hrnet_backbone(state, {"backbone": params}, prefix="")
    leftover = [k for k in state if k not in used]
    print(f"converted {len(used)} tensors; {len(leftover)} leftover "
          f"(classification head etc.): {leftover[:5]}...")

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out), {"backbone": params}, force=True)
    ckptr.wait_until_finished()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
