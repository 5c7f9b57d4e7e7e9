"""Convert a released POEM torch checkpoint to an orbax weights file.

    python scripts/convert_checkpoint.py \
        -c configs/release/train_medium.yaml \
        --torch-ckpt checkpoints/medium_model.pth.tar \
        --out checkpoints/medium_flax

Then evaluate with parity settings:

    python -m poem_v2_tpu.cli.eval -c configs/release/train_medium.yaml \
        --reload checkpoints/medium_flax ...

The model is built with NORM=frozen_bn so torch BatchNorm statistics
land in FrozenBatchNorm parameters; unconsumed torch keys are reported,
never silently dropped (utils/torch_convert.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--cfg", type=str, required=True)
    p.add_argument("--torch-ckpt", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import torch

    from poem_v2_tpu.models.poem import create_poem_model
    from poem_v2_tpu.utils.config import Config
    from poem_v2_tpu.utils.torch_convert import convert_poem_checkpoint

    cfg = Config.from_yaml(args.cfg)
    model_cfg = cfg.MODEL if "MODEL" in cfg else cfg
    model_cfg.defrost() if hasattr(model_cfg, "defrost") else None
    model_cfg.BACKBONE.NORM = "frozen_bn"
    model, _aux = create_poem_model(model_cfg)

    size = cfg.DATA_PRESET.IMAGE_SIZE[0] if "DATA_PRESET" in cfg else 256
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "noise": rng, "dropout": rng},
        jnp.zeros((1, 2, size, size, 3)), jnp.ones((1, 2), bool),
        jnp.tile(jnp.eye(3)[None, None] * 100, (1, 2, 1, 1)),
        jnp.tile(jnp.eye(4)[None, None], (1, 2, 1, 1)),
        jnp.zeros((1, 21, 3)), train=False,
    )
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])

    state = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "net"):
        if isinstance(state, dict) and key in state:
            state = state[key]
    state = {k.removeprefix("module."): v for k, v in state.items()}

    arch = model_cfg.BACKBONE.TYPE if model_cfg.BACKBONE.TYPE == "HRNet" \
        else model_cfg.BACKBONE.TYPE.lower()
    new_params, leftover = convert_poem_checkpoint(state, params, arch=arch)
    print(f"converted {len(state) - len(leftover)}/{len(state)} tensors; "
          f"leftover: {leftover[:8]}{'...' if len(leftover) > 8 else ''}")

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out),
               {"params": new_params, "opt_state": None, "step": None, "rng": None},
               force=True)
    ckptr.wait_until_finished()
    print(f"wrote {args.out} (load with --reload / MODEL.PRETRAINED)")


if __name__ == "__main__":
    main()
