"""Neck micro-bench: where do the 7.2 ms go?

Times the feat/uv necks at bench shapes (BN=64, resnet34 pyramid) and
isolates upsample vs conv vs norm cost.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=30, name=""):
    from poem_v2_tpu.utils.benchmarking import time_fn

    dt = time_fn(fn, *args, iters=iters)
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bn", type=int, default=64)
    p.add_argument("--norm", type=str, default="frozen_bn")
    args = p.parse_args()
    BN = args.bn
    dt16 = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    from poem_v2_tpu.models.neck import ResNetFeatNeck, UVDecodeNeck, upsample2x

    feat_size = (512, 256, 128, 64)
    feats = [
        jax.random.normal(rng, (BN, 64, 64, 64), dtype=dt16),
        jax.random.normal(rng, (BN, 32, 32, 128), dtype=dt16),
        jax.random.normal(rng, (BN, 16, 16, 256), dtype=dt16),
        jax.random.normal(rng, (BN, 8, 8, 512), dtype=dt16),
    ]

    fn_neck = ResNetFeatNeck(feat_size=feat_size, norm=args.norm, dtype=dt16)
    uv_neck = UVDecodeNeck(feat_size=feat_size, norm=args.norm, dtype=dt16)
    fv = fn_neck.init(rng, feats)
    uv = uv_neck.init(rng, feats)

    timeit(jax.jit(lambda v, f: fn_neck.apply(v, f)), fv, feats, name="feat neck")
    timeit(jax.jit(lambda v, f: uv_neck.apply(v, f)), uv, feats, name="uv neck")
    timeit(
        jax.jit(lambda v1, v2, f: (fn_neck.apply(v1, f), uv_neck.apply(v2, f)[0])),
        fv, uv, feats, name="both necks (one jit, XLA CSE)",
    )

    # isolate the upsample chain
    def ups_only(f):
        x = f[3]
        outs = []
        for i in range(3):
            x = upsample2x(x)
            outs.append(jnp.sum(x))
            x = jnp.concatenate([x, f[2 - i]], axis=-1)[..., : x.shape[-1]]
        return sum(outs)

    timeit(jax.jit(ups_only), feats, name="3x upsample2x chain only")

    # single big conv for scale: 64^2 x 192->64
    import flax.linen as nn

    conv = nn.Conv(64, (3, 3), dtype=dt16)
    x = jax.random.normal(rng, (BN, 64, 64, 192), dtype=dt16)
    cv = conv.init(rng, x)
    timeit(jax.jit(lambda v, x: conv.apply(v, x)), cv, x, name="conv 64^2 192->64 (stage3-size)")


if __name__ == "__main__":
    main()
