"""Torch->JAX converter: mapping fills the flax tree with right shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from poem_v2_tpu.models.decoder import PtEmbedDecoder
from poem_v2_tpu.utils.torch_convert import convert_decoder_block


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
