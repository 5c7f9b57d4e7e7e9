"""Pallas kernels: interpret-mode numerics vs pure-XLA reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from poem_v2_tpu.ops.pallas_vector_attn import (
    fused_vector_attention,
    vector_attention_reference,
)

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier


def test_fused_vector_attention_matches_reference():
    rng = np.random.RandomState(0)
    B, M, K, D = 2, 100, 8, 64  # M not a block multiple on purpose
    q = jnp.asarray(rng.randn(B, M, D).astype(np.float32))
    k_g = jnp.asarray(rng.randn(B, M, K, D).astype(np.float32))
    v_g = jnp.asarray(rng.randn(B, M, K, D).astype(np.float32))
    delta = jnp.asarray(rng.randn(B, M, K, 3).astype(np.float32) * 0.1)

    def mkw(i, o):
        return jnp.asarray(rng.randn(i, o).astype(np.float32) / np.sqrt(i))

    fc_delta = (mkw(3, D), jnp.zeros(D), mkw(D, D), jnp.zeros(D))
    fc_gamma = (mkw(D, D), jnp.zeros(D), mkw(D, D), jnp.zeros(D))

    want = np.asarray(vector_attention_reference(q, k_g, v_g, delta, fc_delta, fc_gamma))
    got = np.asarray(
        fused_vector_attention(
            q, k_g, v_g, delta, fc_delta, fc_gamma, block_q=32, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
