"""Optimizer builder tests — grad-clip parity against torch.

The reference clips every parameter tensor to NORM individually
(lib/utils/net_utils.py:123-133: a loop over params calling
``torch.nn.utils.clip_grad_norm_``), NOT by global norm.  These tests
diff our per-leaf transformation against torch's on fixture gradients.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from poem_v2_tpu.training.optim import build_optimizer, clip_by_per_param_norm
from poem_v2_tpu.utils.config import Config


def _fixture_grads(seed=0):
    rs = np.random.RandomState(seed)
    return {
        "dense": {"kernel": rs.normal(0, 3.0, (17, 5)).astype(np.float32),
                  "bias": rs.normal(0, 0.01, (5,)).astype(np.float32)},
        "conv": {"kernel": rs.normal(0, 0.5, (3, 3, 4, 8)).astype(np.float32)},
        "scalar": rs.normal(0, 10.0, ()).astype(np.float32),
    }


def _torch_per_param_clip(grads, max_norm, norm_type):
    torch = pytest.importorskip("torch")
    out = {}
    for name, leaf in grads.items():
        if isinstance(leaf, dict):
            out[name] = _torch_per_param_clip(leaf, max_norm, norm_type)
        else:
            p = torch.nn.Parameter(torch.zeros(leaf.shape))
            p.grad = torch.from_numpy(np.array(leaf))
            torch.nn.utils.clip_grad_norm_(p, max_norm, norm_type)
            out[name] = p.grad.numpy()
    return out


@pytest.mark.parametrize("norm_type", [2.0, 1.0, float("inf")])
@pytest.mark.parametrize("max_norm", [0.5, 1.0, 100.0])
def test_per_param_clip_matches_torch(norm_type, max_norm):
    grads = _fixture_grads()
    tx = clip_by_per_param_norm(max_norm, norm_type)
    jtree = {k: ({kk: jnp.asarray(vv) for kk, vv in v.items()}
                 if isinstance(v, dict) else jnp.asarray(v))
             for k, v in grads.items()}
    clipped, _ = tx.update(jtree, tx.init(None))
    ref = _torch_per_param_clip(grads, max_norm, norm_type)

    def assert_close(a, b):
        for k in a:
            if isinstance(a[k], dict):
                assert_close(a[k], b[k])
            else:
                np.testing.assert_allclose(
                    np.asarray(a[k]), b[k], rtol=1e-6, atol=1e-7)

    assert_close(clipped, ref)


def test_per_param_clip_is_default_and_global_opt_in():
    cfg = Config({
        "OPTIMIZER": "sgd", "LR": 0.1, "MOMENTUM": 0.0, "EPOCH": 1,
        "SCHEDULER": "constant", "GRAD_CLIP_ENABLED": True,
        "GRAD_CLIP": {"TYPE": 2, "NORM": 1.0},
    })
    grads = {"a": jnp.full((4,), 10.0), "b": jnp.full((4,), 0.01)}
    params = {"a": jnp.zeros((4,)), "b": jnp.zeros((4,))}

    tx = build_optimizer(cfg, steps_per_epoch=1)
    upd, _ = tx.update(grads, tx.init(params), params)
    # per-param: "a" clipped to unit norm, "b" untouched; the update is
    # -lr * clipped_grad under SGD
    np.testing.assert_allclose(np.linalg.norm(np.asarray(upd["a"]) / -0.1), 1.0,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(upd["b"]), -0.1 * np.asarray(grads["b"]),
                               rtol=1e-6)

    gcfg = Config({**cfg.to_dict(),
                   "GRAD_CLIP": {"TYPE": 2, "NORM": 1.0, "MODE": "global"}})
    gtx = build_optimizer(gcfg, steps_per_epoch=1)
    gupd, _ = gtx.update(grads, gtx.init(params), params)
    # global: both leaves scaled by the same factor 1/||g||_global
    gnorm = float(np.sqrt(sum(float(np.sum(np.asarray(g) ** 2))
                              for g in grads.values())))
    np.testing.assert_allclose(np.asarray(gupd["a"]),
                               -0.1 * np.asarray(grads["a"]) / gnorm, rtol=1e-5)
