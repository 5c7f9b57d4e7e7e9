"""Point-cloud primitives on TPU (XLA reference implementations).

These replace the pytorch3d C++/CUDA ops on the reference's hot path
(``knn_points``/``sample_farthest_points`` in
lib/models/bricks/point_transformers.py:6,18,83 and ``ball_query`` in
lib/models/heads/ptEmb_head.py:16,413). At POEM's sizes (<=4096 points,
<=799 queries) the distance matrix fits comfortably in VMEM, so KNN is a
single MXU matmul + top-k — there is nothing for a handwritten kernel to
beat for small K; a fused Pallas variant lives in
:mod:`poem_v2_tpu.ops.pallas_knn` for the large-N regime.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared L2: src (..., M, 3), dst (..., N, 3) -> (..., M, N).

    Expressed as a matmul so the contraction runs on the MXU.
    """
    # ||s-d||^2 = ||s||^2 + ||d||^2 - 2 s.d
    s2 = jnp.sum(src**2, axis=-1, keepdims=True)  # (..., M, 1)
    d2 = jnp.sum(dst**2, axis=-1)[..., None, :]  # (..., 1, N)
    cross = jnp.einsum("...mc,...nc->...mn", src, dst, precision="highest")
    return jnp.maximum(s2 + d2 - 2.0 * cross, 0.0)


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of ``points`` (..., N, C) by ``idx`` (..., M[, K]) -> (..., M[, K], C).

    Equivalent of the reference's index_points (lib/utils/points_utils.py:9-24).
    """
    idx_shape = idx.shape
    batch_shape = points.shape[:-2]
    flat_idx = idx.reshape(batch_shape + (-1,))
    out = jnp.take_along_axis(points, flat_idx[..., None], axis=-2)
    return out.reshape(idx_shape + (points.shape[-1],))


def knn_points(
    query: jnp.ndarray, points: jnp.ndarray, k: int, approx: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """K nearest neighbours of each query among ``points``.

    query: (B, Q, 3); points: (B, N, 3).
    Returns (dists (B, Q, K) squared, idx (B, Q, K), nn_xyz (B, Q, K, 3)),
    sorted by ascending distance — same contract as pytorch3d
    ``knn_points(..., return_nn=True)``.

    ``approx=True`` uses the TPU-native ``approx_max_k`` (recall ~0.95);
    the downstream vector attention is permutation-invariant over the
    neighbourhood and tolerates near-neighbour substitutions, so this is
    a cheap large-N speedup knob.
    """
    d2 = square_distance(query, points)  # (B, Q, N)
    if approx:
        neg_d, idx = jax.lax.approx_max_k(-d2, k)
    else:
        neg_d, idx = jax.lax.top_k(-d2, k)
    # tag the (tiny, int32) neighbour indices as remat-saveable: under the
    # decoder's gradient checkpointing the backward would otherwise replay
    # the full (B, Q, N) distance matmul + top-k selection just to rebuild
    # them (the selection itself carries no gradient)
    idx = checkpoint_name(idx, "knn_idx")
    nn_xyz = index_points(points, idx)
    return -neg_d, idx, nn_xyz


def ball_query(
    center: jnp.ndarray,
    points: jnp.ndarray,
    k: int,
    radius: float,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select ``k`` points within ``radius`` of each centre.

    center: (B, M, 3); points: (B, N, 3). Returns (idx (B, M, k),
    xyz (B, M, k, 3)); indices are -1 where fewer than k points fall in
    the ball (pytorch3d semantics, reference ptEmb_head.py:412-420).

    The reference permutes the cloud before ball-querying so the K hits
    are effectively random within the ball (ptEmb_head.py:526-529); pass
    ``rng`` to reproduce that behaviour, omit it for deterministic
    nearest-K-in-ball.
    """
    d2 = square_distance(center, points)  # (B, M, N)
    in_ball = d2 <= radius * radius
    if rng is not None:
        priority = jax.random.uniform(rng, d2.shape)
    else:
        priority = -d2  # nearest first
    score = jnp.where(in_ball, priority, -jnp.inf)
    top, idx = jax.lax.top_k(score, k)
    valid = jnp.isfinite(top)
    idx = jnp.where(valid, idx, -1)
    xyz = index_points(points, jnp.maximum(idx, 0))
    xyz = jnp.where(valid[..., None], xyz, 0.0)
    return idx, xyz


def farthest_point_sampling(
    points: jnp.ndarray, k: int, start_idx: int = 0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Iterative farthest point sampling.

    points: (B, N, 3) -> (xyz (B, k, 3), idx (B, k)).
    Replaces pytorch3d ``sample_farthest_points`` (reference
    point_transformers.py:18); runs as a fori_loop of length k — it is
    only used offline to generate the 32 fixed anchors.
    """
    B, N, _ = points.shape

    def body(i, state):
        min_d2, idx_acc = state
        last = idx_acc[:, i - 1]
        last_xyz = jnp.take_along_axis(points, last[:, None, None], axis=1)  # (B, 1, 3)
        d2 = jnp.sum((points - last_xyz) ** 2, axis=-1)  # (B, N)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2, axis=-1)  # (B,)
        idx_acc = idx_acc.at[:, i].set(nxt)
        return min_d2, idx_acc

    idx0 = jnp.full((B, k), start_idx, dtype=jnp.int32)
    init = (jnp.full((B, N), jnp.inf), idx0)
    _, idx = jax.lax.fori_loop(1, k, body, init)
    xyz = index_points(points, idx)
    return xyz, idx


class VoxelBucketTable:
    """Host-built voxel candidate table for KNN against a STATIC cloud.

    The POEM decoder queries neighbours in a fixed BPS cloud (same
    normalised ball for every sample — ptEmb_head.py:790-809), so most
    of the KNN ranking can be pre-resolved once on host: a uniform voxel
    grid over (a margin around) the cloud where each cell stores the
    ``width`` cloud points nearest to its centre. At runtime a query
    ranks only its cell's candidate list — static shapes, one small
    gather + top_k over width << N.

    Coverage: a query q in a cell with centre c has its true k-NN inside
    the candidate set whenever r_k(q) + ||q - c|| <= R_width(c); with
    width ~6-8x k on the BPS ball this holds for every query within
    ``margin`` of the cloud (verified in tests on the real geometry);
    farther queries degrade gracefully to near-neighbours — the same
    contract as ``approx_max_k`` (recall ~0.95) that the vector
    attention already tolerates.
    """

    def __init__(self, cloud: np.ndarray, cell_size: float = 0.25,
                 width: int = 768, margin: float = 0.6):
        cloud = np.asarray(cloud, dtype=np.float32)
        self.cloud = cloud
        self.cell_size = float(cell_size)
        self.origin = cloud.min(axis=0) - margin
        extent = cloud.max(axis=0) + margin - self.origin
        self.dims = np.maximum(np.ceil(extent / cell_size).astype(np.int64), 1)  # (3,)
        self.width = int(min(width, cloud.shape[0]))

        gx, gy, gz = [
            self.origin[i] + (np.arange(self.dims[i]) + 0.5) * cell_size for i in range(3)
        ]
        centers = np.stack(np.meshgrid(gx, gy, gz, indexing="ij"), axis=-1).reshape(-1, 3)
        d2 = ((centers[:, None] - cloud[None]) ** 2).sum(-1)  # (n_cells, N)
        # candidate order within a cell is irrelevant (ranked at runtime)
        self.table = np.argpartition(d2, self.width - 1, axis=1)[:, : self.width].astype(np.int32)


def knn_points_bucketed(
    query: jnp.ndarray,  # (B, Q, 3)
    table: VoxelBucketTable,
    k: int,
    approx: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """KNN against the static cloud behind ``table``.

    Same contract as :func:`knn_points` but only ranks the query cell's
    candidate list instead of all N points. ``approx=True`` ranks the
    candidates with ``approx_max_k`` (the exact ``top_k`` dominates the
    runtime otherwise).

    MEASURED (v5e, B=8, 799 queries, N=4096, k=32): 10.5-17.7 ms vs
    3.0 ms for brute-force ``knn_points(approx=True)`` — the per-query
    candidate GATHER dominates on TPU, where the all-pairs distance
    matmul is effectively free on the MXU. Keep the brute-force path for
    BPS-sized clouds; this op only pays once N is large enough that
    width << N amortises the gather (≥ ~100k points).
    """
    cloud = jnp.asarray(table.cloud)  # (N, 3)
    dims = table.dims
    cell = jnp.clip(
        jnp.floor((query - jnp.asarray(table.origin)) / table.cell_size).astype(jnp.int32),
        0,
        jnp.asarray(dims - 1, dtype=jnp.int32),
    )  # (B, Q, 3)
    flat = cell[..., 0] * int(dims[1] * dims[2]) + cell[..., 1] * int(dims[2]) + cell[..., 2]
    cands = jnp.asarray(table.table)[flat]  # (B, Q, W)
    cxyz = cloud[cands]  # (B, Q, W, 3)
    d2 = jnp.sum((query[:, :, None] - cxyz) ** 2, axis=-1)
    if approx:
        neg_d, pos = jax.lax.approx_max_k(-d2, k)
    else:
        neg_d, pos = jax.lax.top_k(-d2, k)  # pos indexes into the candidate list
    idx = jnp.take_along_axis(cands, pos, axis=-1)
    nn_xyz = index_points(jnp.broadcast_to(cloud[None], (query.shape[0],) + cloud.shape), idx)
    return -neg_d, idx, nn_xyz


def build_balanced_buckets(points: np.ndarray, bucket_size: int = 128):
    """Balanced k-d bucketing of a STATIC cloud for the bucketed Pallas KNN.

    Recursive median splits (cycling the widest axis) until each leaf has
    exactly ``bucket_size`` points; N must be a multiple of bucket_size.
    Returns (perm, lo, hi): ``perm`` (N,) int32 such that ``points[perm]``
    lays buckets out contiguously, and ``lo``/``hi`` (NB, 3) tight
    axis-aligned bounding boxes per bucket — the distance lower bounds
    behind the kernel's exactness certificate (k-d leaves are wedge
    shaped, so boxes are far tighter than bounding spheres).
    """
    pts = np.asarray(points, dtype=np.float32)
    n = pts.shape[0]
    assert n % bucket_size == 0, (n, bucket_size)

    def split(idx):
        if len(idx) == bucket_size:
            return [idx]
        sub = pts[idx]
        axis = int(np.argmax(sub.max(0) - sub.min(0)))
        order = idx[np.argsort(sub[:, axis], kind="stable")]
        half = len(order) // 2
        # keep both halves bucket_size-aligned (len is a power-of-two
        # multiple of bucket_size at every level when n is)
        half -= half % bucket_size
        half = max(bucket_size, min(half, len(order) - bucket_size))
        return split(order[:half]) + split(order[half:])

    leaves = split(np.arange(n))
    perm = np.concatenate(leaves).astype(np.int32)
    lo = np.stack([pts[l].min(0) for l in leaves]).astype(np.float32)
    hi = np.stack([pts[l].max(0) for l in leaves]).astype(np.float32)
    return perm, lo, hi
