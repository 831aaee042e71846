"""Batched neighborhood descriptors: barycenter, covariance, normal, a2D, ...

TPU-native, masked, fixed-k counterpart of the reference's per-neighborhood
SVD (reference include/SlamCore/experimental/neighborhood.h:226-316):
  * covariance is accumulated *relative to the query point* so float32 keeps
    full precision even for world coordinates far from the origin,
  * the eigen-decomposition is the closed-form of ops/eigen3.py,
  * descriptor formulas match ComputeNeighborhoodInfo (neighborhood.h:285-316):
      linearity = (s0 - s1)/s0
      planarity = (s1 - s2)/s0
      a2D       = (sqrt(s1) - sqrt(s2))/sqrt(s0)
    with s0 >= s1 >= s2 the absolute eigenvalues of the covariance.
"""

from typing import NamedTuple

import jax.numpy as jnp

from ct_icp_tpu.ops.eigen3 import eigh3x3

# Classification of a neighborhood (reference neighborhood.h:268-282)
CLASS_NONE = 0
CLASS_PLANAR = 1
CLASS_LINEAR = 2
CLASS_VOLUMIC = 3


class NeighborhoodDescription(NamedTuple):
    barycenter: jnp.ndarray   # [..., 3]
    covariance: jnp.ndarray   # [..., 3, 3]
    normal: jnp.ndarray       # [..., 3] smallest-eigenvalue direction
    line: jnp.ndarray         # [..., 3] largest-eigenvalue direction
    linearity: jnp.ndarray    # [...]
    planarity: jnp.ndarray    # [...]
    a2D: jnp.ndarray          # [...]
    eigvals: jnp.ndarray      # [..., 3] descending


def compute_description(neighbors, neighbor_mask, query):
    """Masked batched descriptor.

    Args:
      neighbors: [..., K, 3] neighbor positions (garbage where masked).
      neighbor_mask: [..., K] bool.
      query: [..., 3] the query point — used only as the local origin for a
        numerically stable covariance; the descriptor itself is origin-free.

    Returns:
      NeighborhoodDescription with leading shape [...].
    """
    w = neighbor_mask.astype(neighbors.dtype)
    count = jnp.sum(w, axis=-1)
    count_safe = jnp.maximum(count, 1.0)
    rel = (neighbors - query[..., None, :]) * w[..., None]
    mean_rel = jnp.sum(rel, axis=-2) / count_safe[..., None]
    # second moments as six elementwise products + reductions: the batched
    # [.., K, 3]x[.., K, 3] -> [.., 3, 3] einsum is a degenerate matmul shape
    # (3x3 output, huge batch) that the MXU handles poorly — the VPU form is
    # one fused pass over the candidate buffer
    x, y, z = rel[..., 0], rel[..., 1], rel[..., 2]
    sxx = jnp.sum(x * x, axis=-1)
    sxy = jnp.sum(x * y, axis=-1)
    sxz = jnp.sum(x * z, axis=-1)
    syy = jnp.sum(y * y, axis=-1)
    syz = jnp.sum(y * z, axis=-1)
    szz = jnp.sum(z * z, axis=-1)
    sec = jnp.stack([
        jnp.stack([sxx, sxy, sxz], axis=-1),
        jnp.stack([sxy, syy, syz], axis=-1),
        jnp.stack([sxz, syz, szz], axis=-1),
    ], axis=-2) / count_safe[..., None, None]
    cov = sec - mean_rel[..., :, None] * mean_rel[..., None, :]
    barycenter = mean_rel + query

    vals, vecs = eigh3x3(cov)
    s = jnp.abs(vals)
    s0 = jnp.maximum(s[..., 0], 1e-20)
    linearity = (s[..., 0] - s[..., 1]) / s0
    planarity = (s[..., 1] - s[..., 2]) / s0
    a2d = (jnp.sqrt(s[..., 1]) - jnp.sqrt(s[..., 2])) / jnp.sqrt(s0)

    return NeighborhoodDescription(
        barycenter=barycenter,
        covariance=cov,
        normal=vecs[..., 2, :],
        line=vecs[..., 0, :],
        linearity=linearity,
        planarity=planarity,
        a2D=a2d,
        eigvals=vals,
    )


def description_from_moments(count, sum_rel, sum_outer, query):
    """Descriptor from accumulated moments (for sharded maps: each shard
    contributes partial sums over its candidates, psum combines, then this
    finishes the descriptor).

    Args:
      count: [...] number of points.
      sum_rel: [..., 3] sum of (p - query).
      sum_outer: [..., 3, 3] sum of (p - query)(p - query)^T.
      query: [..., 3].
    """
    count_safe = jnp.maximum(count.astype(sum_rel.dtype), 1.0)
    mean_rel = sum_rel / count_safe[..., None]
    sec = sum_outer / count_safe[..., None, None]
    cov = sec - mean_rel[..., :, None] * mean_rel[..., None, :]
    barycenter = mean_rel + query

    vals, vecs = eigh3x3(cov)
    s = jnp.abs(vals)
    s0 = jnp.maximum(s[..., 0], 1e-20)
    linearity = (s[..., 0] - s[..., 1]) / s0
    planarity = (s[..., 1] - s[..., 2]) / s0
    a2d = (jnp.sqrt(s[..., 1]) - jnp.sqrt(s[..., 2])) / jnp.sqrt(s0)
    return NeighborhoodDescription(
        barycenter=barycenter, covariance=cov, normal=vecs[..., 2, :],
        line=vecs[..., 0, :], linearity=linearity, planarity=planarity,
        a2D=a2d, eigvals=vals)


def classify(desc, linearity_threshold, planarity_threshold, count):
    """PLANAR / LINEAR / VOLUMIC / NONE (reference neighborhood.h:268-282).

    The reference checks planarity first, then linearity, then falls through to
    VOLUMIC when enough points exist.
    """
    cls = jnp.where(count > 5, CLASS_VOLUMIC, CLASS_NONE)
    cls = jnp.where(desc.linearity > linearity_threshold, CLASS_LINEAR, cls)
    cls = jnp.where(desc.planarity > planarity_threshold, CLASS_PLANAR, cls)
    return cls
