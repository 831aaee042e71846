"""Batched closed-form eigendecomposition of symmetric 3x3 matrices.

The neighborhood descriptors (normal / line / planarity / a2D, reference
include/SlamCore/experimental/neighborhood.h:285-316) need the spectral
decomposition of tiny covariance matrices for tens of thousands of
neighborhoods per ICP iteration. A general eigensolver is wasteful on TPU;
this module computes eigenvalues with the trigonometric closed form and
eigenvectors by cross-product null-space extraction — pure element-wise VPU
math, fully batched, float32-safe for *centered* covariances (callers must
accumulate covariance relative to a local origin; see ops/neighborhood.py).
"""

import jax.numpy as jnp

_TWO_PI_3 = 2.0943951023931953  # 2*pi/3


def eigh3x3(a):
    """Eigendecomposition of symmetric 3x3 matrices.

    Args:
      a: [..., 3, 3] symmetric.

    Returns:
      (eigvals [..., 3] descending, eigvecs [..., 3, 3] with eigvecs[..., i, :]
      the unit eigenvector of eigvals[..., i]).
    """
    a = 0.5 * (a + jnp.swapaxes(a, -1, -2))
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    eye = jnp.eye(3, dtype=a.dtype)
    b = a - q[..., None, None] * eye
    p2 = jnp.sum(b * b, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    p_safe = jnp.where(p > 1e-20, p, 1.0)
    detb = (
        b[..., 0, 0] * (b[..., 1, 1] * b[..., 2, 2] - b[..., 1, 2] * b[..., 2, 1])
        - b[..., 0, 1] * (b[..., 1, 0] * b[..., 2, 2] - b[..., 1, 2] * b[..., 2, 0])
        + b[..., 0, 2] * (b[..., 1, 0] * b[..., 2, 1] - b[..., 1, 1] * b[..., 2, 0])
    )
    r = jnp.clip(detb / (2.0 * p_safe ** 3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l0 = q + 2.0 * p * jnp.cos(phi)                 # largest
    l2 = q + 2.0 * p * jnp.cos(phi + _TWO_PI_3)     # smallest
    l1 = 3.0 * q - l0 - l2
    vals = jnp.stack([l0, l1, l2], axis=-1)

    isotropic = p <= 1e-12 * jnp.maximum(jnp.abs(q), 1.0)

    v0 = _eigvec(a, l0)
    v2 = _eigvec(a, l2)
    # enforce orthogonality (robust under close eigenvalues)
    v2 = v2 - jnp.sum(v2 * v0, axis=-1, keepdims=True) * v0
    v2 = _normalize(v2)
    v1 = jnp.cross(v2, v0)

    vecs = jnp.stack([v0, v1, v2], axis=-2)
    vecs = jnp.where(isotropic[..., None, None], eye, vecs)
    vals = jnp.where(isotropic[..., None], jnp.broadcast_to(q[..., None], vals.shape), vals)
    return vals, vecs


def _normalize(v):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.where(n > 1e-20, n, 1.0)


def _eigvec(a, lam):
    """Unit null vector of (a - lam I) via the largest row cross product."""
    m = a - lam[..., None, None] * jnp.eye(3, dtype=a.dtype)
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    cands = jnp.stack([c01, c02, c12], axis=-2)
    norms = jnp.sum(cands * cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    pick = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    # fully degenerate row space: any unit vector is an eigenvector
    ok = jnp.sum(pick * pick, axis=-1, keepdims=True) > 1e-30
    fallback = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], dtype=a.dtype), pick.shape)
    return _normalize(jnp.where(ok, pick, fallback))
