"""Ellipse-overlap distances and repeatability scoring.

reference: ellipseOverlap / ellipseOverlapPrep (synth-detection.cpp:708-779)
and the ellipseOverlapH variants (matching.hpp:170-253) used by the
benchmark/overlap-matching protocols.  Batched: the full pairwise
ref x test overlap matrix is a handful of einsum ops.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..detect.affine_shape import rectify_up_is_up
from ..types import Keypoints

K_SIGMA = 2.0 * 3.0 * math.sqrt(3.0)   # synth-detection.cpp:21


def _inv2x2(M: jnp.ndarray) -> jnp.ndarray:
    det = M[..., 0, 0] * M[..., 1, 1] - M[..., 0, 1] * M[..., 1, 0]
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    inv = jnp.stack([
        jnp.stack([M[..., 1, 1], -M[..., 0, 1]], -1),
        jnp.stack([-M[..., 1, 0], M[..., 0, 0]], -1)], -2)
    return inv / det[..., None, None]


@jax.jit
def ellipse_overlap_matrix(ref: Keypoints, test: Keypoints,
                           max_error: float = 10000.0) -> jnp.ndarray:
    """Pairwise overlap distance [n_ref, n_test] (ellipseOverlap,
    synth-detection.cpp:743-779): map both centers into the reference
    ellipse's canonical frame, add the Frobenius shape discrepancy of the
    relative affine.  Invalid rows/cols get +inf."""
    A_ref = jax.vmap(rectify_up_is_up)(ref.A)
    Ainv = _inv2x2(A_ref * (K_SIGMA * ref.s)[:, None, None])    # [R,2,2]
    # centers in canonical frame
    c_ref = jnp.einsum("rij,rj->ri", Ainv, ref.xy)              # [R,2]
    c_tst = jnp.einsum("rij,tj->rti", Ainv, test.xy)            # [R,T,2]
    dist = jnp.sum((c_tst - c_ref[:, None, :]) ** 2, -1)        # [R,T]

    B = test.A * (K_SIGMA * test.s)[:, None, None]              # [T,2,2]
    Rel = jnp.einsum("rij,tjk->rtik", Ainv, B)                  # [R,T,2,2]
    Rel = jax.vmap(jax.vmap(rectify_up_is_up))(Rel)
    diff = 0.5 * ((1.0 - Rel[..., 0, 0]) ** 2 + Rel[..., 0, 1] ** 2
                  + Rel[..., 1, 0] ** 2 + (1.0 - Rel[..., 1, 1]) ** 2)
    out = dist + jnp.where(dist > max_error, 0.0, diff)
    bad = (~ref.valid[:, None]) | (~test.valid[None, :])
    return jnp.where(bad, jnp.inf, out)


def reproject_keypoints_h(kp: Keypoints, H) -> Keypoints:
    """Map keypoints through a 3x3 homography (affine part linearized at
    each center) — benchmark-side reprojection (matching.hpp:170-253)."""
    H = jnp.asarray(H, jnp.float32)
    p = jnp.concatenate([kp.xy, jnp.ones_like(kp.xy[:, :1])], -1) @ H.T
    w = jnp.where(jnp.abs(p[:, 2:]) < 1e-12, 1e-12, p[:, 2:])
    xy = p[:, :2] / w
    # local affine (Jacobian) of H at each center:
    # J = (H[:2,:2] - xy_out * H[2,:2]) / w
    J = (H[None, :2, :2] - xy[:, :, None] * H[None, 2:3, :2]) / w[:, None]
    A = jnp.einsum("nij,njk->nik", J, kp.A)
    # re-split full frame into unit-det A and scale s
    det = jnp.abs(A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0])
    d = jnp.sqrt(jnp.maximum(det, 1e-20))
    return Keypoints(xy=xy, A=A / d[:, None, None],
                     s=kp.s * d, response=kp.response, valid=kp.valid)


def repeatability(ref: Keypoints, test: Keypoints, H,
                  overlap_threshold: float = 0.3):
    """Repeatability under ground-truth H: greedy one-to-one assignment
    of reprojected test regions to reference regions by overlap distance;
    returns (n_matched, n_ref_valid, n_test_valid)."""
    import numpy as np
    test_r = reproject_keypoints_h(test, H)
    D = np.asarray(ellipse_overlap_matrix(ref, test_r))
    n_ref = int(jnp.sum(ref.valid))
    n_test = int(jnp.sum(test.valid))
    matched = 0
    used = np.zeros(D.shape[1], bool)
    for i in np.argsort(D.min(axis=1)):
        j = int(np.argmin(np.where(used, np.inf, D[i])))
        if np.isfinite(D[i, j]) and D[i, j] <= overlap_threshold:
            matched += 1
            used[j] = True
    return matched, n_ref, n_test
