"""Core data structures — fixed-shape SoA pytrees.

TPU-native redesign of the reference's vector-of-structs
(reference: detectors/structures.hpp:185-229 `AffineKeypoint`/`AffineRegion`).
Instead of `std::vector<AffineRegion>` with per-feature dynamic state, every
feature set is a padded structure-of-arrays with a validity mask so the whole
pipeline stays jittable with static shapes.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls):
    cls = dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return [getattr(obj, n) for n in fields], None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree_dataclass
class Keypoints:
    """A padded batch of affine-covariant keypoints in one coordinate frame.

    Equivalent of reference AffineKeypoint {x,y,a11..a22,s,response,sub_type}
    (structures.hpp:185-194) as SoA.

    xy:   [N,2] float32 (x, y) in pixels
    A:    [N,2,2] float32 affine shape (unit determinant at detection time)
    s:    [N] float32 scale (sigma) in pixels
    response: [N] float32 detector response
    valid: [N] bool padding mask
    """
    xy: jnp.ndarray
    A: jnp.ndarray
    s: jnp.ndarray
    response: jnp.ndarray
    valid: jnp.ndarray

    @property
    def n(self) -> int:
        return self.xy.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def empty(n: int) -> "Keypoints":
        return Keypoints(
            xy=jnp.zeros((n, 2), jnp.float32),
            A=jnp.tile(jnp.eye(2, dtype=jnp.float32)[None], (n, 1, 1)),
            s=jnp.ones((n,), jnp.float32),
            response=jnp.zeros((n,), jnp.float32),
            valid=jnp.zeros((n,), bool),
        )

    def take(self, idx: jnp.ndarray, extra_valid=None) -> "Keypoints":
        v = self.valid[idx]
        if extra_valid is not None:
            v = v & extra_valid
        return Keypoints(self.xy[idx], self.A[idx], self.s[idx],
                         self.response[idx], v)

    def sanitize(self) -> "Keypoints":
        """Replace padding rows with benign values (xy=0, A=I, s=1).

        Padding rows can carry diverged Baumberg outputs (|s| up to
        1e17); every consumer masks by `valid`, but the patch engine's
        DMA window origins are computed from xy/A/s BEFORE masking —
        garbage there scatters the HBM->VMEM copies and measurably slows
        the kernels (155 ms -> 67 ms on the graf descriptor pass)."""
        v = self.valid
        eye = jnp.broadcast_to(jnp.eye(2, dtype=self.A.dtype), self.A.shape)
        return Keypoints(
            xy=jnp.where(v[:, None], self.xy, 0.0),
            A=jnp.where(v[:, None, None], self.A, eye),
            s=jnp.where(v, self.s, 1.0),
            response=jnp.where(v, self.response, 0.0),
            valid=v)


@_pytree_dataclass
class Features:
    """Keypoints in both frames + descriptors.

    Equivalent of reference AffineRegion (structures.hpp:218-229): `det`
    is the keypoint in the synthesized-view frame, `reproj` reprojected to
    the original image (synth-detection.cpp:151-190).
    desc: [N,D] float32 (or zeros when not yet described).
    """
    det: Keypoints
    reproj: Keypoints
    desc: jnp.ndarray

    @property
    def n(self) -> int:
        return self.det.n

    @property
    def valid(self) -> jnp.ndarray:
        return self.det.valid

    def count(self) -> jnp.ndarray:
        return self.det.count()

    @staticmethod
    def empty(n: int, d: int = 128) -> "Features":
        return Features(Keypoints.empty(n), Keypoints.empty(n),
                        jnp.zeros((n, d), jnp.float32))


@_pytree_dataclass
class Tentatives:
    """Tentative correspondences (reference: matching.hpp:39-51
    TentativeCorrespExt) as parallel arrays of indices into two Features
    plus the matched geometry snapshot needed downstream.

    All arrays are padded to a fixed capacity with `valid`.
    """
    # geometry of matched pair (reprojected frame), snapshot for RANSAC/LAF
    xy1: jnp.ndarray      # [M,2]
    xy2: jnp.ndarray      # [M,2]
    A1: jnp.ndarray       # [M,2,2]
    A2: jnp.ndarray       # [M,2,2]
    s1: jnp.ndarray       # [M]
    s2: jnp.ndarray       # [M]
    d1: jnp.ndarray       # [M]  best descriptor distance
    d2: jnp.ndarray       # [M]  FGINN distance
    ratio: jnp.ndarray    # [M]  sqrt(d1/d2)
    valid: jnp.ndarray    # [M] bool

    @property
    def m(self) -> int:
        return self.xy1.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def empty(m: int) -> "Tentatives":
        z2 = jnp.zeros((m, 2), jnp.float32)
        z22 = jnp.tile(jnp.eye(2, dtype=jnp.float32)[None], (m, 1, 1))
        z = jnp.zeros((m,), jnp.float32)
        return Tentatives(z2, z2, z22, z22, z, z, z, z, z,
                          jnp.zeros((m,), bool))


@_pytree_dataclass
class MatchResult:
    """Output of geometric verification."""
    tentatives: Tentatives       # with valid mask reduced to inliers
    H: jnp.ndarray               # [3,3] estimated model (H, or F when useF)
    n_inliers: jnp.ndarray       # scalar int32
    score: jnp.ndarray           # scalar float32 MSAC score


def concat_keypoints(kps, total: Optional[int] = None) -> Keypoints:
    """Concatenate padded keypoint sets (valid-first not required)."""
    fields = {}
    for name in ("xy", "A", "s", "response", "valid"):
        fields[name] = jnp.concatenate([getattr(k, name) for k in kps], axis=0)
    out = Keypoints(**fields)
    if total is not None:
        out = pad_keypoints(out, total)
    return out


def pad_keypoints(k: Keypoints, n: int) -> Keypoints:
    cur = k.n
    if cur == n:
        return k
    if cur > n:
        raise ValueError(f"cannot shrink {cur} -> {n}")
    pad = n - cur
    return Keypoints(
        xy=jnp.pad(k.xy, ((0, pad), (0, 0))),
        A=jnp.pad(k.A, ((0, pad), (0, 0), (0, 0))),
        s=jnp.pad(k.s, (0, pad), constant_values=1.0),
        response=jnp.pad(k.response, (0, pad)),
        valid=jnp.pad(k.valid, (0, pad)),
    )


def compact_keypoints(k: Keypoints, n: Optional[int] = None) -> Keypoints:
    """Move valid entries to the front (stable); optionally resize to n."""
    order = jnp.argsort(~k.valid, stable=True)
    out = k.take(order)
    if n is not None and n != out.n:
        if n < out.n:
            out = Keypoints(out.xy[:n], out.A[:n], out.s[:n],
                            out.response[:n], out.valid[:n])
        else:
            out = pad_keypoints(out, n)
    return out


def features_to_numpy(f: Features) -> Dict[str, np.ndarray]:
    """Dense (unpadded) numpy view for IO / host-side code."""
    v = np.asarray(f.valid)
    return dict(
        xy=np.asarray(f.reproj.xy)[v],
        A=np.asarray(f.reproj.A)[v],
        s=np.asarray(f.reproj.s)[v],
        response=np.asarray(f.reproj.response)[v],
        det_xy=np.asarray(f.det.xy)[v],
        det_A=np.asarray(f.det.A)[v],
        det_s=np.asarray(f.det.s)[v],
        desc=np.asarray(f.desc)[v],
    )
