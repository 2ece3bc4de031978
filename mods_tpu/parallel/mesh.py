"""Multi-chip scale-out: device mesh, sharded batch matching, sharded kNN.

The reference's only parallelism is OpenMP threads + one GPU daemon
(SURVEY.md §2.11).  Here the scaling axes are expressed as a
jax.sharding.Mesh:
  - 'data'  : image pairs (batch matching / feature extraction services)
  - 'model' : descriptor-database blocks (the N x M distance matrix of
              one-to-many matching is sharded column-wise; each shard
              computes a local top-k which is all-gathered and merged —
              the flash-attention-style streaming-topk axis)
Collectives ride ICI via XLA (psum/all_gather inserted by shard_map).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


# --------------------------------------------------------------------------- #
# Sharded exact kNN (one-to-many matching backbone)
# --------------------------------------------------------------------------- #
def sharded_knn(mesh: Mesh, queries: jnp.ndarray, db: jnp.ndarray,
                k: int = 50) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN with the DB row-sharded over the 'model' axis.

    Each shard computes distances to its DB block + local top-k; the
    merged global top-k needs one all_gather of k columns per shard
    (k*n_shards << M), not the full distance matrix.
    Returns (dists [N,k], global indices [N,k]).
    """
    n_model = mesh.shape["model"]
    Mdb = db.shape[0]
    block = Mdb // n_model

    def local(ql, dbl):
        shard = jax.lax.axis_index("model")
        aa = jnp.sum(ql * ql, 1, keepdims=True)
        bb = jnp.sum(dbl * dbl, 1, keepdims=True)
        d = aa + bb.T - 2.0 * jnp.dot(ql, dbl.T,
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.HIGHEST)
        negd, idx = jax.lax.top_k(-d, min(k, dbl.shape[0]))
        gidx = idx + shard * block
        # gather candidates from all shards
        alld = jax.lax.all_gather(-negd, "model", axis=1, tiled=True)
        alli = jax.lax.all_gather(gidx, "model", axis=1, tiled=True)
        negm, pos = jax.lax.top_k(-alld, k)
        return -negm, jnp.take_along_axis(alli, pos, axis=1)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(None, None), P("model", None)),
                       out_specs=(P(None, None), P(None, None)),
                       check_vma=False)
    return fn(queries, db)


# --------------------------------------------------------------------------- #
# Data-parallel batch pair matching
# --------------------------------------------------------------------------- #
def batch_match_sharded(mesh: Mesh, cfg, imgs1: jnp.ndarray,
                        imgs2: jnp.ndarray, keys: jnp.ndarray,
                        max_kp: int = 512):
    """Match a batch of image pairs, sharded over 'data'.

    imgs*: [B, H, W] float32; keys: [B, 2] uint32 PRNG keys.
    Returns (H [B,3,3], inliers [B], tentatives [B]).
    """
    from ..models.flagship import match_pair_fn
    fn = match_pair_fn(cfg, max_kp=max_kp)

    def one(i1, i2, key):
        H, ninl, ntent, n1, n2 = fn(i1, i2, key)
        return H, ninl, ntent

    batched = jax.vmap(one)
    sharded = jax.jit(
        batched,
        in_shardings=(NamedSharding(mesh, P("data", None, None)),
                      NamedSharding(mesh, P("data", None, None)),
                      NamedSharding(mesh, P("data", None))),
        out_shardings=(NamedSharding(mesh, P("data", None, None)),
                       NamedSharding(mesh, P("data")),
                       NamedSharding(mesh, P("data"))))
    return sharded(imgs1, imgs2, keys)
