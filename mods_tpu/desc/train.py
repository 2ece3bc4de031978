"""Descriptor-CNN training: triplet-margin HardNet training step.

The reference consumes pre-trained .pth checkpoints; this module adds
the training capability natively (hardest-in-batch triplet loss of the
HardNet paper) so descriptors can be (re)trained on TPU — and provides
the full sharded training step exercised by __graft_entry__.
dryrun_multichip: dp over the patch batch on the 'data' mesh axis, with
gradient psum (the classic DP allreduce over ICI).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .cnn import _HARDNET_SPEC, _input_norm, _run_sequential


def init_hardnet_params(key) -> Dict:
    """Trainable HardNet params (conv weights + BN running stats)."""
    chans = [(1, 32, 3), (32, 32, 3), (32, 64, 3), (64, 64, 3),
             (64, 128, 3), (128, 128, 3), (128, 128, 8)]
    idxs = [0, 3, 6, 9, 12, 15, 19]
    params = {}
    keys = jax.random.split(key, len(chans))
    for (ci, co, k), idx, kk in zip(chans, idxs, keys):
        fan = ci * k * k
        params[f"w{idx}"] = (jax.random.normal(kk, (co, ci, k, k))
                             / jnp.sqrt(fan)).astype(jnp.float32)
        params[f"bn{idx + 1}_mean"] = jnp.zeros((co,), jnp.float32)
        params[f"bn{idx + 1}_var"] = jnp.ones((co,), jnp.float32)
    return params


def _params_to_layers(params: Dict) -> Dict[int, Dict]:
    layers: Dict[int, Dict] = {}
    for k, v in params.items():
        if k.startswith("w"):
            layers.setdefault(int(k[1:]), {})["weight"] = v
        elif k.startswith("bn"):
            idx, kind = k[2:].split("_")
            key = "running_mean" if kind == "mean" else "running_var"
            layers.setdefault(int(idx), {})[key] = v
    return layers


def hardnet_embed(params: Dict, patches: jnp.ndarray) -> jnp.ndarray:
    """[N,32,32] -> L2-normalized [N,128] (no quantization: training)."""
    x = patches[:, None, :, :]
    x = _input_norm(x)
    x = _run_sequential(x, _params_to_layers(params), _HARDNET_SPEC)
    x = x.reshape(x.shape[0], -1)
    return x / jnp.sqrt(jnp.sum(x * x, 1, keepdims=True) + 1e-10)


def hardnet_embed_train(params: Dict, patches: jnp.ndarray,
                        momentum: float = 0.1
                        ) -> Tuple[jnp.ndarray, Dict]:
    """Training-mode forward: BatchNorm uses BATCH statistics and returns
    updated running stats (torch BatchNorm2d semantics, momentum 0.1,
    affine=False as in the reference nets, desc_server.py:57-92)."""
    from .cnn import _conv
    x = patches[:, None, :, :]
    x = _input_norm(x)
    new_stats: Dict[str, jnp.ndarray] = {}
    for idx, kind, stride, pad, relu in _HARDNET_SPEC:
        if kind == "conv":
            x = _conv(x, params[f"w{idx}"], None, stride, pad)
        elif kind == "bn":
            mean = jnp.mean(x, axis=(0, 2, 3))
            var = jnp.var(x, axis=(0, 2, 3))
            n = x.shape[0] * x.shape[2] * x.shape[3]
            var_unb = var * n / max(n - 1, 1)
            new_stats[f"bn{idx}_mean"] = ((1 - momentum) *
                                          params[f"bn{idx}_mean"]
                                          + momentum * mean)
            new_stats[f"bn{idx}_var"] = ((1 - momentum) *
                                         params[f"bn{idx}_var"]
                                         + momentum * var_unb)
            x = ((x - mean[None, :, None, None])
                 * jax.lax.rsqrt(var[None, :, None, None] + 1e-5))
        if relu:
            x = jnp.maximum(x, 0.0)
    x = x.reshape(x.shape[0], -1)
    emb = x / jnp.sqrt(jnp.sum(x * x, 1, keepdims=True) + 1e-10)
    return emb, new_stats


def triplet_margin_loss(anchor: jnp.ndarray, positive: jnp.ndarray,
                        margin: float = 1.0,
                        ids: jnp.ndarray = None) -> jnp.ndarray:
    """HardNet hardest-in-batch loss (Mishchuk et al. 2017, public):
    per anchor, the hardest negative is the closest non-matching
    descriptor in the batch (row- and column-wise).

    ids: optional [n] source-keypoint ids.  Batches are drawn with
    replacement from per-keypoint jitter draws, so the same physical
    point can appear twice; its other copies are TRUE matches and must
    not be mined as negatives (without this mask the loss floor is the
    anchor-to-duplicate distance and training stalls near the margin)."""
    d = jnp.sqrt(jnp.maximum(
        jnp.sum(anchor ** 2, 1)[:, None] + jnp.sum(positive ** 2, 1)[None, :]
        - 2.0 * jnp.dot(anchor, positive.T,
                        preferred_element_type=jnp.float32), 1e-8))
    pos = jnp.diag(d)
    n = d.shape[0]
    if ids is not None:
        same = ids[:, None] == ids[None, :]
    else:
        same = jnp.eye(n, dtype=bool)
    off = d + same * 1e6
    hardest_neg = jnp.minimum(jnp.min(off, axis=0), jnp.min(off, axis=1))
    return jnp.mean(jnp.maximum(margin + pos - hardest_neg, 0.0))


def make_train_step(optimizer: optax.GradientTransformation,
                    train_bn: bool = False):
    """train_bn=True runs BatchNorm in training mode (batch statistics)
    and folds the running-stat updates back into params (stats are not
    differentiated through — they ride along like torch buffers)."""
    def loss_fn(params, anchors, positives, ids):
        if train_bn:
            both = jnp.concatenate([anchors, positives], 0)
            emb, new_stats = hardnet_embed_train(params, both)
            ea, ep = jnp.split(emb, 2, axis=0)
            return triplet_margin_loss(ea, ep, ids=ids), new_stats
        ea = hardnet_embed(params, anchors)
        ep = hardnet_embed(params, positives)
        return triplet_margin_loss(ea, ep, ids=ids), {}

    def train_step(params, opt_state, anchors, positives, ids=None):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, anchors, positives, ids)
        # never descend on the BN buffers
        grads = {k: (jnp.zeros_like(v) if k.startswith("bn") else v)
                 for k, v in grads.items()}
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = {**params, **{k: jax.lax.stop_gradient(v)
                               for k, v in new_stats.items()}}
        return params, opt_state, loss

    return train_step


def save_hardnet_npz(params: Dict, path: str, whiten=None) -> None:
    """Save trained params in the `features.N.*` state-dict layout that
    cnn._layers_from_state / _get_params load.  `whiten`: optional
    (mean [128], W [128,128]) embedding whitening."""
    out = {}
    for k, v in params.items():
        v = np.asarray(v, np.float32)
        if k.startswith("w"):
            out[f"features.{int(k[1:])}.weight"] = v
        else:
            idx, kind = k[2:].split("_")
            name = "running_mean" if kind == "mean" else "running_var"
            out[f"features.{idx}.{name}"] = v
    if whiten is not None:
        out["whiten.mean"] = np.asarray(whiten[0], np.float32)
        out["whiten.W"] = np.asarray(whiten[1], np.float32)
    np.savez(path, **out)


def load_hardnet_npz(path: str) -> Dict:
    """Inverse of save_hardnet_npz (whitening keys ignored — training
    params only)."""
    sd = dict(np.load(path))
    params: Dict = {}
    for k, v in sd.items():
        if k.startswith("whiten."):
            continue
        idx = int(k.split(".")[1])
        if k.endswith(".weight"):
            params[f"w{idx}"] = jnp.asarray(v)
        elif k.endswith(".running_mean"):
            params[f"bn{idx}_mean"] = jnp.asarray(v)
        elif k.endswith(".running_var"):
            params[f"bn{idx}_var"] = jnp.asarray(v)
    return params


def compute_whitening(params: Dict, patches: np.ndarray, alpha: float = 0.5,
                      eps: float = 1e-6, batch: int = 4096):
    """PCA whitening of the (L2-normalized) embedding on training
    patches: W = U diag((lambda+eps)^-alpha) U^T, mean-centered.
    alpha=0.5 is full whitening; smaller values shrink gently."""
    embs = []
    for i in range(0, len(patches), batch):
        embs.append(np.asarray(hardnet_embed(
            params, jnp.asarray(patches[i:i + batch]))))
    X = np.concatenate(embs)
    mu = X.mean(0)
    C = np.cov((X - mu).T)
    lam, U = np.linalg.eigh(C)
    W = (U * np.power(np.maximum(lam, 0) + eps, -alpha)) @ U.T
    return mu.astype(np.float32), W.astype(np.float32)


def make_sharded_train_step(mesh: Mesh, optimizer: optax.GradientTransformation):
    """DP training step: batch sharded over 'data', params replicated.
    jit with shardings inserts the gradient all-reduce over ICI."""
    step = make_train_step(optimizer)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data", None, None))
    ids_sh = NamedSharding(mesh, P("data"))
    # ids ride the same data axis — without them the duplicate-negative
    # mask silently degrades to diagonal-only (round-3 advisor)
    return jax.jit(step,
                   in_shardings=(repl, repl, batch_sh, batch_sh, ids_sh),
                   out_shardings=(repl, repl, repl))
