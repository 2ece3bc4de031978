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


def triplet_margin_loss(anchor: jnp.ndarray, positive: jnp.ndarray,
                        margin: float = 1.0) -> jnp.ndarray:
    """HardNet hardest-in-batch loss (Mishchuk et al. 2017, public):
    per anchor, the hardest negative is the closest non-matching
    descriptor in the batch (row- and column-wise)."""
    d = jnp.sqrt(jnp.maximum(
        jnp.sum(anchor ** 2, 1)[:, None] + jnp.sum(positive ** 2, 1)[None, :]
        - 2.0 * jnp.dot(anchor, positive.T,
                        preferred_element_type=jnp.float32), 1e-8))
    pos = jnp.diag(d)
    n = d.shape[0]
    off = d + jnp.eye(n) * 1e6
    hardest_neg = jnp.minimum(jnp.min(off, axis=0), jnp.min(off, axis=1))
    return jnp.mean(jnp.maximum(margin + pos - hardest_neg, 0.0))


def make_train_step(optimizer: optax.GradientTransformation):
    def loss_fn(params, anchors, positives):
        ea = hardnet_embed(params, anchors)
        ep = hardnet_embed(params, positives)
        return triplet_margin_loss(ea, ep)

    def train_step(params, opt_state, anchors, positives):
        loss, grads = jax.value_and_grad(loss_fn)(params, anchors, positives)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_sharded_train_step(mesh: Mesh, optimizer: optax.GradientTransformation):
    """DP training step: batch sharded over 'data', params replicated.
    jit with shardings inserts the gradient all-reduce over ICI."""
    step = make_train_step(optimizer)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data", None, None))
    return jax.jit(step,
                   in_shardings=(repl, repl, batch_sh, batch_sh),
                   out_shardings=(repl, repl, repl))
