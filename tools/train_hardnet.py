#!/usr/bin/env python
"""Train HardNet on TPU from synthesized patch pairs and save the weights.

Usage: python tools/train_hardnet.py [--pairs 120000] [--steps 4000]
       [--batch 1024] [--out weights/HardNetPS.npz] [--cpu]

The reference's HardNet++.pth is stripped from the checkout; this
produces a real (non-random) descriptor trained with the public HardNet
recipe (hardest-in-batch triplet margin loss, Mishchuk et al. 2017) on
pipeline-matched synthetic patch pairs (mods_tpu/desc/data.py).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=120000)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "weights", "HardNetPS.npz"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--data-cache", default="/tmp/hardnet_pairs.npz")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax
    from mods_tpu.desc import data as D
    from mods_tpu.desc import train as T

    if os.path.exists(args.data_cache):
        z = np.load(args.data_cache)
        anchors, positives = z["a"], z["p"]
        kp_ids = z["i"] if "i" in z.files else np.arange(len(anchors))
        print(f"loaded {len(anchors)} cached pairs", flush=True)
    else:
        t0 = time.time()
        anchors, positives, kp_ids = D.generate_pairs(args.pairs,
                                                      n_images=args.images)
        print(f"generated {len(anchors)} pairs in {time.time()-t0:.0f}s",
              flush=True)
        np.savez(args.data_cache, a=anchors, p=positives, i=kp_ids)

    n = len(anchors)
    n_val = min(4096, n // 10)
    val_a = jnp.asarray(anchors[:n_val])
    val_p = jnp.asarray(positives[:n_val])
    val_i = jnp.asarray(kp_ids[:n_val])
    tr_a, tr_p, tr_i = anchors[n_val:], positives[n_val:], kp_ids[n_val:]
    ntr = len(tr_a)

    key = jax.random.PRNGKey(42)
    params = T.init_hardnet_params(key)
    sched = optax.cosine_decay_schedule(args.lr, args.steps)
    optimizer = optax.adam(sched)
    opt_state = optimizer.init(params)
    step = jax.jit(T.make_train_step(optimizer, train_bn=True))

    @jax.jit
    def fpr95(params, a, p, ids):
        """validation: FPR at 95% TPR on distance-matrix retrieval +
        matching accuracy (the retrieved nearest neighbor comes from the
        same source keypoint — duplicates of the true point count)."""
        ea = T.hardnet_embed(params, a)
        ep = T.hardnet_embed(params, p)
        d = jnp.sqrt(jnp.maximum(
            jnp.sum(ea ** 2, 1)[:, None] + jnp.sum(ep ** 2, 1)[None, :]
            - 2.0 * ea @ ep.T, 1e-8))
        pos = jnp.diag(d)
        acc = jnp.mean(ids[jnp.argmin(d, axis=1)] == ids)
        th = jnp.percentile(pos, 95.0)
        m = d.shape[0]
        same = ids[:, None] == ids[None, :]
        neg_mask = ~same
        neg_below = (jnp.sum((d <= th) & neg_mask)
                     / jnp.maximum(jnp.sum(neg_mask), 1))
        return acc, neg_below

    rng = np.random.default_rng(0)
    t0 = time.time()
    for i in range(args.steps):
        sel = rng.integers(0, ntr, args.batch)
        a = jnp.asarray(tr_a[sel])
        p = jnp.asarray(tr_p[sel])
        ii = jnp.asarray(tr_i[sel])
        params, opt_state, loss = step(params, opt_state, a, p, ii)
        if i % 200 == 0 or i == args.steps - 1:
            acc, fpr = fpr95(params, val_a, val_p, val_i)
            print(f"step {i:5d} loss {float(loss):.4f} "
                  f"val_acc {float(acc):.4f} fpr95 {float(fpr):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    T.save_hardnet_npz(params, args.out)
    print(f"saved {args.out}", flush=True)


if __name__ == "__main__":
    main()
