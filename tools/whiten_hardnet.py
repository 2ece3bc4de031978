#!/usr/bin/env python
"""Compute embedding whitening for a HardNet checkpoint from cached
training patches and emit whitened checkpoint variants.

Usage: python tools/whiten_hardnet.py <ckpt.npz> <pairs_cache.npz>
       [--alphas 0.25,0.5,0.75] [--n 40000]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("cache")
    ap.add_argument("--alphas", default="0.25,0.5,0.75,1.0")
    ap.add_argument("--n", type=int, default=40000)
    args = ap.parse_args()

    from mods_tpu.desc import train as T

    params = T.load_hardnet_npz(args.ckpt)
    z = np.load(args.cache)
    a = z["a"]
    sel = np.random.default_rng(0).choice(len(a), min(args.n, len(a)),
                                          replace=False)
    patches = a[sel]
    for alpha in [float(x) for x in args.alphas.split(",")]:
        mu, W = T.compute_whitening(params, patches, alpha=alpha)
        out = args.ckpt.replace(".npz", f".wh{alpha:g}.npz")
        T.save_hardnet_npz(params, out, whiten=(mu, W))
        print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
