#!/usr/bin/env python
"""Benchmark: two-view matching throughput (pairs/s) on the graf golden pair.

Prints one JSON line:
  {"metric": "pairs_per_s", "value": N, "unit": "pairs/s", "vs_baseline": R}

Baseline: the reference's classic golden run is 1.25 s per pair on a
4-thread CPU (BASELINE.md) => 0.8 pairs/s.  vs_baseline = value / 0.8.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PAIRS_PER_S = 1.0 / 1.25


def main():
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np
    import cv2

    from mods_tpu.config import load_config
    from mods_tpu.models.flagship import match_pair_fn

    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    cfg.max_octave_cands = 4096
    fn = match_pair_fn(cfg, max_kp=4096)

    img1 = cv2.imread("/root/reference/build/imgs/graf1.png").astype(np.float32).mean(axis=2)
    img2 = cv2.imread("/root/reference/build/imgs/graf6.png").astype(np.float32).mean(axis=2)
    i1 = jnp.asarray(img1)
    i2 = jnp.asarray(img2)
    key = jax.random.PRNGKey(0)

    # warm-up / compile
    out = jax.block_until_ready(fn(i1, i2, key))
    n_inl = int(out[1])

    reps = 5
    t0 = time.time()
    for r in range(reps):
        out = fn(i1, i2, jax.random.PRNGKey(r))
        n_inl = int(out[1])   # force device sync (block_until_ready is
        #                       unreliable through the axon relay)
    dt = (time.time() - t0) / reps
    pairs_per_s = 1.0 / dt

    print(json.dumps({
        "metric": "pairs_per_s",
        "value": round(pairs_per_s, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 2),
        "inliers": n_inl,
        "pair_time_s": round(dt, 4),
    }))


if __name__ == "__main__":
    main()
