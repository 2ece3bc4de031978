#!/usr/bin/env python
"""A/B micro-benchmarks for compaction and localization alternatives."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def sync(out):
    s = 0.0
    for l in jax.tree.leaves(out):
        s += float(jnp.sum(jnp.abs(l.astype(jnp.float32).ravel()[:8])))
    return s


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        sync(out)
    dt = (time.time() - t0) / reps
    print(f"{name:44s} {dt*1000:9.2f} ms", flush=True)
    return out


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    N = 3 * 640 * 800
    K = 4096
    mask_np = rng.uniform(size=N) < 0.0017      # ~2.6k true
    mask = jnp.asarray(mask_np)

    @jax.jit
    def via_nonzero(m):
        (idx,) = jnp.nonzero(m, size=K, fill_value=-1)
        return idx
    timeit("nonzero(size=4096)", via_nonzero, mask)

    @jax.jit
    def via_cumsum_scatter(m):
        pos = jnp.cumsum(m.astype(jnp.int32)) - 1
        tgt = jnp.where(m & (pos < K), pos, K)
        out = jnp.full((K + 1,), -1, jnp.int32)
        out = out.at[tgt].set(jnp.arange(N, dtype=jnp.int32), mode="drop")
        return out[:K]
    timeit("cumsum+scatter", via_cumsum_scatter, mask)

    @jax.jit
    def via_topk_key(m):
        key = jnp.where(m, jnp.arange(N, 0, -1, dtype=jnp.int32), 0)
        vals, idx = jax.lax.top_k(key, K)
        return jnp.where(vals > 0, idx, -1)
    timeit("top_k(key)", via_topk_key, mask)

    @jax.jit
    def via_2stage(m):
        B = 2048                     # block size
        nb = N // B
        m2 = m[: nb * B].reshape(nb, B)
        cnt = jnp.sum(m2, axis=1)
        # blocks are sparse: pick top 256 blocks by count, then compact
        # inside (256*2048 = 524k elements -> nonzero on 1/3 the data)
        nz = jnp.cumsum(cnt)
        return nz
    # (just measures the block count pass)
    timeit("block counts only", via_2stage, mask)

    # ---- localization variants ---- #
    resp = jnp.asarray(rng.uniform(-1, 1, (5, 640, 800)).astype(np.float32))
    r0 = jnp.asarray(rng.integers(8, 630, K).astype(np.int32))
    c0 = jnp.asarray(rng.integers(8, 790, K).astype(np.int32))
    lev = jnp.asarray(rng.integers(1, 4, K).astype(np.int32))

    def crop16(l, y0, x0):
        return jax.lax.dynamic_slice(resp, (l - 1, y0, x0), (3, 16, 16))

    @jax.jit
    def crop_only(lev, r0, c0):
        oy = jnp.clip(r0 - 7, 0, 640 - 16)
        ox = jnp.clip(c0 - 7, 0, 800 - 16)
        return jax.vmap(crop16)(lev, oy, ox)
    wins = timeit("crop [4096,3,16,16]", crop_only, lev, r0, c0)

    @jax.jit
    def cube_ds(wins, rl, cl):
        def one(win, r, c):
            return jax.lax.dynamic_slice(win, (0, r - 1, c - 1), (3, 3, 3))
        return jax.vmap(one)(wins, rl, cl)
    rl = jnp.full(K, 7, jnp.int32)
    timeit("cube dyn-slice x1", cube_ds, wins, rl, rl)

    @jax.jit
    def cube_5x(wins, rl, cl):
        def body(c, _):
            r, cc = c
            cube = cube_ds(wins, r, cc)
            dx = cube[:, 1, 1, 2] - cube[:, 1, 1, 0]
            r = r + (dx > 0).astype(jnp.int32)
            return (r, cc), cube.sum()
        (r, cc), o = jax.lax.scan(body, (rl, cl), None, length=5)
        return o
    timeit("cube dyn-slice x5 (scan)", cube_5x, wins, rl, rl)

    @jax.jit
    def cube_onehot(wins, rl, cl):
        wh = 16
        def one(win, r, c):
            ry = jnp.arange(wh, dtype=jnp.int32)
            oh_r = (ry[None, :] == (r + jnp.arange(-1, 2))[:, None]).astype(jnp.float32)
            oh_c = (ry[None, :] == (c + jnp.arange(-1, 2))[:, None]).astype(jnp.float32)
            t = jnp.einsum("lyx,dy->ldx", win, oh_r)
            return jnp.einsum("ldx,ex->lde", t, oh_c)
        return jax.vmap(one)(wins, rl, cl)
    timeit("cube one-hot x1", cube_onehot, wins, rl, rl)

    # full localize for reference
    from mods_tpu.detect import pyramid as pyr
    from mods_tpu.config import load_config
    from mods_tpu.models import flagship as fs
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    par = cfg.hessian.pyramid
    valid = jnp.ones(K, bool)
    sig = [1.6, 2.0, 2.5, 3.2, 4.0]
    loc = jax.jit(lambda resp, lev, r0, c0, v: pyr.localize(
        resp, resp, lev, r0, c0, v, par, sig))
    timeit("localize full", loc, resp, lev, r0, c0, valid)


if __name__ == "__main__":
    main()
