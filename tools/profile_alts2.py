#!/usr/bin/env python
"""Bisect the localize() cost: which sub-expression is slow on TPU."""
import os
import sys
import time

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


def _solve3x3(A, b):
    det = (A[0, 0] * (A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1])
           - A[0, 1] * (A[1, 0] * A[2, 2] - A[1, 2] * A[2, 0])
           + A[0, 2] * (A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0]))

    def rep(col):
        M = A.at[:, col].set(b)
        return (M[0, 0] * (M[1, 1] * M[2, 2] - M[1, 2] * M[2, 1])
                - M[0, 1] * (M[1, 0] * M[2, 2] - M[1, 2] * M[2, 0])
                + M[0, 2] * (M[1, 0] * M[2, 1] - M[1, 1] * M[2, 0]))
    return jnp.stack([rep(0), rep(1), rep(2)]) / det


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    K = 4096
    wins = jnp.asarray(rng.uniform(-1, 1, (K, 3, 16, 16)).astype(np.float32))
    r0 = jnp.full(K, 7, jnp.int32)
    c0 = jnp.full(K, 7, jnp.int32)
    valid = jnp.ones(K, bool)

    def cube_of(win, rl, cl):
        return jax.lax.dynamic_slice(win, (0, rl - 1, cl - 1), (3, 3, 3))

    def derivs(cube):
        low, cur, high = cube[0], cube[1], cube[2]
        dxx = cur[1, 0] - 2.0 * cur[1, 1] + cur[1, 2]
        dyy = cur[0, 1] - 2.0 * cur[1, 1] + cur[2, 1]
        dss = low[1, 1] - 2.0 * cur[1, 1] + high[1, 1]
        dxy = 0.25 * (cur[2, 2] - cur[2, 0] - cur[0, 2] + cur[0, 0])
        dxs = 0.25 * (high[1, 2] - high[1, 0] - low[1, 2] + low[1, 0])
        dys = 0.25 * (high[2, 1] - high[0, 1] - low[2, 1] + low[0, 1])
        dx = 0.5 * (cur[1, 2] - cur[1, 0])
        dy = 0.5 * (cur[2, 1] - cur[0, 1])
        ds = 0.5 * (high[1, 1] - low[1, 1])
        A = jnp.array([[dxx, dxy, dxs], [dxy, dyy, dys], [dxs, dys, dss]])
        g = jnp.array([dx, dy, ds])
        return A, g, cur[1, 1]

    @jax.jit
    def variant_derivs_only(wins, r0, c0):
        def one(win, r, c):
            def body(state, _):
                r, c = state
                cube = cube_of(win, r, c)
                A, g, center = derivs(cube)
                move = (g[0] > 0).astype(jnp.int32)
                return (r + move, c), A.sum() + center
            (r, c), out = jax.lax.scan(body, (r, c), None, length=5)
            return out
        return jax.vmap(one)(wins, r0, c0)
    timeit("derivs only x5", variant_derivs_only, wins, r0, c0)

    @jax.jit
    def variant_with_solve(wins, r0, c0):
        def one(win, r, c):
            def body(state, _):
                r, c = state
                cube = cube_of(win, r, c)
                A, g, center = derivs(cube)
                bnew = _solve3x3(A, -g)
                move = (bnew[0] > 0.6).astype(jnp.int32)
                return (r + move, c), bnew.sum()
            (r, c), out = jax.lax.scan(body, (r, c), None, length=5)
            return out
        return jax.vmap(one)(wins, r0, c0)
    timeit("derivs+solve x5", variant_with_solve, wins, r0, c0)

    from mods_tpu.detect import pyramid as pyr
    from mods_tpu.config import load_config
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    par = cfg.hessian.pyramid
    resp = jnp.asarray(rng.uniform(-1, 1, (5, 640, 800)).astype(np.float32))
    lev = jnp.asarray(rng.integers(1, 4, K).astype(np.int32))
    rr = jnp.asarray(rng.integers(8, 630, K).astype(np.int32))
    cc = jnp.asarray(rng.integers(8, 790, K).astype(np.int32))
    sig = [1.6, 2.0, 2.5, 3.2, 4.0]

    loc = jax.jit(lambda resp, lev, r0, c0, v: pyr.localize(
        resp, resp, lev, r0, c0, v, par, sig))
    timeit("localize full (rand pos)", loc, resp, lev, rr, cc, valid)

    # localize with all-invalid candidates (tests masking shortcut)
    timeit("localize full (invalid)", loc, resp, lev, rr, cc,
           jnp.zeros(K, bool))


if __name__ == "__main__":
    main()
