#!/usr/bin/env python
"""THE maintained pipeline profiler: stage-by-stage device timing with
forced synchronization (a scalar is pulled per repetition — plain
block_until_ready is unreliable through the axon TPU relay).

Usage:
  python tools/profile.py [--cpu] [--max-kp 4096] [--reps 5]
                          [--deep] [--kernels]

Sections:
  default    — flagship classic path: detect / orient / describe /
               match / duplicate-filter / RANSAC / full pair
  --deep     — deep-path stages: AffNet / OriNet / HardNet / patches
  --kernels  — kernel micro-breakdown: blur chain, response stack, NMS,
               localizer, mip pyramid, patch sampling

Replaces the former tools/profile_{stages,extract,kernels,...}.py
one-off scripts (round-3 advisor cleanup).
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--max-kp", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--deep", action="store_true")
    ap.add_argument("--kernels", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import cv2

    from mods_tpu.config import load_config
    from mods_tpu.models import flagship as fs
    from mods_tpu.match.matching import match_fginn, duplicate_filter
    from mods_tpu.verify.homography import _ransac_h_core
    from mods_tpu.ops import patch_engine as pe

    def timeit(name, fn, *a, reps=args.reps):
        """fn must return a pytree; a scalar sum of the first leaf is
        pulled to the host each rep to force completion."""
        def scal(out):
            leaf = jax.tree.leaves(out)[0]
            return float(jnp.sum(jnp.asarray(leaf, jnp.float32)))
        out = fn(*a)
        scal(out)                          # warm-up / compile
        t0 = time.time()
        for _ in range(reps):
            out = fn(*a)
            scal(out)
        dt = (time.time() - t0) / reps
        print(f"{name:34s} {dt * 1000.0:9.2f} ms")
        return out

    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    cfg.max_octave_cands = args.max_kp
    fc = fs.FrozenConfig(cfg)
    max_kp = args.max_kp

    img1 = cv2.imread("/root/reference/build/imgs/graf1.png").astype(
        np.float32).mean(axis=2)
    img2 = cv2.imread("/root/reference/build/imgs/graf6.png").astype(
        np.float32).mean(axis=2)
    i1 = jnp.asarray(img1)
    i2 = jnp.asarray(img2)
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()} image={img1.shape} "
          f"max_kp={max_kp}")

    detect = jax.jit(lambda im: fs._detect_jit(im, fc, max_kp))
    extract = jax.jit(lambda im: fs.extract_jit(im, fc, max_kp))
    kp = timeit("detect (all octaves)", detect, i1)
    print(f"{'':34s} n_kp={int(jnp.sum(kp.valid))}")
    f1 = timeit("extract (det+ori+desc)", extract, i1)
    f2 = extract(i2)

    mf = jax.jit(lambda a, b: match_fginn(a, b, cfg.matching, 0.8,
                                          int_exact=True))
    t = timeit("match_fginn", mf, f1, f2)
    df = jax.jit(lambda tt: duplicate_filter(
        tt, cfg.filtering.duplicateDist, cfg.filtering.mode, cap=2048))
    td = timeit("duplicate_filter", df, t)
    rh = jax.jit(lambda tt, k: _ransac_h_core(
        tt.xy1, tt.xy2, tt.valid, jnp.float32(cfg.ransac.err_threshold ** 2),
        k, cfg.ransac.batch_hypotheses, cfg.ransac.lo_batch,
        cfg.ransac.errorType))
    timeit("ransac_h", rh, td, key)
    fn1 = fs.match_pair_fn(cfg, max_kp=max_kp)
    timeit("FULL match_pair (1 dispatch)", fn1, i1, i2, key)

    if args.kernels:
        from mods_tpu.ops import image as imops
        from mods_tpu.detect import pyramid as pyr

        print("-- kernels --")
        timeit("gaussian_blur sigma=1.6", jax.jit(
            lambda im: imops.gaussian_blur(im, 1.6)), i1)
        timeit("half_image", jax.jit(imops.half_image), i1)
        timeit("build_mip_pyramid", jax.jit(pe.build_mip_pyramid), i1)
        par = cfg.hessian.pyramid

        @jax.jit
        def octave0(im):
            return pyr.build_octave(im, par, par.initialSigma)[1]
        resp = timeit("build_octave 0 (blur+resp)", octave0, i1)

        @jax.jit
        def nms(r):
            return pyr.find_extrema(r, par, max_kp)[3]
        timeit("find_extrema (NMS+compact)", nms, resp)
        pyrm = pe.build_mip_pyramid(i1)
        xy = jnp.asarray(np.random.default_rng(0).uniform(
            40, 600, (max_kp, 2)).astype(np.float32))
        A = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32),
                             (max_kp, 2, 2)) * 2.0
        timeit(f"sample_patches 41px x{max_kp}", jax.jit(
            lambda p, x, a: pe.sample_patches(p, x, a, 41)), pyrm, xy, A)
        timeit(f"sample_patches 32px x{max_kp}", jax.jit(
            lambda p, x, a: pe.sample_patches(p, x, a, 32)), pyrm, xy, A)

    if args.deep:
        from mods_tpu.desc.cnn import (_cnn_patches_jit, _get_params,
                                       hardnet_forward, affnet_forward,
                                       orinet_forward, mip_pyramid)
        dcfg = load_config(
            "/root/reference/build/config_aff_ori_desc_zeromq.ini",
            "/root/reference/build/iters_HessianZMQ.ini")
        print("-- deep --")
        pyrm = timeit("mip_pyramid", jax.jit(mip_pyramid), i1)
        n = max_kp
        rng = np.random.default_rng(0)
        xy = jnp.asarray(rng.uniform(40, 600, (n, 2)).astype(np.float32))
        A = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (n, 2, 2))
        s = jnp.asarray(rng.uniform(2, 8, n).astype(np.float32))
        v = jnp.ones(n, bool)
        patches = timeit(f"cnn patches 32px x{n}", _cnn_patches_jit,
                         pyrm, xy, A, s, v,
                         jnp.float32(dcfg.hardnet.mrSize), 32)
        for which, fwd in (("hardnet", hardnet_forward),
                           ("affnet", affnet_forward),
                           ("orinet", orinet_forward)):
            try:
                params = _get_params(dcfg, which)
            except FileNotFoundError:
                print(f"{which}: weights missing, skipped")
                continue
            timeit(f"{which}_forward x{n}", fwd, patches, params)


if __name__ == "__main__":
    main()
