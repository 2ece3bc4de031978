#!/usr/bin/env python
"""Benchmark: two-view matching throughput (pairs/s) on the graf golden pair.

Prints one JSON line:
  {"metric": "pairs_per_s", "value": N, "unit": "pairs/s", "vs_baseline": R}

Baseline: the reference's classic golden run is 1.25 s per pair on a
4-thread CPU (BASELINE.md) => 0.8 pairs/s.  vs_baseline = value / 0.8.

Throughput is measured with B pairs per device dispatch (lax.map inside
one jit): the serving-relevant regime, and it amortizes the ~30 ms
per-dispatch round trip of the axon TPU relay that would otherwise
dominate single-pair latency.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PAIRS_PER_S = 1.0 / 1.25
BATCH = 8


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
    from mods_tpu.models.flagship import match_pair_fn, match_pairs_fn

    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    cfg.max_octave_cands = 4096
    max_kp = 4096

    img1 = cv2.imread("/root/reference/build/imgs/graf1.png").astype(np.float32).mean(axis=2)
    img2 = cv2.imread("/root/reference/build/imgs/graf6.png").astype(np.float32).mean(axis=2)
    i1 = jnp.asarray(img1)
    i2 = jnp.asarray(img2)

    # correctness probe: single-pair inlier count on the golden pair
    # (also measures single-pair latency — a different regime from the
    # batched headline throughput; both are reported)
    fn1 = match_pair_fn(cfg, max_kp=max_kp)
    out = fn1(i1, i2, jax.random.PRNGKey(0))
    n_inl = int(out[1])
    t0 = time.time()
    out = fn1(i1, i2, jax.random.PRNGKey(0))
    _ = int(out[1])
    single_pair_s = time.time() - t0

    # throughput: B pairs per dispatch.  The batch holds DISTINCT pairs
    # (swaps / flips / 180-rotations of the golden pair): identical
    # images per dispatch would flatter caches and hide load imbalance.
    variants1 = [img1, img2, img1[:, ::-1].copy(), img1[::-1, ::-1].copy()]
    variants2 = [img2, img1, img2[:, ::-1].copy(), img2[::-1, ::-1].copy()]
    imgs1 = jnp.asarray(np.stack([variants1[b % 4] for b in range(BATCH)]))
    imgs2 = jnp.asarray(np.stack([variants2[b % 4] for b in range(BATCH)]))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(BATCH, dtype=jnp.uint32))
    fnB = match_pairs_fn(cfg, max_kp=max_kp)

    out = fnB(imgs1, imgs2, keys)
    _ = int(out[1][0])            # warm-up + forced sync

    reps = 4
    t0 = time.time()
    for r in range(reps):
        out = fnB(imgs1, imgs2, keys)
        _ = int(out[1][0])        # force device sync (block_until_ready is
        #                           unreliable through the axon relay)
    dt = (time.time() - t0) / (reps * BATCH)
    pairs_per_s = 1.0 / dt

    # detect+describe ms/image (BASELINE.md metric #2): single-image
    # extraction on the flagship jit path
    from mods_tpu.models.flagship import extract_jit, FrozenConfig
    fc = FrozenConfig(cfg)
    ex = jax.jit(lambda im: extract_jit(im, fc, max_kp))
    f = ex(i1)
    _ = int(jnp.sum(f.det.valid))
    t0 = time.time()
    for _r in range(4):
        f = ex(i1)
        _ = int(jnp.sum(f.det.valid))
    extract_ms = (time.time() - t0) / 4 * 1000.0

    # amortized (serving-regime) per-image extraction: B images per
    # dispatch removes the ~33 ms relay floor from the per-image figure
    exB = jax.jit(lambda ims: jax.lax.map(
        lambda im: jnp.sum(extract_jit(im, fc, max_kp).det.valid), ims))
    imsB = imgs1                      # distinct images (see above)
    _ = int(exB(imsB)[0])
    t0 = time.time()
    for _r in range(2):
        _ = int(exB(imsB)[0])
    extract_ms_batched = (time.time() - t0) / 2 / BATCH * 1000.0

    # deep config (Hessian+AffNet+OriNet+HardNet, BASELINE.md row 1).
    # Inlier/tentative parity fields come from the full-fidelity
    # host-orchestrated path (twoview.match_images, incl. H-LAF check);
    # throughput comes from the single-dispatch deep device program
    # (models/deep.py), batched B pairs per dispatch.
    deep = {}
    try:
        from mods_tpu.twoview import match_images
        dcfg = load_config(
            "/root/reference/build/config_aff_ori_desc_zeromq.ini",
            "/root/reference/build/iters_HessianZMQ.ini")
        img1g = np.asarray(i1)
        img2g = np.asarray(i2)
        r0 = match_images(img1g, img2g, dcfg)     # warm-up/compile
        t0 = time.time()
        r1 = match_images(img1g, img2g, dcfg)
        deep_host_dt = time.time() - t0
        deep = {
            "deep_inliers": r1.inliers,
            "deep_tentatives": r1.unique_tentatives,
            # reference: 3731/3358 and 4527/4118 (README.md:60-61) —
            # splits the deep gap into regions vs descriptor quality
            "deep_regions": [r1.regions1, r1.regions2],
            "deep_descriptors": [r1.descriptors1, r1.descriptors2],
            "deep_host_pairs_per_s": round(1.0 / deep_host_dt, 3),
        }
        from mods_tpu.models.deep import (match_pair_deep_fn,
                                          match_pairs_deep_fn)
        DB = 8
        dkp = dcfg.max_keypoints
        dfn1 = match_pair_deep_fn(dcfg, max_kp=dkp)
        out = dfn1(i1, i2, jax.random.PRNGKey(0))
        deep["deep_device_inliers"] = int(out[1])
        deep["deep_device_tentatives"] = int(out[2])
        dfnB = match_pairs_deep_fn(dcfg, max_kp=dkp)
        di1 = jnp.asarray(np.stack([variants1[b % 4] for b in range(DB)]))
        di2 = jnp.asarray(np.stack([variants2[b % 4] for b in range(DB)]))
        dkeys = jax.vmap(jax.random.PRNGKey)(jnp.arange(DB, dtype=jnp.uint32))
        outB = dfnB(di1, di2, dkeys)
        _ = int(outB[1][0])                       # warm-up + sync
        t0 = time.time()
        for _r in range(2):
            outB = dfnB(di1, di2, dkeys)
            _ = int(outB[1][0])
        deep_dt = (time.time() - t0) / (2 * DB)
        deep["deep_pairs_per_s"] = round(1.0 / deep_dt, 3)
        deep["deep_vs_baseline"] = round((1.0 / deep_dt) / (1.0 / 2.52), 2)
    except FileNotFoundError as e:
        deep = {"deep_pairs_per_s": None,
                "deep_error": "HardNet weights missing"}
    except Exception as e:                        # never break the bench
        deep = {"deep_pairs_per_s": None, "deep_error": str(e)[:120]}

    # F-path verification rows (BASELINE.json configs 3-4): DEGENSAC-F
    # and ORSA on the classic wide-baseline pair.  graf is planar — the
    # degeneracy-handling path is exactly what gets exercised.  The _ms
    # figures time the VERIFICATION stage alone (reference RANSAC
    # timings are per-stage too, README.md:112), on the tentative set
    # captured from the full run.
    fpath = {}
    try:
        import mods_tpu.twoview as _tv
        ccfg = load_config("/root/reference/build/config_affori_classic.ini",
                           "/root/reference/build/iters_HessianSIFT.ini")
        img1g = np.asarray(i1)
        img2g = np.asarray(i2)
        cap = {}
        orig_f = _tv.loransac_f

        def _spy(t, pars, key=None):
            cap["t"] = t
            return orig_f(t, pars, key)
        _tv.loransac_f = _spy
        rf = _tv.match_images(img1g, img2g, ccfg, ver_type="LORANSACF")
        _tv.loransac_f = orig_f
        fpath["degensac_f_inliers"] = rf.inliers
        tcap = cap["t"]
        _ = int(_tv.loransac_f(tcap, ccfg.ransac).n_inliers)   # warm-up x2
        _ = int(_tv.loransac_f(tcap, ccfg.ransac).n_inliers)
        t0 = time.time()
        mrf = _tv.loransac_f(tcap, ccfg.ransac)
        _ = int(mrf.n_inliers)
        fpath["degensac_f_ms"] = round((time.time() - t0) * 1000.0, 1)

        from mods_tpu.verify.orsa import orsa_filter
        h_im, w_im = img1g.shape
        # two warm-ups: the first compile's async persistent-cache write
        # can land in the next call and distort it
        _ = int(orsa_filter(tcap, ccfg.ransac, w_im, h_im).n_inliers)
        _ = int(orsa_filter(tcap, ccfg.ransac, w_im, h_im).n_inliers)
        t0 = time.time()
        mro = orsa_filter(tcap, ccfg.ransac, w_im, h_im)
        n_orsa = int(mro.n_inliers)
        fpath["orsa_inliers"] = n_orsa
        fpath["orsa_ms"] = round((time.time() - t0) * 1000.0, 1)
    except Exception as e:
        fpath = {"fpath_error": str(e)[:120]}

    print(json.dumps({
        "metric": "pairs_per_s",
        "value": round(pairs_per_s, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 2),
        "inliers": n_inl,
        "pair_time_s": round(dt, 4),
        "single_pair_time_s": round(single_pair_s, 4),
        "batch": BATCH,
        "detect_desc_ms_per_image": round(extract_ms, 1),
        "extract_ms_batched": round(extract_ms_batched, 1),
        **deep,
        **fpath,
    }))


if __name__ == "__main__":
    main()
