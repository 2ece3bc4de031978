"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(conftest.py sets --xla_force_host_platform_device_count=8).

Covers the two production sharding paths of parallel/mesh.py:
 - sharded_knn: descriptor DB row-sharded over 'model', merged top-k
 - batch_match_sharded: the FULL flagship matching program dp-sharded
   over 'data' (the path the driver's dryrun_multichip certifies)
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mods_tpu.parallel.mesh import make_mesh, sharded_knn, batch_match_sharded


requires_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


@requires_8dev
def test_sharded_knn_matches_dense():
    mesh = make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(0, 1, (32, 128)).astype(np.float32))
    db = jnp.asarray(rng.uniform(0, 1, (64, 128)).astype(np.float32))
    d, idx = sharded_knn(mesh, q, db, k=8)
    dd = np.sum((np.asarray(q)[:, None] - np.asarray(db)[None]) ** 2, -1)
    ref_d = np.sort(dd, axis=1)[:, :8]
    assert np.allclose(np.sort(np.asarray(d), axis=1), ref_d, atol=1e-4)
    # indices must point at the right rows
    got = np.take_along_axis(dd, np.asarray(idx), axis=1)
    assert np.allclose(np.sort(got, axis=1), ref_d, atol=1e-4)


@requires_8dev
def test_batch_match_sharded_equals_unsharded():
    """Per-pair inlier counts from the dp-sharded batch run must equal
    the unsharded single-device flagship run (same PRNG keys)."""
    from mods_tpu.config import load_config
    from mods_tpu.models.flagship import match_pair_fn

    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    cfg.max_octave_cands = 256
    mesh = make_mesh(n_data=4, n_model=2)
    B = 4
    rng = np.random.default_rng(7)
    base = rng.uniform(0, 255, (96, 128)).astype(np.float32)
    shifted = np.roll(base, 3, axis=1)
    imgs1 = jnp.asarray(np.stack([base] * B))
    imgs2 = jnp.asarray(np.stack([shifted] * B))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))

    H, ninl, ntent = batch_match_sharded(mesh, cfg, imgs1, imgs2, keys,
                                         max_kp=256)
    fn1 = match_pair_fn(cfg, max_kp=256)
    for i in range(B):
        _, n0, t0, _, _ = fn1(imgs1[i], imgs2[i], keys[i])
        assert int(np.asarray(ninl)[i]) == int(n0)
        assert int(np.asarray(ntent)[i]) == int(t0)
    # a rolled copy of a textured image must actually match
    assert int(np.asarray(ninl)[0]) >= 8
