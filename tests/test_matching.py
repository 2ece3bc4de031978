"""FGINN matcher + duplicate filter unit tests (synthetic oracles)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mods_tpu.config import MatchPars
from mods_tpu.match.matching import (distance_matrix_sq, duplicate_filter,
                                     match_fginn)
from mods_tpu.types import Features, Keypoints, Tentatives


def _features(desc, xy):
    n = desc.shape[0]
    kp = Keypoints(
        xy=jnp.asarray(xy, jnp.float32),
        A=jnp.tile(jnp.eye(2, dtype=jnp.float32)[None], (n, 1, 1)),
        s=jnp.ones((n,), jnp.float32),
        response=jnp.ones((n,), jnp.float32),
        valid=jnp.ones((n,), bool),
    )
    return Features(det=kp, reproj=kp, desc=jnp.asarray(desc, jnp.float32))


def test_distance_matrix_exact(rng):
    a = rng.uniform(0, 255, (17, 16)).astype(np.float32)
    b = rng.uniform(0, 255, (23, 16)).astype(np.float32)
    d = np.asarray(distance_matrix_sq(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a[:, None] - b[None]) ** 2).sum(-1)
    assert np.allclose(d, ref, rtol=1e-4, atol=1e-1)


def test_fginn_early_accept_on_close_neighbor():
    """Reference quirk (matching.cpp:434-456): the ratio test fires
    BEFORE the spatial-contradiction break at the same j, so a strong
    match accepts with the spatially-close 2nd neighbor as denominator."""
    d0 = np.zeros(8, np.float32)
    desc1 = np.zeros((1, 8), np.float32)
    desc2 = np.stack([d0, d0 + 0.1, d0 + 5.0])
    xy2 = np.array([[50.0, 50.0], [52.0, 50.0], [300.0, 300.0]])
    f1 = _features(desc1, np.array([[10.0, 10.0]]))
    f2 = _features(desc2, xy2)
    t = match_fginn(f1, f2, MatchPars(), ratio_th=0.8)
    assert bool(t.valid[0])
    assert float(t.d2[0]) == pytest.approx(8 * 0.01, rel=1e-3)


def test_fginn_walks_past_close_neighbor():
    """When the ratio to a spatially-close neighbor fails, the walk
    continues to the first geometrically inconsistent neighbor."""
    d0 = np.zeros(8, np.float32)
    desc1 = (d0 + 1.0)[None]
    # nn0 at dist 8*1=8; nn1 (close in space) at 8*(1.1^2)~9.68 -> ratio
    # 8/9.68=0.83 > 0.64 fails; nn2 far in space at 8*4 -> ratio 0.25 ok
    desc2 = np.stack([d0, d0 - 0.1, d0 + 3.0])
    xy2 = np.array([[50.0, 50.0], [52.0, 50.0], [300.0, 300.0]])
    f1 = _features(desc1, np.array([[10.0, 10.0]]))
    f2 = _features(desc2, xy2)
    t = match_fginn(f1, f2, MatchPars(), ratio_th=0.8)
    assert bool(t.valid[0])
    assert float(t.d2[0]) == pytest.approx(8 * 4.0, rel=1e-3)


def test_fginn_rejects_ambiguous():
    d0 = np.zeros(8, np.float32)
    desc1 = np.zeros((1, 8), np.float32)
    # two far-apart candidates with nearly equal distances -> ratio ~1
    desc2 = np.stack([d0 + 1.0, d0 + 1.01])
    xy2 = np.array([[50.0, 50.0], [300.0, 300.0]])
    t = match_fginn(_features(desc1, np.array([[1.0, 1.0]])),
                    _features(desc2, xy2), MatchPars(), ratio_th=0.8)
    assert not bool(t.valid[0])


def test_duplicate_filter_keeps_best_ratio():
    m = 4
    xy1 = np.array([[10, 10], [10.5, 10.2], [100, 100], [10.1, 9.9]], np.float32)
    xy2 = np.array([[20, 20], [20.3, 20.1], [200, 200], [19.8, 20.2]], np.float32)
    t = Tentatives(
        xy1=jnp.asarray(xy1), xy2=jnp.asarray(xy2),
        A1=jnp.tile(jnp.eye(2)[None], (m, 1, 1)),
        A2=jnp.tile(jnp.eye(2)[None], (m, 1, 1)),
        s1=jnp.ones(m), s2=jnp.ones(m),
        d1=jnp.ones(m), d2=jnp.ones(m),
        ratio=jnp.asarray([0.5, 0.3, 0.9, 0.7]),
        valid=jnp.ones(m, bool))
    out = duplicate_filter(t, 2.0, "bestFGINN")
    assert int(out.count()) == 2   # the three near-duplicates collapse to 1
    kept_ratios = sorted(np.asarray(out.ratio)[np.asarray(out.valid)].tolist())
    assert kept_ratios == pytest.approx([0.3, 0.9])


def test_streaming_knn_matches_dense():
    """Blockwise-streaming kNN == dense kNN (exact distances, same
    neighbors up to ties)."""
    import jax.numpy as jnp
    from mods_tpu.match.matching import distance_matrix_sq, knn_streaming

    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.integers(0, 255, (64, 128)).astype(np.float32))
    b = jnp.asarray(rng.integers(0, 255, (500, 128)).astype(np.float32))
    v2 = jnp.asarray(rng.random(500) > 0.1)
    k = 8
    d = np.array(distance_matrix_sq(a, b))
    d[:, ~np.asarray(v2)] = 1e12
    ref = np.sort(d, axis=1)[:, :k]
    sd, si = knn_streaming(a, b, v2, k, block=128)
    np.testing.assert_allclose(np.sort(np.asarray(sd), axis=1), ref,
                               rtol=1e-5)
    # indices actually produce those distances
    picked = np.take_along_axis(d, np.asarray(si), axis=1)
    np.testing.assert_allclose(np.sort(picked, 1),
                               np.sort(np.asarray(sd), 1), rtol=1e-5)


def test_match_fginn_streaming_equals_dense(rng):
    import jax.numpy as jnp
    from mods_tpu.config import MatchPars
    from mods_tpu.match.matching import match_fginn, match_fginn_streaming
    from mods_tpu.types import Features, Keypoints

    def feats(n, seed):
        r = np.random.default_rng(seed)
        xy = jnp.asarray(r.uniform(0, 400, (n, 2)).astype(np.float32))
        kp = Keypoints(xy, jnp.tile(jnp.eye(2), (n, 1, 1)),
                       jnp.ones(n), jnp.zeros(n), jnp.ones(n, bool))
        return Features(det=kp, reproj=kp,
                        desc=jnp.asarray(r.integers(0, 255, (n, 128))
                                         .astype(np.float32)))

    f1 = feats(96, 1)
    f2 = feats(300, 2)
    par = MatchPars()
    t_dense = match_fginn(f1, f2, par, 0.95, int_exact=True)
    t_stream = match_fginn_streaming(f1, f2, par, 0.95, block=64,
                                     int_exact=True)
    np.testing.assert_array_equal(np.asarray(t_dense.valid),
                                  np.asarray(t_stream.valid))
    v = np.asarray(t_dense.valid)
    np.testing.assert_allclose(np.asarray(t_dense.xy2)[v],
                               np.asarray(t_stream.xy2)[v], atol=1e-5)
