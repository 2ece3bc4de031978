"""ORSA / a-contrario epipolar verification — batched on device.

TPU-native counterpart of reference orsa.cpp (Moisan-Stival ORSA,
called from ORSAFiltering, matching/matching.cpp:825-915).  The
reference runs a sequential 10000-iteration sampler with a mode-2
"optimization" phase that restricts sampling to the best meaningful
inlier set (orsa.cpp:523-612).  Here both phases are fixed-size
hypothesis *batches* evaluated in parallel: every candidate F scores
all correspondences at once, the per-position NFA curve is a vectorized
reduction over the sorted error profile, and the combinatorial tables
(makelogcombi_n/_k, orsa.cpp:143-166) become closed-form lgamma
expressions so the valid-count n can stay a traced value.

Semantics preserved from the reference:
  - coordinate normalization: center at image midpoint, scale by
    1/sqrt(w*h) (orsa.cpp:494-502)
  - error = symmetric epipolar *sum* r^2(a+b)/(ab) (orsa.cpp:238-263)
  - NFA(i) = log10(3(n-7)) + logalpha*(i-6) + logC(n,i+1) + logC(i+1,7)
    with logalpha = logalpha0 + 0.5 log10(e_i) (orsa.cpp:559-567)
  - acceptance gate log10(NFA) < -2 and the F-LAF check applied by the
    caller (matching.cpp:884-900)
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln

from ..config import RANSACPars
from ..types import MatchResult, Tentatives
from .fundamental import _fs_from_sample, _laf_check_f
from .homography import MIN_POINTS

LN10 = math.log(10.0)


def symm_epi_sum_sq(F: jnp.ndarray, xy1, xy2) -> jnp.ndarray:
    """Symmetric epipolar distance, SUM of the two squared point-line
    distances (orsa.cpp matcherrorn: e = r^2 (a+b)/(a b))."""
    x, y = xy1[..., 0], xy1[..., 1]
    u, v = xy2[..., 0], xy2[..., 1]
    l1 = F[0, 0] * x + F[0, 1] * y + F[0, 2]          # F p1 (line in img2)
    l2 = F[1, 0] * x + F[1, 1] * y + F[1, 2]
    l3 = F[2, 0] * x + F[2, 1] * y + F[2, 2]
    m1 = F[0, 0] * u + F[1, 0] * v + F[2, 0]          # F^T p2 (line in img1)
    m2 = F[0, 1] * u + F[1, 1] * v + F[2, 1]
    r = u * l1 + v * l2 + l3
    a = l1 * l1 + l2 * l2
    b = m1 * m1 + m2 * m2
    return r * r * (a + b) / jnp.maximum(a * b, 1e-30)


def _log10_comb(n, k):
    """log10 C(n, k), elementwise, traced-friendly."""
    return (gammaln(n + 1.0) - gammaln(k + 1.0) - gammaln(n - k + 1.0)) / LN10


def nfa_curve(es: jnp.ndarray, n, logalpha0) -> jnp.ndarray:
    """Per-position NFA over sorted squared errors [..., M].

    Direct vectorization of the reference scan (orsa.cpp:559-567):
      NFA(i) = loge0 + logalpha(e_i)*(i-6) + log10 C(n, i+1)
               + log10 C(i+1, 7),  for i in [7, n),
    with loge0 = log10(3(n-7)) and
    logalpha = logalpha0 + 0.5 log10(e_i).  Positions outside [7, n)
    are +inf.  `n` may be a traced scalar (lgamma combinatorials replace
    the makelogcombi_* tables, orsa.cpp:143-166)."""
    M = es.shape[-1]
    n = jnp.asarray(n, jnp.float32)
    loge0 = jnp.log10(3.0 * jnp.maximum(n - 7.0, 1.0))
    idx = jnp.arange(M, dtype=jnp.float32)
    logcn = _log10_comb(n, idx + 1.0)                 # log10 C(n, i+1)
    logc7 = _log10_comb(idx + 1.0, 7.0)               # log10 C(i+1, 7)
    pos_ok = (idx >= 7) & (idx < n)
    logalpha = logalpha0 + 0.5 * jnp.log10(jnp.maximum(es, 1e-30))
    nfa = loge0 + logalpha * (idx - 6.0) + logcn + logc7
    return jnp.where(pos_ok, nfa, jnp.inf)


def _sample_fs(xy1n, xy2n, weights, key, batch: int):
    """batch 7-subsets sampled from `weights`-eligible rows -> [3B,3,3]."""
    M = xy1n.shape[0]
    u = jax.random.uniform(key, (batch, M))
    u = jnp.where(weights[None, :], u, -1.0)
    _, sidx = jax.lax.approx_max_k(u, 7)
    Fs = _fs_from_sample(xy1n[sidx], xy2n[sidx])      # [B,3,3,3]
    return jnp.nan_to_num(Fs, nan=0.0).reshape(batch * 3, 3, 3)


@partial(jax.jit, static_argnames=("batch",))
def _orsa_core(xy1, xy2, valid, w, h, key, batch: int):
    """Two-phase batched ORSA.  Returns (F_px, inliers, min_log10_nfa)."""
    M = xy1.shape[0]
    n = jnp.sum(valid).astype(jnp.float32)

    nx, ny = jnp.float32(w), jnp.float32(h)
    norm = 1.0 / jnp.sqrt(nx * ny)
    c = jnp.stack([0.5 * nx, 0.5 * ny])
    xy1n = (xy1 - c) * norm
    xy2n = (xy2 - c) * norm
    logalpha0 = (math.log10(2.0)
                 + 0.5 * jnp.log10((nx * nx + ny * ny) * norm * norm))

    def eval_models(Fs):
        """[B,3,3] -> per-model (min NFA, threshold err at the minimum)."""
        e = jax.vmap(lambda F: symm_epi_sum_sq(F, xy1n, xy2n))(Fs)
        # degenerate (zeroed-NaN) candidates have zero error everywhere —
        # poison them so they can't look meaningful
        bad = jnp.linalg.norm(Fs.reshape(-1, 9), axis=1) <= 1e-8
        e = jnp.where(bad[:, None], jnp.inf, e)
        e = jnp.where(valid[None, :], e, jnp.inf)
        es = jnp.sort(e, axis=1)                      # [B,M] ascending
        nfa = nfa_curve(es, n, logalpha0)
        min_nfa = jnp.min(nfa, axis=1)
        ki = jnp.argmin(nfa, axis=1)
        e_th = jnp.take_along_axis(es, ki[:, None], axis=1)[:, 0]
        return min_nfa, e_th

    k1, k2 = jax.random.split(key)
    Fs1 = _sample_fs(xy1n, xy2n, valid, k1, batch)
    nfa1, eth1 = eval_models(Fs1)
    b1 = jnp.argmin(nfa1)
    F_b1, nfa_b1, eth_b1 = Fs1[b1], nfa1[b1], eth1[b1]

    # "optimization" phase (mode 2, orsa.cpp:585-601): resample among the
    # best model's meaningful inliers
    e_b1 = symm_epi_sum_sq(F_b1, xy1n, xy2n)
    inl1 = valid & (e_b1 <= eth_b1)
    enough = jnp.sum(inl1) >= 8
    pool = jnp.where(enough & (nfa_b1 < 0.0), inl1, valid)
    Fs2 = _sample_fs(xy1n, xy2n, pool, k2, batch)
    nfa2, eth2 = eval_models(Fs2)
    b2 = jnp.argmin(nfa2)

    use2 = nfa2[b2] < nfa_b1
    F_n = jnp.where(use2, Fs2[b2], F_b1)
    best_nfa = jnp.where(use2, nfa2[b2], nfa_b1)
    e_th = jnp.where(use2, eth2[b2], eth_b1)

    e_fin = symm_epi_sum_sq(F_n, xy1n, xy2n)
    inliers = valid & (e_fin <= e_th)

    # denormalize: p_n = T p_px with T = [[norm,0,-cx norm],[0,norm,-cy norm]]
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 0].set(norm).at[1, 1].set(norm)
    T = T.at[0, 2].set(-c[0] * norm).at[1, 2].set(-c[1] * norm)
    F_px = T.T @ F_n @ T
    nrm = jnp.linalg.norm(F_px)
    F_px = F_px / jnp.where(nrm < 1e-12, 1.0, nrm)
    return F_px, inliers, best_nfa


@partial(jax.jit, static_argnames=("batch", "do_laf"))
def _orsa_full(xy1, xy2, A1, A2, s1, s2, ratio, valid, w, h, key,
               batch: int, laf_th, nfa_max, do_laf: bool):
    """Core + acceptance gate + F-LAF check as ONE program (each bare
    jnp op outside jit is a separate ~33 ms dispatch through the
    single-chip relay — the un-fused wrapper cost 700+ ms of pure
    dispatch overhead on a 5 ms core)."""
    F, inl, nfa = _orsa_core(xy1, xy2, valid, w, h, key, batch)
    keep = inl & (nfa < nfa_max)
    if do_laf:
        dummy = jnp.zeros((xy1.shape[0], 1), jnp.float32)
        t_inl = Tentatives(xy1, xy2, A1, A2, s1, s2, dummy, dummy,
                           ratio, keep)
        keep = _laf_check_f(t_inl, F, laf_th)
        keep = keep & (jnp.sum(keep) >= MIN_POINTS)
    return F, keep, jnp.sum(keep), nfa


def orsa_filter(t: Tentatives, pars: RANSACPars, w: int, h: int,
                key=None, nfa_max: float = -2.0) -> MatchResult:
    """ORSAFiltering (matching.cpp:825-915): run ORSA; if the match is
    meaningful (log10 NFA < nfa_max) keep the meaningful inliers and
    apply the F-LAF check, else reject everything."""
    if key is None:
        key = jax.random.PRNGKey(pars.seed)
    # the reference samples 10000 iterations sequentially (orsa.cpp:523);
    # two batches of >=4096 hypotheses give a comparable search budget
    batch = max(pars.batch_hypotheses, 4096)
    F, keep, n_keep, nfa = _orsa_full(
        t.xy1, t.xy2, t.A1, t.A2, t.s1, t.s2, t.ratio, t.valid,
        jnp.float32(w), jnp.float32(h), key, batch,
        jnp.float32(pars.LAFCoef * pars.err_threshold),
        jnp.float32(nfa_max), bool(pars.LAFCoef > 0))
    t_out = Tentatives(t.xy1, t.xy2, t.A1, t.A2, t.s1, t.s2, t.d1, t.d2,
                       t.ratio, keep)
    return MatchResult(tentatives=t_out, H=F, n_inliers=n_keep,
                       score=-nfa.astype(jnp.float32))
