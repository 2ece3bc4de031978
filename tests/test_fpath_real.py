"""F-path (DEGENSAC / ORSA) vs the reference oracle on REAL pairs.

Fixtures are the merged+deduplicated tentative sets our pipeline
produces on the golden graffiti pair in both directions (captured from
`match_images`, see tools/oracle/); oracle numbers come from the
reference binary built in this environment (/tmp/refbuild/mods, types
2 and 3):

  graf1->graf6 (69-83 tentatives): DEGENSAC 23 after LAF, 0.024 s;
                                   ORSA 15-28 accepted
  graf6->graf1: DEGENSAC 12 after LAF; ORSA rejects (0)

graf is planar, so DEGENSAC's H-degeneracy machinery (checksample ->
innerH -> rFtH, exp_ranF.c:959-1003) is exactly what's exercised.
Envelopes are oracle +- the run-to-run spread of both implementations.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mods_tpu.config import load_config
from mods_tpu.types import Tentatives
from mods_tpu.verify.fundamental import loransac_f
from mods_tpu.verify.orsa import orsa_filter

DATA = os.path.join(os.path.dirname(__file__), "data")


def _tents(name):
    z = np.load(os.path.join(DATA, name))
    n = len(z["valid"])
    return Tentatives(jnp.asarray(z["xy1"]), jnp.asarray(z["xy2"]),
                      jnp.asarray(z["A1"]), jnp.asarray(z["A2"]),
                      jnp.asarray(z["s1"]), jnp.asarray(z["s2"]),
                      jnp.zeros((n, 128)), jnp.zeros((n, 128)),
                      jnp.asarray(z["ratio"]), jnp.asarray(z["valid"]))


def _pars():
    cfg = load_config("/root/reference/build/config_affori_classic.ini",
                      "/root/reference/build/iters_HessianSIFT.ini")
    return cfg.ransac


def test_degensac_graf_forward_matches_oracle():
    t = _tents("fpath_graf_fwd.npz")
    mr = loransac_f(t, _pars())
    n = int(mr.n_inliers)
    assert 18 <= n <= 30, n          # oracle: 23


def test_degensac_graf_forward_is_fast():
    t = _tents("fpath_graf_fwd.npz")
    pars = _pars()
    loransac_f(t, pars)              # compile
    t0 = time.time()
    loransac_f(t, pars)
    dt = time.time() - t0
    # degenerate-scene budget: the plane fires, the adaptive loop must
    # NOT escalate to max_samples (was 2.4 s in round 4; oracle 24 ms)
    assert dt < 1.0, dt


def test_degensac_graf_reverse_matches_oracle():
    t = _tents("fpath_graf_rev.npz")
    mr = loransac_f(t, _pars())
    n = int(mr.n_inliers)
    assert 8 <= n <= 22, n           # oracle: 12


def test_orsa_graf_forward_accepts():
    t = _tents("fpath_graf_fwd.npz")
    mr = orsa_filter(t, _pars(), 800, 640)
    n = int(mr.n_inliers)
    assert 12 <= n <= 30, n          # oracle: 15-28


def test_orsa_graf_reverse_borderline():
    """The reverse direction is NFA-borderline: the oracle rejects (0);
    ours hovers at the gate.  Accept either rejection or a small
    meaningful set — never a large confident one."""
    t = _tents("fpath_graf_rev.npz")
    mr = orsa_filter(t, _pars(), 800, 640)
    n = int(mr.n_inliers)
    assert n <= 25, n
