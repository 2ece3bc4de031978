"""Test config: run on CPU with 8 virtual devices so sharding tests work
without real multi-chip hardware (the driver validates the real-TPU path
separately via __graft_entry__.dryrun_multichip)."""
import os

# The sandbox pre-sets JAX_PLATFORMS=axon (the TPU tunnel) via sitecustomize,
# which overrides the env var; jax.config.update still wins.  Tests force an
# 8-virtual-device CPU backend unless MODS_TPU_TEST_ON_TPU=1 is set.
if not os.environ.get("MODS_TPU_TEST_ON_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def graf_pair():
    """The reference's bundled golden-run image pair (Oxford graffiti)."""
    import cv2
    i1 = cv2.imread("/root/reference/build/imgs/graf1.png", cv2.IMREAD_COLOR)
    i2 = cv2.imread("/root/reference/build/imgs/graf6.png", cv2.IMREAD_COLOR)
    assert i1 is not None and i2 is not None
    # reference loads color then averages channels (synth-detection.cpp:344-351)
    g1 = i1.astype(np.float32).mean(axis=2)
    g2 = i2.astype(np.float32).mean(axis=2)
    return g1, g2


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
