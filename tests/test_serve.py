"""ZMQ daemon wire-protocol tests (reference desc_server.py protocol:
PNG column image in, raw float32 out)."""
import threading

import numpy as np
import pytest

zmq = pytest.importorskip("zmq")

from mods_tpu.config import Config
from mods_tpu.serve.zmq_server import query, serve_one

BASE_PORT = 15761


@pytest.fixture(scope="module")
def servers(monkeypatch_module=None):
    # wire-protocol test: random weights are fine (and HardNet weights
    # may be absent in a fresh checkout before tools/train_hardnet.py)
    import os
    os.environ["MODS_TPU_ALLOW_RANDOM_CNN"] = "1"
    cfg = Config()
    stop = threading.Event()
    threads = []
    for which, port in zip(["hardnet", "affnet", "orinet"],
                           [BASE_PORT, BASE_PORT + 1, BASE_PORT + 2]):
        ready = threading.Event()
        th = threading.Thread(target=serve_one,
                              args=(which, port, cfg, stop, ready),
                              daemon=True)
        th.start()
        assert ready.wait(timeout=15)
        threads.append(th)
    yield
    stop.set()


def test_hardnet_roundtrip(servers, rng):
    patches = rng.uniform(0, 255, (7, 32, 32)).astype(np.float32)
    out = query(patches, port=BASE_PORT)
    assert out.shape == (7, 128)
    # reference quantization clip(210*(d+0.45), 0, 255) (desc_server.py:42)
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_affnet_roundtrip(servers, rng):
    patches = rng.uniform(0, 255, (5, 32, 32)).astype(np.float32)
    out = query(patches, port=BASE_PORT + 1)
    assert out.shape == (5, 3)          # (a11, a21, a22)


def test_orinet_roundtrip(servers, rng):
    patches = rng.uniform(0, 255, (3, 32, 32)).astype(np.float32)
    out = query(patches, port=BASE_PORT + 2)
    assert out.shape == (3, 2)          # (y, x) orientation vector


def test_batch_padding_consistency(servers, rng):
    """Same patch described alone and inside a batch must agree (padding
    to pow2 must not leak into real outputs)."""
    patches = rng.uniform(0, 255, (9, 32, 32)).astype(np.float32)
    full = query(patches, port=BASE_PORT)
    one = query(patches[:1], port=BASE_PORT)
    np.testing.assert_allclose(full[0], one[0], atol=1e-2)


def test_timeout_on_dead_port():
    """Unlike the reference (recv blocks forever, SURVEY §5), the client
    times out when no daemon is listening."""
    with pytest.raises(zmq.error.Again):
        query(np.zeros((1, 32, 32), np.float32), port=59999, timeout_s=0.3)
