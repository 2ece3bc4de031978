"""TPU-backed ZeroMQ inference daemons, wire-compatible with the
reference's GPU servers (build/desc_server.py, affnet_server.py,
orinet_server.py).

Protocol (reference desc_server.py:104-128):
  request : PNG-encoded uint8 column image of N stacked w x w patches
  reply   : raw float32 buffer [N, out_dim]

The reference binds one PyTorch daemon per port (5555 desc / 5556 affnet
/ 5557 orinet) on a GPU; here all three heads run as JAX programs on the
TPU inside one process (one REP socket per port, one thread each — the
device is shared, dispatch is serialized by the GIL which mirrors the
reference's `#pragma omp critical` client-side serialization,
imagerepresentation.cpp:56-61).

Batching: requests are padded to the next power of two so repeated sizes
reuse compiled programs (the reference re-batches at 512 on the GPU,
desc_server.py:31; on TPU one padded dispatch is faster than many).

Run:  python -m mods_tpu.serve.zmq_server [--ports 5555,5556,5557]
Test: any reference-compatible client, or `query()` below.
"""
from __future__ import annotations

import argparse
import sys
import threading
import time
from typing import Callable, Optional

import numpy as np


def _pad_pow2(n: int) -> int:
    return 1 << max(4, (n - 1).bit_length())


def _make_handler(which: str, cfg) -> Callable[[bytes], bytes]:
    """Returns fn(png_bytes) -> float32 reply bytes for one model head."""
    import cv2
    import jax.numpy as jnp
    from ..desc.cnn import (_get_params, hardnet_forward, affnet_forward,
                            orinet_forward)
    params = _get_params(cfg, which)
    fwd = {"hardnet": hardnet_forward, "affnet": affnet_forward,
           "orinet": orinet_forward}[which]

    def handle(message: bytes) -> bytes:
        img = cv2.imdecode(np.frombuffer(message, np.uint8), 0)
        if img is None:
            return np.zeros(0, np.float32).tobytes()
        h, w = img.shape
        n = h // w
        patches = img.reshape(n, w, w).astype(np.float32)
        m = _pad_pow2(n)
        if m != n:
            patches = np.concatenate(
                [patches, np.zeros((m - n, w, w), np.float32)])
        t0 = time.time()
        out = np.asarray(fwd(jnp.asarray(patches), params))[:n]
        dt = time.time() - t0
        print(f"[{which}] {n} patches in {dt:.4f}s "
              f"({dt / max(n, 1):.2e} s/patch)", flush=True)
        return np.ascontiguousarray(out.astype(np.float32)).tobytes()

    return handle


def serve_one(which: str, port: int, cfg, stop: Optional[threading.Event] = None,
              bound: Optional[threading.Event] = None) -> None:
    """REP loop for one head (reference desc_server.py:121-128)."""
    import zmq
    handler = _make_handler(which, cfg)
    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.REP)
    sock.bind(f"tcp://*:{port}")
    if bound is not None:
        bound.set()
    poller = zmq.Poller()
    poller.register(sock, zmq.POLLIN)
    print(f"[{which}] serving on tcp://*:{port}", flush=True)
    while stop is None or not stop.is_set():
        if not poller.poll(200):
            continue
        msg = sock.recv()
        sock.send(handler(msg))
    sock.close(0)


def serve_all(cfg, ports=(5555, 5556, 5557), stop=None) -> list:
    """Launch the three daemons (reference build/run_zmq_servers.sh) as
    threads in this process; returns the thread list."""
    heads = ["hardnet", "affnet", "orinet"]
    threads = []
    for which, port in zip(heads, ports):
        ready = threading.Event()
        th = threading.Thread(target=serve_one, args=(which, port, cfg, stop,
                                                      ready), daemon=True)
        th.start()
        ready.wait(timeout=10)
        threads.append(th)
    return threads


def query(patches: np.ndarray, port: int = 5555,
          addr: str = "tcp://localhost", timeout_s: float = 30.0) -> np.ndarray:
    """Client side (reference DescribeWithZmq, imagerepresentation.cpp:21-103):
    stack patches into a column image, PNG-encode, REQ round-trip, split the
    float32 reply.  Unlike the reference (blocking recv forever if the
    daemon is down), a timeout raises."""
    import cv2
    import zmq
    n, h, w = patches.shape
    assert h == w
    col = np.clip(patches.reshape(n * h, w), 0, 255).astype(np.uint8)
    ok, png = cv2.imencode(".png", col)
    assert ok
    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.REQ)
    sock.setsockopt(zmq.RCVTIMEO, int(timeout_s * 1000))
    sock.setsockopt(zmq.SNDTIMEO, int(timeout_s * 1000))
    sock.setsockopt(zmq.LINGER, 0)
    sock.connect(f"{addr}:{port}")
    try:
        sock.send(png.tobytes())
        reply = sock.recv()
    finally:
        sock.close(0)
    out = np.frombuffer(reply, np.float32)
    return out.reshape(n, -1) if n else out.reshape(0, 0)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ports", default="5555,5556,5557")
    p.add_argument("--config", default=None)
    args = p.parse_args(argv)
    from ..config import Config, load_config
    cfg = load_config(args.config) if args.config else Config()
    ports = [int(x) for x in args.ports.split(",")]
    serve_all(cfg, ports)
    while True:
        time.sleep(3600)


if __name__ == "__main__":
    main()
